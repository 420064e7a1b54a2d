package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** URL canonicalization (q75) — the crawl-side identity function: the
  * same page arrives as `HTTP://WWW.Site.com:80/a?utm_source=x&id=1#top`
  * and `http://site.com/a?id=1`, and every URL-keyed step downstream
  * (frontier dedup, per-host budgets, doc identity) needs ONE spelling.
  *
  * All built-in codegen'd functions (`parse_url` + higher-order array
  * ops) — no UDF, no custom expression, zero shuffles: at 100 TB this is
  * free inside the scan projection that was already reading the URL.
  *
  * Contract: scheme and host lowercased; a leading `www.` dropped;
  * default ports (http:80, https:443) dropped, others kept; empty path →
  * `/`; tracking params (`utm_*`, `fbclid`, `gclid`) removed with the
  * survivors' order preserved; fragment dropped; unparseable input
  * (no scheme/host) → NULL.
  */
object Urls {

  /** `try_parse_url`: NULL on unparseable input (plain `parse_url` throws
    * under ANSI mode — one junk URL must not kill a 100 TB scan).
    */
  private def part(url: Column, p: String): Column =
    call_function("try_parse_url", url, lit(p))

  /** Canonical spelling of `url` per the contract above. */
  def normalize(url: Column): Column = {
    val scheme = lower(part(url, "PROTOCOL"))
    val host = regexp_replace(lower(part(url, "HOST")), "^www\\.", "")
    val port = regexp_extract(part(url, "AUTHORITY"), ":(\\d+)$", 1)
    val portPart = when(
      port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"),
      lit("")).otherwise(concat(lit(":"), port))
    val rawPath = part(url, "PATH")
    val path = when(rawPath.isNull || rawPath === "", lit("/")).otherwise(rawPath)
    val kept = filter(
      split(part(url, "QUERY"), "&"),
      p => !(p.startsWith("utm_") || p === "fbclid" || p.startsWith("fbclid=") ||
        p === "gclid" || p.startsWith("gclid=") || p === ""))
    val queryPart = when(kept.isNull || size(kept) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(kept, "&")))
    when(scheme.isNull || host.isNull || host === "", lit(null))
      .otherwise(concat(scheme, lit("://"), host, portPart, path, queryPart))
  }

  /** Registered host of a normalized (or raw) URL, NULL if unparseable. */
  def host(url: Column): Column =
    regexp_replace(lower(part(url, "HOST")), "^www\\.", "")

  /** The messy URL spellings a crawl actually yields (case soup, www,
    * default + custom ports, tracking params around real ones, fragments,
    * bare hosts), synthesized deterministically from (doc_id, source) —
    * shared by the q75 and q90 driver queries so both exercise the same
    * canonicalization surface.
    */
  private[ops] def syntheticMessyUrl: Column = {
    val d = col("doc_id")
    when(d % 11 === 0,
      // bare host, default port, no path/query
      concat(lit("HTTP://WWW."), initcap(col("source")), lit(".Example.COM:80")))
      .otherwise(concat(
        when(d % 2 === 0, lit("HTTP")).otherwise(lit("https")),
        lit("://"),
        when(d % 3 === 0, lit("WWW.")).otherwise(lit("")),
        initcap(col("source")), lit(".Example.COM"),
        when(d % 4 === 0, lit(":80"))
          .when(d % 4 === 1, lit(":443"))
          .when(d % 4 === 2, lit(":8443"))
          .otherwise(lit("")),
        lit("/p/"), (d % 7).cast("string"),
        when(d % 5 === 0, lit("/")).otherwise(lit("")),
        lit("?utm_source=feed&id="), d.cast("string"),
        lit("&ref=a&utm_campaign=x"),
        when(d % 2 === 1, lit("#top")).otherwise(lit(""))))
  }

  /** Per-host curation profile (q90): the table behind host-level
    * filtering and crawl budgets (the C4/RefinedWeb "drop or downweight
    * whole domains" step — spam farms, SEO mirrors, and boilerplate
    * hosts show up HERE, not in per-doc scores). Per canonical host:
    * doc count, distinct canonical URLs (pages), total whitespace
    * tokens, and mean document length.
    *
    * Scale: one partial-agg shuffle keyed by host; the distinct-URL
    * count adds the standard two-phase distinct-aggregate expansion on
    * the same key. Nothing carries document bodies — tokens/chars are
    * reduced map-side. A skewed mega-host is a partial-agg hot key, not
    * a buffered group.
    */
  def hostProfile(docs: DataFrame, url: Column): DataFrame =
    docs
      .select(col("n_chars"), col("text"), normalize(url).as("u"))
      .select(col("n_chars"), col("text"),
        regexp_extract(col("u"), "^[a-z0-9+.-]+://([^/:?]+)", 1).as("host"),
        col("u"))
      .groupBy(col("host"))
      .agg(
        count(lit(1)).as("n_docs"),
        count_distinct(col("u")).as("n_urls"),
        sum(size(Dedup.tokens)).cast("long").as("sum_tokens"),
        // sum/count kept separate (not avg()) so the one division
        // happens identically on both engines — q72's discipline
        round(sum(col("n_chars")).cast("double") / count(col("n_chars")), 6)
          .as("avg_chars"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-host profile over the same synthetic crawl spellings as q75.
    "q90_host_profile" -> ((s, dir) =>
      hostProfile(
        Tables.documents(s, dir)
          .select(col("doc_id"), col("text"), col("n_chars"),
            syntheticMessyUrl.as("url")),
        col("url"))),

    // Synthesize the messy spellings a crawl actually yields (case soup,
    // www, default + custom ports, tracking params around real ones,
    // fragments, bare hosts) deterministically from (doc_id, source),
    // then canonicalize. The oracle CONSTRUCTS the expected canonical
    // string directly from the same columns — so scheme/host folding,
    // port dropping, param filtering, and path defaulting are each pinned
    // exactly, with no cross-engine URL parser in the loop.
    "q75_url_normalize" -> ((s, dir) => {
      val d = col("doc_id")
      Tables.documents(s, dir)
        .select(d, col("source"), syntheticMessyUrl.as("url"))
        .select(col("doc_id"), normalize(col("url")).as("url_norm"))
        // host off the CANONICAL string: one cheap regex instead of a
        // sixth URI parse of the raw URL (normalize itself already pays
        // five try_parse_url part extractions per row — the known cost
        // ceiling; a fused parse-once expression is the escalation path
        // if this projection ever shows up in a profile)
        .select(col("doc_id"),
          regexp_extract(col("url_norm"), "^[a-z0-9+.-]+://([^/:?]+)", 1)
            .as("host"),
          col("url_norm"))
    }))

  def oracles: Map[String, String] = Map(
    // q90 constructs host + canonical URL directly from (doc_id, source)
    // — the q75 differential, aggregated: the Spark side must parse its
    // way to the same groups. Token sum rides q39's ws_tokens
    // definition; the one division is sum/count, as in the Spark agg.
    "q90_host_profile" ->
      raw"""WITH t AS (
           |  SELECT doc_id, text, n_chars,
           |    source || '.example.com' AS host,
           |    CASE WHEN doc_id % 11 = 0 THEN
           |      'http://' || source || '.example.com/'
           |    ELSE
           |      (CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END)
           |      || '://' || source || '.example.com'
           |      || (CASE WHEN doc_id % 4 = 2 THEN ':8443' ELSE '' END)
           |      || '/p/' || (doc_id % 7)
           |      || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)
           |      || '?id=' || doc_id || '&ref=a'
           |    END AS u
           |  FROM documents)
           |SELECT host, count(*) AS n_docs, count(DISTINCT u) AS n_urls,
           |  CAST(sum(len(regexp_split_to_array(trim(text), '\s+')))
           |       AS BIGINT) AS sum_tokens,
           |  round(CAST(sum(n_chars) AS DOUBLE) / count(n_chars), 6)
           |    AS avg_chars
           |FROM t GROUP BY host""".stripMargin,

    "q75_url_normalize" ->
      """SELECT doc_id,
        |  source || '.example.com' AS host,
        |  CASE WHEN doc_id % 11 = 0 THEN
        |    'http://' || source || '.example.com/'
        |  ELSE
        |    (CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END)
        |    || '://' || source || '.example.com'
        |    || (CASE WHEN doc_id % 4 = 2 THEN ':8443' ELSE '' END)
        |    || '/p/' || (doc_id % 7)
        |    || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)
        |    || '?id=' || doc_id || '&ref=a'
        |  END AS url_norm
        |FROM documents""".stripMargin)
}
