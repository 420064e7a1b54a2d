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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Synthesize the messy spellings a crawl actually yields (case soup,
    // www, default + custom ports, tracking params around real ones,
    // fragments, bare hosts) deterministically from (doc_id, source),
    // then canonicalize. The oracle CONSTRUCTS the expected canonical
    // string directly from the same columns — so scheme/host folding,
    // port dropping, param filtering, and path defaulting are each pinned
    // exactly, with no cross-engine URL parser in the loop.
    "q75_url_normalize" -> ((s, dir) => {
      val d = col("doc_id")
      val messy = when(d % 11 === 0,
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
      Tables.documents(s, dir)
        .select(d, col("source"), messy.as("url"))
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
