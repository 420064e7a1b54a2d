package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** PII detection and redaction — the privacy-filter step of a training-data
  * pipeline: per-document match counts for common PII shapes plus a
  * redacted text column with each match replaced by a typed placeholder.
  *
  * Scale posture (100 TB): pure map-side single pass (regexp builtins
  * inside whole-stage codegen, no UDF, no shuffle) — embarrassingly
  * parallel over parquet row groups, filters/projections still push down.
  *
  * Patterns are deliberately simple regexes valid in BOTH Java regex
  * (Spark) and RE2 (DuckDB oracle) with identical match semantics: no
  * backrefs, no lookaround, no word boundaries.
  */
object Pii {

  private[ops] val Email  = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[ops] val Phone  = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  private[ops] val Ipv4   = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  private[ops] val LongId = "[0-9]{9,}"

  // regexp_count, not size(regexp_extract_all): same regex engine, same
  // non-overlapping find() walk, same count — without materializing an
  // array of every match per row just to take its length (r21, guide
  // §1.2 per-task work).
  private def countOf(pat: String): Column =
    regexp_count(col("text"), lit(pat)).cast("long")

  /** Total PII match count over the ORIGINAL text — [[detect]]'s
    * detection side without the redaction projection, for screens (q112)
    * that only need the flag. */
  private[ops] def piiTotal: Column =
    countOf(Email) + countOf(Phone) + countOf(Ipv4) + countOf(LongId)

  /** (doc_id, per-category counts, total, redacted). NULL-text docs are
    * excluded (the q44 contract). Redaction order matters where patterns
    * nest (an email contains no phone, but a long id contains shorter
    * digit runs): counts are always over the ORIGINAL text; redaction
    * applies email → ipv4 → phone → long-id so earlier placeholders are
    * not re-matched by later patterns.
    */
  def detect(docs: DataFrame): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(
        col("doc_id"),
        countOf(Email).as("n_email"),
        countOf(Phone).as("n_phone"),
        countOf(Ipv4).as("n_ipv4"),
        countOf(LongId).as("n_longid"),
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(col("text"), Email, "<EMAIL>"),
              Ipv4, "<IP>"),
            Phone, "<PHONE>"),
          LongId, "<ID>").as("redacted"))
      .withColumn("n_pii",
        col("n_email") + col("n_phone") + col("n_ipv4") + col("n_longid"))

  /** Per-source PII incidence — the governance table a release review
    * reads: doc counts, docs carrying any PII, per-category match totals,
    * the incidence rate, and density per 1k tokens (rate alone hides a
    * source whose few dirty docs are dumps with thousands of addresses).
    *
    * Scale: the same map-side codegen regex pass as [[detect]], collapsed
    * by ONE source-keyed partial agg — ~8 longs per row cross the
    * exchange, never text. Both divisions are single rounded double ops
    * on integer-exact sums, so the oracle is bit-equal.
    */
  def piiProfile(docs: DataFrame): DataFrame =
    docs.filter(col("text").isNotNull && col("source").isNotNull)
      .select(col("source"),
        countOf(Email).as("e"), countOf(Phone).as("p"),
        countOf(Ipv4).as("i"), countOf(LongId).as("l"),
        size(Dedup.tokens).cast("long").as("n_tok"))
      .withColumn("tot", col("e") + col("p") + col("i") + col("l"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("tot") > 0, 1L).otherwise(0L)).cast("long")
          .as("n_docs_pii"),
        sum(col("e")).cast("long").as("n_email"),
        sum(col("p")).cast("long").as("n_phone"),
        sum(col("i")).cast("long").as("n_ipv4"),
        sum(col("l")).cast("long").as("n_longid"),
        sum(col("tot")).cast("long").as("n_pii"),
        sum(col("n_tok")).cast("long").as("sum_tokens"))
      .select(col("source"), col("n_docs"), col("n_docs_pii"),
        col("n_email"), col("n_phone"), col("n_ipv4"), col("n_longid"),
        col("n_pii"), col("sum_tokens"),
        round(col("n_docs_pii").cast("double") / col("n_docs"), 6)
          .as("pii_rate"),
        round(col("n_pii").cast("double") * 1000 / col("sum_tokens"), 6)
          .as("pii_per_ktok"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_pii" -> ((s, dir) => detect(Tables.documents(s, dir))),

    // Per-source PII incidence/density rollup — see [[piiProfile]].
    "q103_pii_profile" -> ((s, dir) => piiProfile(Tables.documents(s, dir))))

  def oracles: Map[String, String] = Map(
    // DuckDB regexp_replace needs the 'g' flag to match Spark's
    // replace-all; len(regexp_extract_all) mirrors size(...).
    "q50_pii" ->
      raw"""SELECT doc_id,
           |  CAST(len(regexp_extract_all(text, '$Email')) AS BIGINT) AS n_email,
           |  CAST(len(regexp_extract_all(text, '$Phone')) AS BIGINT) AS n_phone,
           |  CAST(len(regexp_extract_all(text, '$Ipv4')) AS BIGINT) AS n_ipv4,
           |  CAST(len(regexp_extract_all(text, '$LongId')) AS BIGINT) AS n_longid,
           |  regexp_replace(
           |    regexp_replace(
           |      regexp_replace(
           |        regexp_replace(text, '$Email', '<EMAIL>', 'g'),
           |        '$Ipv4', '<IP>', 'g'),
           |      '$Phone', '<PHONE>', 'g'),
           |    '$LongId', '<ID>', 'g') AS redacted,
           |  CAST(len(regexp_extract_all(text, '$Email'))
           |     + len(regexp_extract_all(text, '$Phone'))
           |     + len(regexp_extract_all(text, '$Ipv4'))
           |     + len(regexp_extract_all(text, '$LongId')) AS BIGINT) AS n_pii
           |FROM documents WHERE text IS NOT NULL""".stripMargin,

    // Same RE2/Java-parity patterns; every aggregate is an integer sum,
    // the two ratios are single rounded double divisions in the same
    // expression order as the Spark side
    "q103_pii_profile" ->
      raw"""WITH per AS (
           |  SELECT source,
           |    len(regexp_extract_all(text, '$Email')) AS e,
           |    len(regexp_extract_all(text, '$Phone')) AS p,
           |    len(regexp_extract_all(text, '$Ipv4')) AS i,
           |    len(regexp_extract_all(text, '$LongId')) AS l,
           |    len(regexp_split_to_array(trim(text), '\s+')) AS n_tok
           |  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL)
           |SELECT source, count(*) AS n_docs,
           |  CAST(sum(CASE WHEN e + p + i + l > 0 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_docs_pii,
           |  CAST(sum(e) AS BIGINT) AS n_email,
           |  CAST(sum(p) AS BIGINT) AS n_phone,
           |  CAST(sum(i) AS BIGINT) AS n_ipv4,
           |  CAST(sum(l) AS BIGINT) AS n_longid,
           |  CAST(sum(e + p + i + l) AS BIGINT) AS n_pii,
           |  CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
           |  round(CAST(sum(CASE WHEN e + p + i + l > 0 THEN 1 ELSE 0 END)
           |    AS DOUBLE) / count(*), 6) AS pii_rate,
           |  round(CAST(sum(e + p + i + l) AS DOUBLE) * 1000
           |    / sum(n_tok), 6) AS pii_per_ktok
           |FROM per GROUP BY source""".stripMargin
  )
}
