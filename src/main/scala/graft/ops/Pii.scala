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

  private def countOf(pat: String): Column =
    size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long")

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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_pii" -> ((s, dir) => detect(Tables.documents(s, dir))))

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
           |FROM documents WHERE text IS NOT NULL""".stripMargin
  )
}
