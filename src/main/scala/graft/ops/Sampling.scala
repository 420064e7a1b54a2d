package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Dataset splitting/sampling for training pipelines. Map-side-only,
  * deterministic, and content-stable: the split of a document never
  * changes when the corpus around it grows or reorders (a property
  * `randomSplit` does not have — its assignment depends on partitioning),
  * so train/test contamination checks stay valid across dataset versions.
  */
object Sampling {

  /** Hash bucket 0..99 from the doc_id ([[TextAnalysis.md5Prefix]] — the
    * one shared definition of the cross-engine md5-prefix hash).
    */
  private def bucket100 =
    pmod(TextAnalysis.md5Prefix(col("doc_id").cast("string")), lit(100L))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // 80/10/10 train/val/test assignment, reproducible from doc_id alone.
    "q46_train_split" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), bucket100.as("bucket"))
        .withColumn("split",
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val")
            .otherwise("test"))),

    // Stratified 10% sample with EXACT per-stratum fractions (the
    // hash-bucket form above is only approximately proportional):
    // deterministic hash ordering inside each language, keep the first
    // ceil(n/10). One shuffle on the stratum key; strata are languages
    // (bounded cardinality) — for high-cardinality or heavily skewed
    // strata prefer the q46 hash-bucket form, which is map-only.
    "q47_stratified_sample" -> ((s, dir) => {
      val order = Window.partitionBy(col("lang"))
        .orderBy(TextAnalysis.md5Prefix(col("doc_id").cast("string")).asc,
          col("doc_id").asc)
      val stratum = Window.partitionBy(col("lang"))
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"))
        .withColumn("rn", row_number().over(order))
        .withColumn("n", count(lit(1)).over(stratum))
        .filter(col("rn") <= ceil(col("n") / 10.0))
        .select(col("doc_id"), col("lang"))
    }),

    // Per-language vocabulary profile: corpus statistics a curation run
    // reads before setting filters. Explode + partial-agg; the only
    // shuffle carries (lang, token) pairs.
    "q48_vocab_stats" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("lang"),
          explode(split(trim(col("text")), "\\s+")).as("tok"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_tokens"),
          count_distinct(col("tok")).as("vocab"),
          (sum(length(col("tok"))).cast("double") / count(lit(1)))
            .as("avg_tok_len")))
  )

  def oracles: Map[String, String] = Map(
    "q46_train_split" ->
      """SELECT doc_id, b AS bucket,
        |  CASE WHEN b < 80 THEN 'train'
        |       WHEN b < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |        ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |          % 100 AS b
        |      FROM documents)""".stripMargin,

    "q47_stratified_sample" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT ASC,
        |               doc_id ASC) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents)
        |WHERE rn <= ceiling(n / 10.0)""".stripMargin,

    "q48_vocab_stats" ->
      """SELECT lang,
        |  CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(count(DISTINCT tok) AS BIGINT) AS vocab,
        |  CAST(sum(len(tok)) AS DOUBLE) / count(*) AS avg_tok_len
        |FROM (SELECT lang, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |      FROM documents)
        |GROUP BY lang""".stripMargin
  )
}
