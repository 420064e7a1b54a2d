package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
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
            .otherwise("test")))
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
        |      FROM documents)""".stripMargin
  )
}
