package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ops.{AudioWav, Bpe, Curation, Decontam, Dedup, Html, Lm, Multimodal, Pca, Pii, Pq, Profile, Relational, Sampling, Search, Similarity, Snapshot, TextAnalysis, Urls}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Pricing-summary shape (the canonical groupBy/agg plan: map-side partial
    * aggregation, exact decimal sums).
    */
  def entry(spark: SparkSession): DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double")
          .as("sum_price"),
        count(lit(1)).as("n"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextAnalysis.queries ++ Dedup.queries ++
      Similarity.queries ++ Multimodal.queries ++ Sampling.queries ++
      Decontam.queries ++ Pii.queries ++ AudioWav.queries ++
      Curation.queries ++ Html.queries ++ Pca.queries ++ Lm.queries ++
      Search.queries ++ Urls.queries ++ Pq.queries ++ Bpe.queries ++
      Snapshot.queries ++ Profile.queries ++
      sources.JsonLines.queries ++ sources.Warc.queries ++
      sources.TfRecord.queries ++
      inspector.Inspector.queries ++ streaming.KafkaSink.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (driver
    * records a rows-only check; semantics covered by ScalaTest).
    */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ TextAnalysis.oracles ++ Dedup.oracles ++
      Similarity.oracles ++ Multimodal.oracles ++ Sampling.oracles ++
      Decontam.oracles ++ Pii.oracles ++ Curation.oracles ++ Html.oracles ++
      Pca.oracles ++ Lm.oracles ++ Search.oracles ++ Urls.oracles ++
      Pq.oracles ++ Bpe.oracles ++ Snapshot.oracles ++ Profile.oracles ++
      sources.JsonLines.oracles ++ sources.Warc.oracles ++
      sources.TfRecord.oracles ++
      inspector.Inspector.oracles ++ streaming.KafkaSink.oracles ++
      oracle.FixtureOracles.oracles
}
