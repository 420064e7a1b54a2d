package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Generic column profiler (q83) — the data-quality monitor a pipeline
  * runs on every snapshot: per column, row/null/distinct counts and
  * min/max. Catching "lang went 40% NULL in this crawl" BEFORE training
  * is the point of having the numbers.
  *
  * Scale posture: ONE aggregation over the table computes every column's
  * stats (Catalyst expands multiple DISTINCT aggregates into one pass),
  * then an explode of the single result row into (column, stats) rows —
  * the unpivot costs nothing. DISTINCT counts run over md5 of the
  * string rendering, NOT the raw value: the distinct partial must ship
  * every distinct value through its exchange, and for a text column
  * that is the whole corpus — 32 hex chars per row keeps the repo's
  * "bodies never cross the exchange" posture (128-bit collisions are
  * the accepted fingerprint risk everywhere else). min/max partials
  * collapse to one value per partition either way; they stay on the raw
  * column, string-rendered (bigint and UTF-8 byte orderings render
  * identically cross-engine).
  */
object Profile {

  /** (col_name, n_rows, n_null, n_distinct, min_val, max_val) per column. */
  def columnStats(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "Profile.columnStats: no columns given")
    val aggs = columns.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nn"),
        count_distinct(md5(col(c).cast("string"))).as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = array(columns.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"${c}__nn")).as("n_null"),
        col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__min").as("min_val"),
        col(s"${c}__max").as("max_val"))
    }: _*)
    one.select(explode(rows).as("s")).select(col("s.*"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q83_column_stats" -> ((s, dir) =>
      columnStats(Tables.documents(s, dir),
        Seq("doc_id", "text", "lang", "source", "n_chars"))))

  def oracles: Map[String, String] = Map(
    // one UNION branch per column — counts + casts mirror exactly
    // (count(col) excludes NULLs, count(DISTINCT md5(...)) excludes
    // NULLs and fingerprints the same rendered strings, string min/max
    // are byte-order on both engines)
    "q83_column_stats" -> Seq("doc_id", "text", "lang", "source", "n_chars")
      .map { c =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  count(*) - count($c) AS n_null,
           |  CAST(count(DISTINCT md5(CAST($c AS VARCHAR))) AS BIGINT)
           |    AS n_distinct,
           |  CAST(min($c) AS VARCHAR) AS min_val,
           |  CAST(max($c) AS VARCHAR) AS max_val
           |FROM documents""".stripMargin
      }.mkString("\nUNION ALL\n"))
}
