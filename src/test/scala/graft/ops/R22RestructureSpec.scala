package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-22 one-scan differentials: the q115/q123/q124/q139 plant-union
  * queries now derive their planted rows by exploding a per-row list in
  * ONE corpus scan instead of unioning the table with filtered
  * re-scans of itself (the q62 lesson — a `%` predicate cannot prune
  * parquet row groups, so every union branch re-decoded the full text
  * column). These specs pin the full query output of the committed
  * spelling against the EXACT pre-r22 union spelling, on fixtures where
  * the plant fires (non-vacuity asserted), NULL text exists, and echo
  * ids collide with real ids.
  */
class R22RestructureSpec extends SparkSpec {

  // ids are multiples of 7/37/41 by construction so every plant fires;
  // one NULL-text row and one empty row pin the NULL contract
  private def fixture(seed: Int): Seq[(Long, String, String)] = {
    val rnd = new scala.util.Random(seed)
    (0 until 120).map { i =>
      val t =
        if (i == 17) null.asInstanceOf[String]
        else if (i == 23) ""
        else (0 until 3 + rnd.nextInt(20))
          .map(_ => s"w${rnd.nextInt(9)}").mkString(" ")
      (i.toLong, t, s"src${i % 5}")
    }
  }

  private def rowsOf(df: DataFrame): Map[String, Int] =
    df.collect().map(_.toString).groupBy(identity).map { case (k, v) => k -> v.length }

  test("q115 one-scan source explode ≡ union of two planted re-scans") {
    val dir = docsDirSrc(fixture(115))
    val docs = graft.Tables.documents(spark, dir)
    val got = graft.SparkEntry.queries("q115_source_dup_matrix")(spark, dir)
    // the exact pre-r22 spelling
    val planted = docs.filter(col("doc_id") % 37 === 0)
    val ref = Dedup.sourceDupMatrix(docs.select(col("text"), col("source"))
      .unionByName(planted.select(col("text"), lit("mirror").as("source")))
      .unionByName(planted.select(col("text"),
        concat(lit("src"), (expr("doc_id div 37") % 20).cast("string"))
          .as("source"))))
    assert(rowsOf(got) === rowsOf(ref))
    assert(got.count() > 0, "plant must be non-vacuous")
  }

  test("q123 one-scan id explode ≡ union with echo re-scan") {
    val dir = docsDirSrc(fixture(123))
    val got = graft.SparkEntry.queries("q123_split_leakage")(spark, dir)
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val ref = Dedup.splitLeakage(docs.unionByName(
      docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))))
    assert(rowsOf(got) === rowsOf(ref))
    assert(got.count() > 0, "plant must be non-vacuous")
  }

  test("q124 one-scan id explode ≡ union with echo re-scan") {
    val dir = docsDirSrc(fixture(124))
    val got = graft.SparkEntry.queries("q124_dup_growth")(spark, dir)
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val ref = Dedup.dupGrowth(
      docs.select((col("doc_id") * 2).as("doc_id"), col("text"))
        .unionByName(docs.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") * 2 + 1).as("doc_id"), col("text"))))
    assert(rowsOf(got) === rowsOf(ref))
    assert(got.count() > 0)
  }

  test("q139 one-scan id explode ≡ union with power-of-ten echo re-scan") {
    val dir = docsDirSrc(fixture(139))
    val got = graft.SparkEntry.queries("q139_dup_spread")(spark, dir)
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val copies = docs
      .filter(col("text").isNotNull && col("doc_id") % 41 === 0)
      .select((col("doc_id") +
        pow(lit(10.0), (col("doc_id") % 6 + 1).cast("double"))
          .cast("long")).as("doc_id"), col("text"))
    val ref = Dedup.dupSpread(docs.unionByName(copies))
    assert(rowsOf(got) === rowsOf(ref))
    assert(got.count() > 0)
  }
}
