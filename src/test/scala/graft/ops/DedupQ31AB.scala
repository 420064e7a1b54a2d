package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Dev A/B harness (test sourceset — never ships in the library jar):
  * times q31's two historical shapes at an arbitrary corpus dir, so the
  * pairsOnce-vs-join-back decision stays evidence-backed at BOTH regimes
  * (the official 10x gate corpus and the 100x high-duplication probe).
  *
  *   sbt "Test/runMain graft.ops.DedupQ31AB /tmp/graft_sf10d"
  *
  * Shapes:
  *   - `new`: the library's current q31 (pairsOnce, packed array<long>
  *     signature payload, fused LongArrayMatches at emission);
  *   - `old`: the r14 shape — narrow bucketPairs + distinct() + a
  *     signature join-back per side, est as a 16-term when-chain.
  */
object DedupQ31AB {
  private val NumHashes = 16
  private val BandRows  = 4
  private val BucketCap = 200
  private val P = 2147483647L
  private def permMul(i: Int): Long = (1000003L * (2 * i + 1)) % P
  private val tokens = split(trim(col("text")), "\\s+")

  private def oldShape(s: SparkSession, dir: String): DataFrame = {
    val hashed = Tables.documents(s, dir)
      .select(col("doc_id"), explode(array_distinct(
        graft.functions.TextFunctions.hashedGrams(tokens, 3))).as("g"))
      .select(col("doc_id"), pmod(col("g"), lit(P)).as("h"))
    val minCols = (0 until NumHashes).map(i =>
      min(pmod(col("h") * permMul(i), lit(P))).as(s"m$i"))
    val sigs = Materialize(
      hashed.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*))
    val bandKeys = (0 until NumHashes / BandRows).map(b =>
      hash((b * BandRows until (b + 1) * BandRows).map(i => col(s"m$i")): _*))
    val banded = sigs.select(col("doc_id"),
      posexplode(array(bandKeys: _*)).as(Seq("band", "bucket")))
    val pairs = Dedup.bucketPairs(banded, Seq("band", "bucket"), BucketCap)
    def side(n: String) = sigs.select(
      col("doc_id").as(n) +: (0 until NumHashes).map(i => col(s"m$i").as(s"$n$i")): _*)
    pairs.join(side("a"), "a").join(side("b"), "b")
      .withColumn("est_jaccard",
        (0 until NumHashes).map(i =>
          when(col(s"a$i") === col(s"b$i"), 1).otherwise(0))
          .reduce(_ + _).cast("double") / NumHashes)
      .filter(col("est_jaccard") >= 0.5)
      .select(col("a"), col("b"), col("est_jaccard"))
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1d"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.Sessions.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String, f: => DataFrame): Unit =
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        val n = f.count()
        println(f"[ab] $name%-4s rep$r ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n dir=$dir")
      }

    time("new", Dedup.queries("q31_dedup_minhash")(spark, dir))
    time("old", oldShape(spark, dir))
    spark.stop()
  }
}
