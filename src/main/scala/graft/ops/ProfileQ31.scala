package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TEMPORARY dev profiler (round 15): splits q31 wall time by stage
  * at an arbitrary corpus. Not part of the library surface; deleted once
  * the scaling work lands.
  */
object ProfileQ31 {
  private def t(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n")
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf10d"
    val spark = graft.Sessions.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val P = 2147483647L
    def permMul(i: Int): Long = (1000003L * (2 * i + 1)) % P
    val NumHashes = 16
    val BandRows = 4
    val BucketCap = 200
    val tokens = split(trim(col("text")), "\\s+")

    val hashed = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), explode(array_distinct(
        graft.functions.TextFunctions.hashedGrams(tokens, 3))).as("g"))
      .select(col("doc_id"), pmod(col("g"), lit(P)).as("h"))
    val minCols = (0 until NumHashes).map(i =>
      min(pmod(col("h") * permMul(i), lit(P))).as(s"m$i"))
    val sigs = hashed.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
      .localCheckpoint(eager = false)
    t("1 sigs (ckpt)") { sigs.count() }

    val bandKeys = (0 until NumHashes / BandRows).map(b =>
      hash((b * BandRows until (b + 1) * BandRows).map(i => col(s"m$i")): _*))
    val payload = (0 until NumHashes).map(i => s"m$i")

    // replicate pairsOnce stages
    def bit(band: org.apache.spark.sql.Column) =
      call_function("shiftleft", lit(1L), band)
    val withKeys = sigs.withColumn("_bkeys", array(bandKeys: _*))
    val gk = Seq("_band", "_bucket")
    val narrow = withKeys.select(
      col("doc_id") +: posexplode(col("_bkeys")).as(Seq("_band", "_bucket")) +: Nil: _*)
    val small = narrow.groupBy(gk.map(col): _*)
      .agg(count(lit(1)).as("_bsz"))
      .filter(col("_bsz").between(2, BucketCap))
      .select(gk.map(col): _*)
    val bits = narrow.join(small, gk)
      .groupBy(col("doc_id")).agg(sum(bit(col("_band"))).as("_bits"))
    t("2 bits") { bits.count() }

    val banded = withKeys.join(bits, "doc_id")
      .select(col("doc_id") +: payload.map(col) :+
        col("_bkeys") :+ col("_bits") :+
        posexplode(col("_bkeys")).as(Seq("_band", "_bucket")): _*)
      .filter(col("_bits").bitwiseAND(bit(col("_band"))) =!= 0)
      .localCheckpoint(eager = false)
    t("3 banded wide (ckpt)") { banded.count() }

    def side(p: String) = banded.select(
      col("doc_id").as(p) +: payload.map(c => col(c).as(s"${p}_$c")) ++:
        col("_bkeys").as(s"${p}_bkeys") +: col("_bits").as(s"${p}_bits") +:
        col("_band") +: col("_bucket") +: Nil: _*)
    val joined = side("a").join(side("b"), gk).where(col("a") < col("b"))
    t("4 joined raw") { joined.count() }

    val once = joined.where(!(0 until 3).map { bp =>
      col("_band") > bp &&
        element_at(col("a_bkeys"), bp + 1) === element_at(col("b_bkeys"), bp + 1) &&
        (col("a_bits").bitwiseAND(lit(1L << bp)) =!= 0)
    }.reduce(_ || _))
    t("5 once-filtered") { once.count() }

    val est = (0 until NumHashes).map(i =>
        when(col(s"a_m$i") === col(s"b_m$i"), 1).otherwise(0))
      .reduce(_ + _).cast("double") / NumHashes
    t("6a once + est PROJECT only") {
      once.withColumn("est_jaccard", est)
        .select(col("a"), col("b"), col("est_jaccard"))
        .agg(sum("est_jaccard")).collect(); 0L
    }
    t("6b once + est FILTER") {
      once.withColumn("est_jaccard", est)
        .filter(col("est_jaccard") >= 0.5)
        .select(col("a"), col("b"), col("est_jaccard")).count()
    }
    val estCast = (0 until NumHashes).map(i =>
        (col(s"a_m$i") === col(s"b_m$i")).cast("int"))
      .reduce(_ + _).cast("double") / NumHashes
    t("6c cast-form est FILTER") {
      once.withColumn("est_jaccard", estCast)
        .filter(col("est_jaccard") >= 0.5)
        .select(col("a"), col("b"), col("est_jaccard")).count()
    }
    t("6d int-threshold FILTER") {
      once.withColumn("matches",
          (0 until NumHashes).map(i =>
            (col(s"a_m$i") === col(s"b_m$i")).cast("int")).reduce(_ + _))
        .filter(col("matches") >= 8)
        .select(col("a"), col("b"),
          (col("matches").cast("double") / NumHashes).as("est_jaccard"))
        .count()
    }

    // 6e: explicit join condition, ordered: a<b, once, matches>=8
    {
      def sideE(p: String) = banded.select(
        col("doc_id").as(p) +: payload.map(c => col(c).as(s"${p}_$c")) ++:
          col("_bkeys").as(s"${p}_bkeys") +: col("_bits").as(s"${p}_bits") +:
          col("_band").as(s"${p}_band") +: col("_bucket").as(s"${p}_bucket") +: Nil: _*)
      val l = sideE("a"); val r = sideE("b")
      val onceC = (0 until 3).map { bp =>
        !(col("a_band") > bp &&
          element_at(col("a_bkeys"), bp + 1) === element_at(col("b_bkeys"), bp + 1) &&
          (col("a_bits").bitwiseAND(lit(1L << bp)) =!= 0))
      }.reduce(_ && _)
      val matches = (0 until NumHashes).map(i =>
        (col(s"a_m$i") === col(s"b_m$i")).cast("int")).reduce(_ + _)
      val cond = col("a_band") === col("b_band") &&
        col("a_bucket") === col("b_bucket") &&
        col("a") < col("b") && onceC && (matches >= lit(8))
      t("6e ordered explicit cond") {
        l.join(r, cond)
          .select(col("a"), col("b"),
            (matches.cast("double") / NumHashes).as("est_jaccard"))
          .count()
      }
      t("6g wide join, no est, sum(a_m0)") {
        l.join(r,
            col("a_band") === col("b_band") &&
            col("a_bucket") === col("b_bucket") &&
            col("a") < col("b") && onceC)
          .agg(sum(col("a_m0"))).collect(); 0L
      }
    }

    // 6h: SHUFFLE_HASH hint on the self-join
    {
      def sideE(p: String) = banded.select(
        col("doc_id").as(p) +: payload.map(c => col(c).as(s"${p}_$c")) ++:
          col("_bkeys").as(s"${p}_bkeys") +: col("_bits").as(s"${p}_bits") +:
          col("_band").as(s"${p}_band") +: col("_bucket").as(s"${p}_bucket") +: Nil: _*)
      val l = sideE("a"); val r = sideE("b").hint("SHUFFLE_HASH")
      val onceC = (0 until 3).map { bp =>
        !(col("a_band") > bp &&
          element_at(col("a_bkeys"), bp + 1) === element_at(col("b_bkeys"), bp + 1) &&
          (col("a_bits").bitwiseAND(lit(1L << bp)) =!= 0))
      }.reduce(_ && _)
      val matches = (0 until NumHashes).map(i =>
        (col(s"a_m$i") === col(s"b_m$i")).cast("int")).reduce(_ + _)
      val cond = col("a_band") === col("b_band") &&
        col("a_bucket") === col("b_bucket") &&
        col("a") < col("b") && onceC && (matches >= lit(8))
      t("6h SHUFFLE_HASH ordered") {
        l.join(r, cond)
          .select(col("a"), col("b"),
            (matches.cast("double") / NumHashes).as("est_jaccard"))
          .count()
      }
    }

    t("7 real q31 end-to-end") {
      graft.SparkEntry.queries("q31_dedup_minhash")(spark, dir).count()
    }

    spark.stop()
  }
}
