package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}

/** Dev A/B harness (test sourceset) for the round-22 keep-or-revert
  * adjudications the r21 verdict ordered: times the CURRENT declared
  * query against its exact pre-r21 spelling (restated verbatim from
  * commit 23dcfdb~1) interleaved in one session, noop sink, so host
  * noise hits both sides of every rep pair equally.
  *
  *   sbt "Test/runMain graft.ops.R22AB <sfDir> <reps> <v1,v2,...>"
  *
  * Variants: q31_cur q31_nomat q31_r20 q03_cur q03_r20 q121_cur
  * q121_r20 q133_cur q133_r20 q39_cur q39_r20 q103_cur q103_r20.
  * Results are printed per rep plus a median line per variant. This is
  * MEASUREMENT TOOLING ONLY — nothing here is a declared query or on
  * the bench path.
  */
object R22AB {

  // ---- constants private to Dedup, restated for the old q31 spelling
  // (values pinned by DedupSpec differentials; P = 2^31 - 1)
  private val P = 2147483647L
  private def permMul(i: Int): Long = (1000003L * (2 * i + 1)) % P
  private val NumHashes = Dedup.NumHashes
  private val BandRows = 4
  private def tokens: Column = split(trim(col("text")), "\\s+")
  private def words: Column = tokens // q39's whitespace tokens

  /** Pre-r21 q31: explode grams, pmod, 16 min-aggregates, Materialize,
    * pack, pairsOnce — verbatim from 23dcfdb~1 Dedup.scala. */
  private def q31r20(s: SparkSession, dir: String): DataFrame = {
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
    val packed = sigs.withColumn("sig",
      array((0 until NumHashes).map(i => col(s"m$i")): _*))
    Dedup.pairsOnce(packed, "doc_id", bandKeys, Dedup.BucketCap,
      payload = Seq("sig"))
      .withColumn("est_jaccard",
        graft.functions.VectorFunctions
          .longArrayMatches(col("a_sig"), col("b_sig"))
          .cast("double") / NumHashes)
      .filter(col("est_jaccard") >= 0.5)
      .select(col("a"), col("b"), col("est_jaccard"))
  }

  /** Current q31 WITHOUT the Materialize checkpoint: the sigs frame is
    * recomputed by each pairsOnce consumer (ReuseExchange/AQE decide). */
  private def q31nomat(s: SparkSession, dir: String): DataFrame = {
    val sigs = Tables.documents(s, dir)
      .select(col("doc_id"), graft.functions.MinhashSig(
        graft.functions.TextFunctions.hashedGrams(tokens, 3),
        (0 until NumHashes).map(permMul), P).as("sig"))
      .filter(element_at(col("sig"), 1) =!= Dedup.SigSentinel)
    val bandKeys = Dedup.rowBandKeys(col("sig"))
    Dedup.pairsOnce(sigs, "doc_id", bandKeys, Dedup.BucketCap,
      payload = Seq("sig"))
      .withColumn("est_jaccard",
        graft.functions.VectorFunctions
          .longArrayMatches(col("a_sig"), col("b_sig"))
          .cast("double") / NumHashes)
      .filter(col("est_jaccard") >= 0.5)
      .select(col("a"), col("b"), col("est_jaccard"))
  }

  /** Pre-r21 q03: flat join then one aggregate — verbatim. */
  private def q03r20(s: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    def d2(c: Column): Column = c.cast(dec)
    val o = Tables.orders(s, dir)
    val li = Tables.lineitem(s, dir)
    o.join(li, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(d2(col("l_extendedprice")) * d2(lit(1.0) - col("l_discount")))
          .cast("double").as("revenue"))
  }

  /** Pre-r21 q121: vocabGrowth with the zip_with(slice, slice) bigram
    * lambda and filter(_ =!= "") — verbatim. */
  private def q121r20(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val checkpoints = 10
    val session = docs.sparkSession
    val live = docs.filter(col("text").isNotNull)
    val horizon = live.agg(max(col("doc_id")).as("max_id"))
    def bucket(idCol: String) = Sampling.checkpointOf(idCol, checkpoints)
    def firstBuckets(first: DataFrame) = first
      .crossJoin(broadcast(horizon))
      .groupBy(bucket("first_id").as("bk")).agg(count(lit(1)).as("c"))
    val tokenBuckets = firstBuckets(live
      .select(col("doc_id"), explode(Dedup.tokens).as("tok"))
      .groupBy(col("tok")).agg(min(col("doc_id")).as("first_id")))
    val filtered = filter(Dedup.tokens, t => t =!= "")
    val bigramBuckets = firstBuckets(live
      .select(col("doc_id"), filtered.as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(zip_with(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .groupBy(col("p.w1"), col("p.w2"))
      .agg(min(col("doc_id")).as("first_id")))
    val docBuckets = live
      .select(col("doc_id")).crossJoin(broadcast(horizon))
      .groupBy(bucket("doc_id").as("bk")).agg(count(lit(1)).as("c"))
    def cum(buckets: DataFrame, as: String) =
      Sampling.cumOverSpine(session, checkpoints, buckets, as)
    cum(docBuckets, "n_docs")
      .join(cum(tokenBuckets, "vocab"), Seq("k"))
      .join(cum(bigramBuckets, "bigram_types"), Seq("k"))
      .select(col("k").as("checkpoint"), col("n_docs"), col("vocab"),
        col("bigram_types"))
  }

  /** Pre-r21 q133: two separately-scanned md5 halves through the
    * two-frame qualityDrift — verbatim (the current two-frame API unions
    * the frames exactly as the old implementation did). */
  private def q133r20(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val half = pmod(
      TextAnalysis.md5Prefix(col("doc_id").cast("string")), lit(2L))
    val a = docs.filter(half === 0)
    val b = docs.filter(half =!= 0)
      .withColumn("text",
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" x x x x x x x x")))
          .otherwise(col("text")))
    Snapshot.qualityDrift(a, b)
  }

  /** Pre-r21 q39: size(regexp_extract_all(...)) spellings — verbatim. */
  private def q39r20(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        size(words).cast("long").as("ws_tokens"),
        size(expr("regexp_extract_all(text, '[a-z]+', 0)")).cast("long")
          .as("alpha_tokens"),
        size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
          .cast("long").as("bpeish_tokens"))

  /** Pre-r21 q103: piiProfile with size(regexp_extract_all) counts. */
  private def q103r20(s: SparkSession, dir: String): DataFrame = {
    def countOf(pat: String): Column =
      size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long")
    Tables.documents(s, dir)
      .filter(col("text").isNotNull && col("source").isNotNull)
      .select(col("source"),
        countOf(Pii.Email).as("e"), countOf(Pii.Phone).as("p"),
        countOf(Pii.Ipv4).as("i"), countOf(Pii.LongId).as("l"),
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
  }

  /** Pre-r22 plant-union spellings (verbatim from commit 2e59c7b) for
    * the q115/q123/q124/q139 one-scan A/Bs. */
  private def q115r21(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val planted = docs.filter(col("doc_id") % 37 === 0)
    Dedup.sourceDupMatrix(docs.select(col("text"), col("source"))
      .unionByName(planted.select(col("text"), lit("mirror").as("source")))
      .unionByName(planted.select(col("text"),
        concat(lit("src"), (expr("doc_id div 37") % 20).cast("string"))
          .as("source"))))
  }

  private def q123r21(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    Dedup.splitLeakage(docs.unionByName(
      docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))))
  }

  private def q124r21(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    Dedup.dupGrowth(docs.select((col("doc_id") * 2).as("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") * 2 + 1).as("doc_id"), col("text"))))
  }

  private def q139r21(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val copies = docs
      .filter(col("text").isNotNull && col("doc_id") % 41 === 0)
      .select((col("doc_id") +
        pow(lit(10.0), (col("doc_id") % 6 + 1).cast("double"))
          .cast("long")).as("doc_id"), col("text"))
    Dedup.dupSpread(docs.unionByName(copies))
  }

  private def cur(q: String)(s: SparkSession, dir: String): DataFrame =
    SparkEntry.queries(q)(s, dir)

  val variants: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q31_cur" -> cur("q31_dedup_minhash") _,
    "q31_nomat" -> (q31nomat _),
    "q31_r20" -> (q31r20 _),
    "q03_cur" -> cur("q03_reqres_join") _,
    "q03_r20" -> (q03r20 _),
    "q121_cur" -> cur("q121_vocab_growth") _,
    "q121_r20" -> (q121r20 _),
    "q133_cur" -> cur("q133_quality_drift") _,
    "q133_r20" -> (q133r20 _),
    "q39_cur" -> cur("q39_token_count") _,
    "q39_r20" -> (q39r20 _),
    "q103_cur" -> cur("q103_pii_profile") _,
    "q103_r20" -> (q103r20 _),
    "q115_cur" -> cur("q115_source_dup_matrix") _,
    "q115_r21" -> (q115r21 _),
    "q123_cur" -> cur("q123_split_leakage") _,
    "q123_r21" -> (q123r21 _),
    "q124_cur" -> cur("q124_dup_growth") _,
    "q124_r21" -> (q124r21 _),
    "q139_cur" -> cur("q139_dup_spread") _,
    "q139_r21" -> (q139r21 _))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1d")
    val n = args.lift(1).map(_.toInt).getOrElse(5)
    val names = args.lift(2).map(_.split(',').toSeq)
      .getOrElse(Seq("q31_cur", "q31_r20"))
    names.foreach(v => require(variants.contains(v), s"unknown variant $v"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val times = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector())
    // rep-major interleave: every rep pair sees the same host window
    for (i <- 1 to n; v <- names) {
      val jvm0 = graft.JvmTelemetry.snapshot()
      val t0 = System.nanoTime()
      spark.sparkContext.setJobDescription(s"R22AB $v rep$i")
      variants(v)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      times(v) = times(v) :+ sec
      println(f"[r22ab] $v rep$i: $sec%.2f s ${graft.JvmTelemetry.delta(jvm0)}")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    for (v <- names) {
      val sorted = times(v).sorted
      val med = sorted(sorted.size / 2)
      println(f"[r22ab] MEDIAN $v: $med%.2f s over ${sorted.size} reps " +
        s"(all: ${sorted.map(t => f"$t%.2f").mkString(",")})")
    }
    spark.stop()
  }
}
