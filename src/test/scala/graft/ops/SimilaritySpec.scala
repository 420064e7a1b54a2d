package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  /** Deterministic pseudo-random corpus: 5 clusters of 40 vectors in R^16;
    * cluster members = cluster axis + small deterministic noise, so true
    * neighbors of any vector are its cluster mates.
    */
  private def vec(cluster: Int, j: Int): Array[Float] = {
    val v = Array.fill(16)(0.0f)
    // hash-derived noise in [-0.05, 0.05)
    for (d <- 0 until 16) {
      val h = scala.util.hashing.MurmurHash3.productHash((cluster, j, d))
      v(d) = ((h % 1000) / 10000.0f)
    }
    v(cluster) += 1.0f
    v
  }

  private lazy val corpus: Seq[(Long, Array[Float])] =
    for (c <- 0 until 5; j <- 0 until 40)
      yield ((c * 40 + j).toLong, vec(c, j))

  private lazy val dir = embeddingsDir(corpus)

  private def cosLocal(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def exactTopK(qid: Long, k: Int): Seq[Long] = {
    val q = corpus.find(_._1 == qid).get._2
    corpus.filter(_._1 != qid)
      .map { case (id, v) => (id, cosLocal(q, v)) }
      .sortBy { case (id, c) => (-c, id) }
      .take(k).map(_._1)
  }

  test("q35 brute-force top-k matches a local exact ranking") {
    val rows = Similarity.queries("q35_ann_topk")(spark, dir)
      .orderBy(col("qid"), col("rank")).collect()
    for (qid <- 0L until 5L) {
      val got = rows.filter(_.getLong(0) == qid).sortBy(_.getInt(3)).map(_.getLong(1)).toSeq
      assert(got === exactTopK(qid, 10), s"qid $qid")
    }
  }

  test("q35 ranks are 1..10 with descending cosine") {
    val rows = Similarity.queries("q35_ann_topk")(spark, dir)
      .filter(col("qid") === 0L).orderBy(col("rank")).collect()
    assert(rows.map(_.getInt(3)).toSeq === (1 to 10))
    val cos = rows.map(_.getDouble(2)).toSeq
    assert(cos === cos.sorted.reverse)
  }

  test("q127 hard negatives: label-mismatch exclusion vs a local exact ranking") {
    // labels = cluster index, so every query's TRUE nearest neighbors
    // (its cluster mates) are same-label and must be excluded — the
    // returned negatives are exactly the best other-cluster vectors
    val labeled = embeddingsDirLabeled(
      corpus.map { case (id, v) => (id, v, (id / 40).toInt) })
    val rows = Similarity.queries("q127_hard_negatives")(spark, labeled)
      .orderBy(col("qid"), col("rank")).collect()
    for (qid <- 0L until 5L) {
      val mine = rows.filter(_.getLong(0) == qid)
      // queries 0-4 live in cluster 0: no returned vec may be cluster 0
      assert(mine.forall(r => r.getLong(1) == 0L && r.getLong(3) != 0L
        && r.getLong(2) >= 40L), s"qid $qid leaked a same-label vector")
      // exact local ranking restricted to other-label vectors
      val q = corpus.find(_._1 == qid).get._2
      val want = corpus.filter(x => x._1 != qid && x._1 / 40 != qid / 40)
        .map { case (id, v) => (id, cosLocal(q, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1)
      assert(mine.sortBy(_.getInt(5)).map(_.getLong(2)).toSeq === want,
        s"qid $qid")
      // ranks 1..10, cosine descending
      assert(mine.map(_.getInt(5)).sorted.toSeq === (1 to 10))
      val cos = mine.sortBy(_.getInt(5)).map(_.getDouble(4)).toSeq
      assert(cos === cos.sorted.reverse)
    }
  }

  test("q36 multi-probe LSH ANN achieves high recall vs exact") {
    val rows = Similarity.queries("q36_ann_lsh")(spark, dir).collect()
    val recall = (0L until 5L).map { qid =>
      val got = rows.filter(_.getLong(0) == qid).map(_.getLong(1)).toSet
      val truth = exactTopK(qid, 10).toSet
      (got intersect truth).size / 10.0
    }.sum / 5.0
    assert(recall >= 0.7, s"aggregate recall@10 = $recall")
  }

  test("q43 IVF ANN: clustered corpus routes queries to useful lists") {
    val rows = Similarity.queries("q43_ann_ivf")(spark, dir).collect()
    // every query yields candidates from its own list, ranked
    for (qid <- 0L until 5L) {
      val got = rows.filter(_.getLong(0) == qid)
      assert(got.nonEmpty, s"qid $qid returned no candidates")
      val ranks = got.map(_.getInt(3)).sorted.toSeq
      assert(ranks === (1 to ranks.size))
    }
    // k-means centroids (farthest-point seeded, near-dup-merged) route each
    // query to a list holding its own cluster: single-probe recall must be
    // high, not merely above chance (the round-3 stride-sample quantizer
    // only cleared 0.2)
    val recall = (0L until 5L).map { qid =>
      val got = rows.filter(_.getLong(0) == qid).map(_.getLong(1)).toSet
      (got intersect exactTopK(qid, 10).toSet).size / 10.0
    }.sum / 5.0
    assert(recall >= 0.5, s"aggregate IVF recall@10 = $recall")
  }

  test("q43 nprobe: probing more lists never lowers recall") {
    def recallOf(nprobe: Int): Double = {
      val rows = Similarity.annIvf(spark, dir, nprobe = nprobe).collect()
      (0L until 5L).map { qid =>
        val got = rows.filter(_.getLong(0) == qid).map(_.getLong(1)).toSet
        (got intersect exactTopK(qid, 10).toSet).size / 10.0
      }.sum / 5.0
    }
    val r1 = recallOf(1); val r3 = recallOf(3)
    assert(r3 >= r1, s"nprobe=3 recall $r3 < nprobe=1 recall $r1")
    assert(r3 >= 0.5)
  }

  test("q131 recall sweep: monotone in nprobe; a full probe budget recovers recall exactly 1") {
    // 1024 >= nlist always holds here, so the last leg probes EVERY list:
    // the approx candidate set equals the exact one and integer-ppm
    // recall must be exactly 1_000_000 — a literal, not a threshold
    val rows = Similarity.annRecallSweep(spark, dir, probes = Seq(1, 3, 1024))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows.keySet === Set(1L, 3L, 1024L))
    rows.values.foreach { case (nq, _, _) => assert(nq === 5L) }
    val mean = rows.view.mapValues(_._2).toMap
    assert(mean(3L) >= mean(1L), s"nprobe=3 mean ${mean(3L)} < nprobe=1 ${mean(1L)}")
    assert(rows(1024L) === ((5L, 1000000L, 1000000L)),
      s"full probe budget must be exact: ${rows(1024L)}")
  }

  test("hand-pinned fit arithmetic: KMeansLite cosine seed walk + Lloyd + merge (tools/r20/hand_kmeans.py)") {
    // Literals hand-derived OUTSIDE the codebase (tools/r20/hand_kmeans.py)
    // on exact-in-float32 grids — the coarse-quantizer fit behind
    // q43/q66/q131, previously restatement-only evidence.
    // seed walk: max-cos to (1,0) is 1.0 / 0.894 / 0.832 / -1.0 ->
    // second seed (-1,0); Lloyd sends the first three to c0 ->
    // mean ((1+0.5+0.75)/3, (0+0.25+0.5)/3) = (0.75, 0.25) exactly
    val grid = Array(Array(1f, 0f), Array(0.5f, 0.25f),
      Array(0.75f, 0.5f), Array(-1f, 0f))
    assert(KMeansLite.fit(grid, 2, iters = 1).map(_.toSeq).toSeq ===
      Seq(Seq(0.75f, 0.25f), Seq(-1f, 0f)))
    // collinear degenerate: cos((1,0),(0.5,0)) = 1.0 exactly, NOT < 1.0,
    // so the walk re-picks the first point; the empty twin cluster is
    // DROPPED (KMeansLite semantics, unlike KMeansL2's keep-old) and the
    // survivor is the mean (0.75, 0)
    assert(KMeansLite.fit(Array(Array(1f, 0f), Array(0.5f, 0f)), 2, iters = 1)
      .map(_.toSeq).toSeq === Seq(Seq(0.75f, 0f)))
    // near-duplicate merge: both points survive Lloyd as their own
    // centroid, cos = 0.96.. > 0.95 -> merged to the first
    assert(KMeansLite.fit(Array(Array(1f, 0f), Array(0.96f, 0.28f)), 2, iters = 1)
      .map(_.toSeq).toSeq === Seq(Seq(1f, 0f)))
  }

  test("KMeansLite collapses over-provisioned k to the natural clusters") {
    val cents = KMeansLite.fit(corpus.map(_._2).toArray, 9, 3)
    // 5 planted clusters; duplicate centroids within one cluster merge
    assert(cents.length >= 4 && cents.length <= 6, s"got ${cents.length} centroids")
  }

  test("q34 bucket cap: a mass-duplicate bucket is skipped, not exploded") {
    // 250 identical vectors land in ONE bucket of every band — over the
    // 200 cap, so candidate generation must skip it (bounded fan-out;
    // identical payloads are exact-dedup's job), yielding no pairs
    val many = (0L until 250L).map(i => (i, Array.fill(16)(0.5f)))
    assert(Similarity.queries("q34_embed_neardup")(spark, embeddingsDir(many))
      .count() === 0L)
    // under the cap the same degenerate bucket DOES produce pairs
    val few = (0L until 50L).map(i => (i, Array.fill(16)(0.5f)))
    assert(Similarity.queries("q34_embed_neardup")(spark, embeddingsDir(few))
      .count() > 0L)
  }

  test("q34 near-dup: planted duplicate vector is the top pair") {
    val dup = corpus :+ (9999L, corpus.head._2.clone()) // exact copy of vec 0
    val d = embeddingsDir(dup)
    val top = Similarity.queries("q34_embed_neardup")(spark, d)
      .orderBy(col("cos").desc).limit(1).collect()(0)
    assert((top.getLong(0), top.getLong(1)) === ((0L, 9999L)))
    assert(top.getDouble(2) > 0.999999)
  }

  test("q66 semdedup: planted duplicates surface as top pairs within their cluster") {
    // exact copies of one member of each planted cluster: same argmax
    // centroid, same LSH signs in every band → candidate pair guaranteed
    val dups = (0 until 5).map(c =>
      ((9000 + c).toLong, corpus(c * 40)._2.clone()))
    // a NULL embedding row must be skipped, not NPE the fit or the assign
    val withNull = Seq((9998L, null.asInstanceOf[Array[Float]]))
    val d = embeddingsDir(corpus ++ dups ++ withNull)
    val e = graft.Tables.embeddings(spark, d)
    val pairs = Similarity.semDedupPairs(e)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every planted (original, copy) pair is found with cos ≈ 1
    for (c <- 0 until 5) {
      val orig = (c * 40).toLong; val copy = (9000 + c).toLong
      val hit = pairs.find(p => p._1 == orig && p._2 == copy)
      assert(hit.nonEmpty, s"planted pair ($orig, $copy) missing")
      assert(hit.get._3 > 0.999999)
    }
    // output is the deterministic top of the ranking: descending cosine
    val cos = pairs.map(_._3).toSeq
    assert(cos === cos.sorted.reverse)
  }

  test("simhash64: deterministic, token-order-insensitive, discriminative") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Seq("alpha", "beta", "gamma")),
      (2L, Seq("gamma", "alpha", "beta")),
      (3L, Seq("x1", "x2", "x3"))).toDF("id", "w")
      .select(col("id"), Similarity.simhash64(col("w")).as("sh"))
    val m = df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(m(1L) === m(2L)) // bag-of-tokens: order must not matter
    assert(m(1L) !== m(3L))
  }

  test("q87 embedOutliers: planted far vector ranks first, dist hand-checked") {
    val s = spark
    import s.implicits._
    val d = 8
    val base = (0L until 100L).map(i =>
      (i, Seq.fill(d)(0.1f), (i % 10).toInt))
    val outlier = (999L, Seq.fill(d)(5.0f), 3)
    val e = (base :+ outlier).toDF("vec_id", "embedding", "label")
    val rows = Similarity.embedOutliers(e, k = 3).collect()
    assert(rows.length === 3)
    assert(rows.head.getLong(0) === 999L)
    assert(rows.head.getInt(1) === 3) // label carried through
    // hand-check the distance: mean per dim = (100·0.1f + 5f)/101
    val mu = (100.0 * 0.1f.toDouble + 5.0f.toDouble) / 101.0
    val expect = math.sqrt(d * (5.0 - mu) * (5.0 - mu))
    assert(math.abs(rows.head.getDouble(2) - expect) < 1e-6, rows.head)
    // the remaining top rows are base vectors, all equidistant: the
    // rounded-dist tie breaks on vec_id ascending
    assert(rows(1).getLong(0) === 0L && rows(2).getLong(0) === 1L)
    // NULL embeddings are excluded, not scored
    val withNull = e.unionByName(Seq((1000L,
      null.asInstanceOf[Seq[Float]], 0)).toDF("vec_id", "embedding", "label"))
    assert(!Similarity.embedOutliers(withNull, k = 200).collect()
      .exists(_.getLong(0) === 1000L))
  }

  test("q87: ragged vectors are excluded from sample AND scoring (modal d)") {
    val s = spark
    import s.implicits._
    // modal dimension is 4 (60 vectors); 30 truncated d=3 rows and one
    // d=5 row are ragged — tiny vec_ids so the md5-ordered 2048-sample
    // would certainly include them if they weren't filtered out
    val whole = (100L until 160L).map(i => (i, Seq.fill(4)(1.0f), 0))
    val ragged = (0L until 30L).map(i => (i, Seq.fill(3)(99.0f), 1)) :+
      ((30L, Seq.fill(5)(99.0f), 1))
    val e = (whole ++ ragged).toDF("vec_id", "embedding", "label")
    val rows = Similarity.embedOutliers(e, k = 200).collect()
    // no ragged row is scored...
    assert(rows.forall(_.getInt(1) === 0), rows.mkString(", "))
    assert(rows.length === 60)
    // ...and none perturbed the mean: every full-d vector IS the mean,
    // so every distance is exactly 0 (a 99.0 leak into any dim sum would
    // show up here)
    assert(rows.forall(_.getDouble(2) === 0.0), rows.mkString(", "))
  }

  test("q87: modal-dimension tie breaks to the SMALLER length") {
    val s = spark
    import s.implicits._
    // 5 vectors at d=2 and 5 at d=3: count ties, d=2 must win on both
    // engines (count desc, length asc — the pinned total order)
    val e = ((0L until 5L).map(i => (i, Seq.fill(2)(1.0f), 2)) ++
      (5L until 10L).map(i => (i, Seq.fill(3)(1.0f), 3)))
      .toDF("vec_id", "embedding", "label")
    val rows = Similarity.embedOutliers(e, k = 20).collect()
    assert(rows.length === 5)
    assert(rows.forall(_.getInt(1) === 2), rows.mkString(", "))
  }

  test("q87 plan: scoring is a map-side scan projection + top-k heap") {
    val df = graft.SparkEntry.queries("q87_embed_outliers")(
      spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("dist_to_point"), p) // the native codegen kernel
    assert(!p.contains("Window") && !p.contains("CartesianProduct"), p)
  }

  test("q109: hand-checked per-(label, dim) centroid/variance; ragged dims count only their vectors") {
    val s = spark
    import s.implicits._
    val e = Seq(
      (1L, Seq(1.0f, 2.0f), 0),
      (2L, Seq(3.0f, 4.0f), 0),
      (3L, Seq(5.0f), 1)) // ragged: dim 2 sees only label-0 vectors
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.labelCentroids(e).collect()
      .map(x => (x.getLong(0), x.getLong(1)) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(r === Map(
      (0L, 1L) -> ((2L, 2000000L, 1000000000000L)), // values 1, 3: mean 2, var 1
      (0L, 2L) -> ((2L, 3000000L, 1000000000000L)), // values 2, 4
      (1L, 1L) -> ((1L, 5000000L, 0L))))            // single vector: var 0
  }

  test("q109: a half-micro mean (n=2, odd micro sum) is exact, not a rounding coin-flip") {
    val s = spark
    import s.implicits._
    // micro values 1 and 2 -> mean 1.5 micro; the retired /1e6-then-
    // round-6 spelling put this on the unrepresentable 1.5e-6 boundary
    // where Spark and DuckDB round apart; integer micro-units round the
    // exactly-representable 1.5 away from zero on both engines
    val e = Seq(
      (1L, Seq(1.2e-6f), 0),  // floor(widened * 1e6) = 1 (mid-interval, safe)
      (2L, Seq(2.7e-6f), 0))  // floor = 2
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.labelCentroids(e).collect()
    assert(r.length === 1)
    assert(r(0).getLong(3) === 2L) // round(1.5) away from zero
  }

  test("q109 plan: one (label, dim)-keyed partial agg; vectors never shuffle") {
    val df = graft.SparkEntry.queries("q109_label_centroids")(
      spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("partial"), p)
    assert(!p.contains("Window") && !p.contains("CartesianProduct"), p)
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val plan = executed(df)
    plan.collect { case ex: ShuffleExchangeExec => ex }.foreach { ex =>
      assert(!ex.child.output.exists(_.name == "embedding"),
        s"embedding vectors cross an exchange:\n$plan")
    }
  }

  test("q110: centroid shift between halves; one-sided labels excluded") {
    val s = spark
    import s.implicits._
    val e = Seq(
      (2L, Seq(1.0f, 0.0f), 0), (4L, Seq(3.0f, 0.0f), 0), // even: centroid (2,0)
      (1L, Seq(5.0f, 0.0f), 0), (3L, Seq(7.0f, 4.0f), 0), // odd: centroid (6,2)
      (6L, Seq(9.0f, 9.0f), 1)) // label 1 only in the even half: excluded
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.centroidDrift(
      e.filter($"vec_id" % 2 === 0), e.filter($"vec_id" % 2 =!= 0)).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3))))
      .toMap
    // sqrt((2-6)^2 + (0-2)^2) = sqrt(20)
    assert(r === Map(0L -> ((2L, 2L, 4.472136))))
  }

  test("q110: a 1-micro-unit drift survives the squared sum (the decimal-cap trap)") {
    val s = spark
    import s.implicits._
    // micro-units: floor(0.0*1e6)=0 vs floor(2e-6f widened *1e6)=1 — means
    // differ by exactly 1 micro; the retired DECIMAL(18,6) square re-rounded
    // the 1e-12 product to scale 11 and reported drift 0.0 (long micro
    // arithmetic keeps it exact by construction)
    val e = Seq(
      (2L, Seq(0.0f), 0),
      (1L, Seq(2.0e-6f), 0))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.centroidDrift(
      e.filter($"vec_id" % 2 === 0), e.filter($"vec_id" % 2 =!= 0)).collect()
    assert(r.length === 1)
    assert(r(0).getDouble(3) === 1.0e-6)
  }

  test("lshBitsFor scales with corpus and clamps") {
    assert(Similarity.lshBitsFor(100) === 4)
    assert(Similarity.lshBitsFor(64 * 1024) === 10)
    // 10^9 vectors still grow buckets (24 bits = 16M buckets); past the
    // clamp the bucketPairs cap bounds per-bucket work instead
    assert(Similarity.lshBitsFor(1000000000L) === 24)
    assert(Similarity.lshBitsFor(100000000000L) === 24)
  }

  test("q140: hand-computed norm profile; zero vectors counted, NULLs excluded") {
    import spark.implicits._
    // label 1: [3,4] → ‖v‖² = 25 → 25_000_000 micro; [0,0] → 0 (a zero
    //   vector) → mean = 25e6 div 2 = 12_500_000
    // label 2: [1] → 1_000_000
    val e = Seq(
      (1L, Some(Seq(3f, 4f)), 1),
      (2L, Some(Seq(0f, 0f)), 1),
      (3L, Some(Seq(1f)), 2),
      (4L, None: Option[Seq[Float]], 1))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.embedNormProfile(e).collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(got === Map(
      1 -> ((2L, 1L, 12500000L, 0L, 25000000L)),
      2 -> ((1L, 0L, 1000000L, 1000000L, 1000000L))))
  }
}
