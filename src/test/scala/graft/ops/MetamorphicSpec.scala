package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Metamorphic properties for the fixture-oracled family (round-10
  * verdict item #3): the fixture oracles are same-author differential
  * tests, so a misunderstanding replicated in both the operator and its
  * derivation would pass the gate. These properties hold for ANY correct
  * implementation — input-order invariance (every bounded fit samples by
  * (xxhash64(id), id), never by physical order), corpus-duplication
  * invariance, and monotonicity under planted perturbations — and none
  * of them consults the fixture machinery.
  */
class MetamorphicSpec extends SparkSpec {

  /** 5 clusters of 24 vectors in R^16 (SimilaritySpec's recipe, smaller). */
  private def vec(cluster: Int, j: Int): Array[Float] = {
    val v = Array.fill(16)(0.0f)
    for (d <- 0 until 16) {
      val h = scala.util.hashing.MurmurHash3.productHash((cluster, j, d))
      v(d) = ((h % 1000) / 10000.0f)
    }
    v(cluster) += 1.0f
    v
  }

  private lazy val corpus: Seq[(Long, Array[Float])] =
    for (c <- 0 until 5; j <- 0 until 24)
      yield ((c * 24 + j).toLong, vec(c, j))

  test("q43 annIvf: physical row order of the corpus is invisible") {
    val dirA = embeddingsDir(corpus)
    val dirB = embeddingsDir(new scala.util.Random(7).shuffle(corpus))
    def run(dir: String) = collectSet(
      Similarity.annIvf(spark, dir, nHint = Some(corpus.size.toLong),
        nlistHint = Some(5)))
    val base = run(dirA)
    assert(base.nonEmpty) // vacuous invariance proves nothing
    assert(run(dirB) === base)
  }

  test("q66 semDedupPairs: row-order permutation yields identical pairs") {
    val s = spark
    import s.implicits._
    def run(rows: Seq[(Long, Array[Float])]) = collectSet(
      Similarity.semDedupPairs(rows.toDF("vec_id", "embedding"),
        nHint = Some(rows.size.toLong), nlistHint = Some(5)))
    val base = run(corpus)
    assert(base.nonEmpty) // vacuous invariance proves nothing
    assert(run(new scala.util.Random(7).shuffle(corpus)) === base)
  }

  test("q66 semDedupPairs: a planted duplicate appears; moved far away it vanishes") {
    val s = spark
    import s.implicits._
    def pairsOf(rows: Seq[(Long, Array[Float])]): Set[(Long, Long)] =
      Similarity.semDedupPairs(rows.toDF("vec_id", "embedding"),
        nHint = Some(rows.size.toLong), nlistHint = Some(5))
        .select(col("a"), col("b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val dup = corpus :+ (1000L, vec(0, 0)) // exact copy of vec_id 0
    assert(pairsOf(dup).contains((0L, 1000L)))
    // same id, orthogonal direction far from every cluster: the pair must
    // not survive (similarity dropped, so any correct near-dup op drops it)
    val far = Array.fill(16)(0.0f); far(9) = -50.0f
    val moved = corpus :+ (1000L, far)
    assert(!pairsOf(moved).contains((0L, 1000L)))
  }

  test("q84 Pq.fit: codebooks are identical under row-order permutation") {
    val s = spark
    import s.implicits._
    def model(rows: Seq[(Long, Array[Float])]) =
      Pq.fit(rows.toDF("vec_id", "embedding"), m = 8, k = 4)
    val a = model(corpus)
    val b = model(new scala.util.Random(7).shuffle(corpus))
    assert(a.m === b.m && a.k === b.k && a.subDim === b.subDim)
    for (sub <- 0 until a.m; c <- 0 until a.k)
      assert(a.codebooks(sub)(c).toSeq === b.codebooks(sub)(c).toSeq,
        s"codebook ($sub, $c) diverged under permutation")
  }

  test("q78 Bpe.learn: merge table is invariant under doc order AND corpus duplication") {
    val s = spark
    import s.implicits._
    val texts = Seq(
      "low low low low low lower lower newest newest newest",
      "newest newest newest widest widest widest",
      "hug hug hug hugs pugs pugs pug")
    def merges(rows: Seq[String]) =
      Bpe.learn(rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"), numMerges = 30).merges
    val base = merges(texts)
    assert(base.nonEmpty)
    assert(merges(texts.reverse) === base)
    // duplicating every doc doubles every pair count: the argmax order
    // (count desc, pair asc) is scale-invariant, so the base sequence
    // must be a PREFIX of the duplicated corpus's merges. Not equality:
    // the "no pair occurs twice" early-stop is count-dependent by design
    // — pairs at count 1 in the base cross the threshold when doubled
    // and legally extend the table. A fixture derivation that depended
    // on per-doc order or broke the tie order would diverge here.
    assert(merges(texts ++ texts).take(base.length) === base)
  }

  test("q31/q32/q34/q36: banded-LSH pair/ANN sets are invariant under physical row order") {
    // the cap election inside bucketPairs and the seeded band hashing
    // must key on ids and content, never on partition/row order — a
    // fixture derivation sharing an order dependency would track the op
    // on one layout and diverge on another
    val docs: Seq[(Long, String)] = {
      val near = (1 to 30).map(i => s"n$i").mkString(" ")
      Seq(1L -> near, 2L -> (near + " extra"),
        3L -> (near + " extra tail")) ++
        (10 until 60).map(i =>
          i.toLong -> (0 until 25).map(j => s"d${i}w$j").mkString(" "))
    }
    val rnd = new scala.util.Random(7)
    val dA = docsDir(docs)
    val dB = docsDir(rnd.shuffle(docs))
    val withDup = corpus :+ (1000L, vec(0, 0))
    val eA = embeddingsDir(withDup)
    val eB = embeddingsDir(rnd.shuffle(withDup))
    val cases = Seq(
      ("q31_dedup_minhash", dA, dB), ("q32_dedup_simhash", dA, dB),
      ("q34_embed_neardup", eA, eB), ("q36_ann_lsh", eA, eB))
    for ((q, a, b) <- cases) {
      val base = collectSet(graft.SparkEntry.queries(q)(spark, a))
      assert(base.nonEmpty, s"$q: vacuous invariance proves nothing")
      assert(collectSet(graft.SparkEntry.queries(q)(spark, b)) === base,
        s"$q diverged under row-order permutation")
    }
  }

  test("q60 Pca.fitSampled: permutation-invariant, and a planted dominant axis is PC 1") {
    val s = spark
    import s.implicits._
    // variance overwhelmingly along axis 3; small hash noise elsewhere
    val pts: Seq[(Long, Array[Float])] = (0 until 120).map { i =>
      val v = Array.tabulate(16) { d =>
        val h = scala.util.hashing.MurmurHash3.productHash((i, d))
        ((h % 100) / 10000.0f)
      }
      v(3) += (i % 11 - 5) * 2.0f
      (i.toLong, v)
    }
    def model(rows: Seq[(Long, Array[Float])]) =
      Pca.fitSampled(rows.toDF("vec_id", "embedding"), k = 4)
    val a = model(pts)
    val b = model(new scala.util.Random(7).shuffle(pts))
    for (c <- 0 until 4)
      assert(a.components(c).toSeq === b.components(c).toSeq,
        s"component $c diverged under permutation")
    assert(a.eigenvalues.toSeq === b.eigenvalues.toSeq)
    // any correct PCA puts the planted axis first (up to sign)
    assert(math.abs(a.components(0)(3)) > 0.99,
      s"PC 1 not aligned with the planted axis: ${a.components(0).toSeq}")
    assert(a.eigenvalues(0) > 10 * math.abs(a.eigenvalues(1)))
  }

  test("q105 fertility: under a FIXED model, corpus duplication doubles counts, not ratios") {
    val s = spark
    import s.implicits._
    val texts = Seq(
      "the cat and the dog and the bird",
      "el gato y el perro y el pajaro de la casa",
      "the rain in spain stays mainly on the plain")
    def docsOf(rows: Seq[String]) =
      rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
    val model = Bpe.learn(docsOf(texts), numMerges = 50)
    def rows(docs: org.apache.spark.sql.DataFrame) =
      Bpe.fertility(s, docs, model).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val base = rows(docsOf(texts))
    assert(base.nonEmpty)
    // duplicate every doc with disjoint ids: per-language doc/word/token
    // counts double exactly, the tokens-per-word ratio is unchanged — an
    // encode or rollup that depended on doc identity or corpus size
    // would break one side or the other
    val doubled = rows(docsOf(texts)
      .unionAll(docsOf(texts).withColumn("doc_id", col("doc_id") + 1000)))
    assert(doubled.keySet === base.keySet)
    for ((lang, (nd, nw, nt, f)) <- base) {
      assert(doubled(lang) === ((2 * nd, 2 * nw, 2 * nt, f)),
        s"lang $lang: duplication must double counts and preserve fertility")
    }
  }

  test("q82 compressionRatio: repetition compresses; identical docs get identical ratios") {
    val s = spark
    import s.implicits._
    val rep = (0 until 100).map(_ => "ab").mkString(" ")
    val varied = (0 until 100).map(i => s"w${i * 7919}").mkString(" ")
    // two identical copies of each text in ONE partition: the reused
    // per-partition Deflater must reset between docs (dictionary bleed
    // between neighbors would make the second copy compress better)
    val df = Seq((1L, rep), (2L, rep), (3L, varied), (4L, varied))
      .toDF("doc_id", "text").coalesce(1)
    val r = TextAnalysis.compressionRatio(s, df).collect()
      .map(x => x.getLong(0) -> x.getDouble(x.fieldIndex("compress_ratio")))
      .toMap
    assert(r(1L) === r(2L), "identical docs must compress identically")
    assert(r(3L) === r(4L))
    assert(r(1L) < r(3L) / 2,
      s"repetitive text must compress far better: rep=${r(1L)} varied=${r(3L)}")
  }

  test("q41 aHash: byte-identical images fingerprint identically; row order is invisible end-to-end") {
    // the aHash must be a pure function of the pixels — identical bytes
    // under different doc ids (or different row positions) must collide
    // exactly, or near-dup blocking on the hash is meaningless
    val png = Multimodal.synthImage(groupSeed = 3, salt = 5)
    val a = Multimodal.decodeMedia(1L, "image/png", png)
    val b = Multimodal.decodeMedia(999L, "image/png", png)
    assert(a.phash != 0L, "real pixel decode must produce a nonzero aHash")
    assert(a.phash === b.phash && a.checksum === b.checksum)
    // ...and a one-pixel variant of the same group stays NEAR, not equal:
    // hamming <= 2 (each image's one inverted pixel), never 0
    val c = Multimodal.decodeMedia(2L, "image/png",
      Multimodal.synthImage(groupSeed = 3, salt = 77))
    assert(c.phash != a.phash)
    assert(java.lang.Long.bitCount(a.phash ^ c.phash) <= 2)
    // end-to-end: the q41 feature set is invariant under physical row order
    val docs: Seq[(Long, String)] =
      (0L until 40L).map(i => i -> s"doc $i body ${"x" * (i % 7).toInt}")
    val base = collectSet(
      graft.SparkEntry.queries("q41_multimodal")(spark, docsDir(docs)))
    assert(base.nonEmpty)
    assert(collectSet(graft.SparkEntry.queries("q41_multimodal")(spark,
      docsDir(new scala.util.Random(7).shuffle(docs)))) === base)
  }

  test("q42 sampleFrames: re-muxing the MP4 (any chunking) preserves every sampled frame") {
    // stsc/stco chunk grouping is container bookkeeping, not content: a
    // re-mux of the same sample table must yield byte-identical frame
    // samples (index, size, AND content checksum over the mdat bytes) —
    // a frame walk that keyed off chunk layout instead of the sample
    // table would diverge here
    val samples = (0 until 13).map(i =>
      Array.tabulate[Byte](24 + i)(j => ((i * 31 + j) & 0xff).toByte))
    def framesOf(chunksOf: Int): Seq[Multimodal.FrameSample] =
      Multimodal.sampleFrames(7L,
        Mp4Boxes.writeMp4(samples, keyframes1 = Some(Seq(1, 5)),
          chunksOf = chunksOf)).toSeq
    val base = framesOf(3)
    assert(base.map(_.frame_idx) === Seq(0, 4, 8, 12)) // every 4th of 13
    assert(base.map(_.n_bytes) === Seq(24, 28, 32, 36))
    for (c <- Seq(1, 2, 5, 13))
      assert(framesOf(c) === base, s"chunksOf=$c diverged from chunksOf=3")
  }

  test("q51 audio: the energy-contour fingerprint is amplitude-invariant (gain-scaled WAV)") {
    // the documented claim: scaling every sample scales every window
    // energy by the square, so the up/down contour — hence the afp — is
    // unchanged. Tested through the FULL path (16-bit PCM encode →
    // parse → samples → fingerprint), so quantization is in scope.
    for (seed <- 0L until 5L) {
      val low = AudioWav.features(seed, AudioWav.sineWav(seed, gain = 0.2)).get
      val high = AudioWav.features(seed, AudioWav.sineWav(seed, gain = 0.9)).get
      assert(low.afp != 0L, s"seed $seed: degenerate fingerprint")
      assert(low.afp === high.afp, s"seed $seed: gain changed the contour")
      assert(low.rms < high.rms, "amplitude DID change - invariance is not vacuous")
      assert(low.zero_cross === high.zero_cross)
      assert(low.duration_ms === high.duration_ms)
    }
    // distinct envelopes still fingerprint differently (afp is not constant)
    assert(AudioWav.features(1L, AudioWav.sineWav(1L)).get.afp !=
      AudioWav.features(2L, AudioWav.sineWav(2L)).get.afp)
  }

  test("q94 encodeCounts: text-determined counts — pure, word-additive, order-invariant") {
    val s = spark
    import s.implicits._
    val texts = Seq("low low lower newest", "newest widest low hug",
      "hug hugs pugs pug low")
    def docsOf(rows: Seq[String]) = rows.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val model = Bpe.learn(docsOf(texts), numMerges = 30)
    def rows(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] =
      Bpe.encodeCounts(s, df, model).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val base = rows(docsOf(texts))
    assert(base.values.forall(_._2 > 0))
    // purity: identical text under a different doc_id encodes identically
    val twin = rows(Seq((0L, texts(0)), (99L, texts(0))).toDF("doc_id", "text"))
    assert(twin(0L) === twin(99L))
    // word additivity under a FIXED model: BPE merges never cross a
    // whitespace boundary, so concatenating two docs sums both counts
    // exactly — a fixture derivation with any cross-word or per-doc
    // state would break one side
    val cat = rows(Seq((7L, texts(0) + " " + texts(1))).toDF("doc_id", "text"))
    assert(cat(7L)._1 === base(0L)._1 + base(1L)._1)
    assert(cat(7L)._2 === base(0L)._2 + base(1L)._2)
    // the full q94 composition (learn + encode over the same corpus) is
    // invariant under physical row order
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val qa = collectSet(
      graft.SparkEntry.queries("q94_bpe_encode")(spark, docsDir(docs)))
    assert(qa.nonEmpty)
    assert(collectSet(graft.SparkEntry.queries("q94_bpe_encode")(spark,
      docsDir(new scala.util.Random(7).shuffle(docs)))) === qa)
  }

  test("q77 Pq.encode: per-vector codes are invariant under corpus row order") {
    val s = spark
    import s.implicits._
    // one model (q84's permutation-invariant fit), applied to the same
    // rows in two physical orders: encode is per-row, so any divergence
    // would mean partition-dependent state leaked into the code path
    val model = Pq.fit(corpus.toDF("vec_id", "embedding"), m = 8, k = 4)
    def codes(rows: Seq[(Long, Array[Float])]): Map[Long, (Long, Double)] =
      Pq.encode(s, rows.toDF("vec_id", "embedding"), model).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val base = codes(corpus)
    assert(base.size === corpus.size)
    assert(base.values.map(_._1).toSet.size > 1, "codes must not be constant")
    assert(codes(new scala.util.Random(7).shuffle(corpus)) === base)
  }

  test("q58 mediaNearDupPairs: permutation-invariant, and unrelated rows never erase a pair") {
    val s = spark
    import s.implicits._
    // two planted fingerprint groups (hamming 1 within, far across) + noise
    val g1 = 0x1234_5678_9ABC_DEF0L
    val g2 = 0x0F0F_0F0F_F0F0_F0F0L
    val feats = Seq(
      (1L, "image", g1), (2L, "image", g1 ^ 1L),
      (3L, "audio", g2), (4L, "audio", g2 ^ 0x8000_0000L),
      (5L, "image", ~g1))
    def pairsOf(rows: Seq[(Long, String, Long)]): Set[(String, Long, Long)] =
      Multimodal.mediaNearDupPairs(rows.toDF("doc_id", "kind", "fp"))
        .select(col("kind"), col("a"), col("b")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val base = pairsOf(feats)
    assert(base === Set(("image", 1L, 2L), ("audio", 3L, 4L)))
    assert(pairsOf(new scala.util.Random(7).shuffle(feats)) === base)
    // adding unrelated fingerprints (distinct bands, ids disjoint) must
    // keep every existing pair — blocking may ADD candidates, never drop
    val noise = (100L to 140L).map(i =>
      (i, "image", 0x4000_0000_0000_0000L + i * 0x1_0001_0001L))
    assert(pairsOf(feats ++ noise).intersect(base) === base)
  }
}
