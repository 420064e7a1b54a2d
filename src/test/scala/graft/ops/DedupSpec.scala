package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {

  private def grams(text: String): Seq[String] = {
    val s = spark
    import s.implicits._
    Seq(text).toDF("text")
      .select(Dedup.gram3of(Dedup.tokens).as("sh"))
      .collect()(0).getSeq[String](0)
  }

  test("gram3: short docs yield empty array, no crash") {
    assert(grams("one") === Seq())
    assert(grams("one two") === Seq())
    assert(grams("   ") === Seq())
  }

  test("gram3: includes the LAST 3-gram (round-2 off-by-one)") {
    assert(grams("a b c") === Seq("a b c"))
    assert(grams("a b c d e") === Seq("a b c", "b c d", "c d e"))
  }

  // Planted near-dups: A/B differ by one token out of 40, C is unrelated,
  // D is an exact copy of A.
  private lazy val plantedDir = {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val b = ((1 to 39).map(i => s"tok$i") :+ "CHANGED").mkString(" ")
    val c = (1 to 40).map(i => s"other$i").mkString(" ")
    docsDir(Seq((1L, base), (2L, b), (3L, c), (4L, base)))
  }

  private def pairs(q: String): Set[(Long, Long)] =
    Dedup.queries(q)(spark, plantedDir)
      .select(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("q30: exact dedup keeps min doc_id and counts copies") {
    val rows = Dedup.queries("q30_dedup_exact")(spark, plantedDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows(1L) === 2L) // docs 1 and 4 identical
    assert(rows(2L) === 1L)
    assert(rows.size === 3)
  }

  test("q31 minhash: finds planted near-dup and exact dup, not unrelated") {
    val p = pairs("q31_dedup_minhash")
    assert(p.contains((1L, 4L)))
    assert(p.contains((1L, 2L)) || p.contains((2L, 4L)))
    assert(!p.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("q32 simhash: exact dup pair at hamming 0") {
    val df = Dedup.queries("q32_dedup_simhash")(spark, plantedDir)
    val byPair = df.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(byPair((1L, 4L)) === 0)
    assert(!byPair.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  // ---- Hand-computed signature evidence (the q94 evidence class) ----
  //
  // Every literal below is derived OUTSIDE this codebase by
  // tools/r19/hand_minhash.py: an XXH64 implemented directly from the
  // public xxHash specification (not Spark's XXH64.scala), the
  // HashedGrams rolling polynomial ((th0*P + th1)*P + th2 mod 2^64,
  // P = 0x9E3779B97F4A7C15) applied step by step, and the committed
  // permutation family a_i = (1000003*(2i+1)) mod (2^31-1)
  // (Dedup.permMul) applied by hand. These tests pin the CONSTANTS:
  // a silent change to the seed (42), the multiplier (1000003), the
  // modulus (2^31-1), NumHashes/BandRows, or the simhash vote rule
  // breaks a literal, not just a property.
  //
  // Corpus: doc 0 = "a b c d e f g h", doc 1 = "a b c d e f g i"
  // (differ in the last token; 6 distinct 3-grams each, 5 shared).
  //
  // Hand derivation (hand_minhash.py prints each step):
  //   gram pmods doc0: 281855639, 464982965, 609201593, 1016556185,
  //                    1463851143, 1499251580
  //   gram pmods doc1: 375163764 replaces 281855639, rest identical.
  //   minhash_i = min over gram pmods h of (h * a_i) mod (2^31-1);
  //   worked i=0 (a_0 = 1000003), doc0: the six products mod 2^31-1
  //   are 1403381814, 463282220, 964656525, 605720871, 1831739409,
  //   1107019925 -> min 463282220. Full signatures agree on 11 of 16
  //   slots -> est_jaccard = 11/16 = 0.6875; band 1 (slots 4-7)
  //   agrees fully, so the banded join emits the pair.
  //   simhash: per distinct token, bit i of XXH64(token) votes +1/-1;
  //   sh0 = 0x81603e010db4a54e, sh1 = 0x81703e050db4a54c ->
  //   XOR = 0x0010000400000002, hamming 3 (quarter 1 agrees -> banded
  //   blocking emits the pair; 3 <= 6 -> kept).

  test("xxhash64 differential: Spark matches from-spec XXH64 (seed 42)") {
    val s = spark
    import s.implicits._
    val expected = Seq( // from-spec XXH64 over UTF-8 bytes, seed 42
      ("a", -8582455328737087284L), ("b", -6391946315847899181L),
      ("c", -3446348257159517350L), ("d", 4409375254388155230L),
      ("e", -6921883615627926489L), ("f", 610608359497745772L),
      ("g", -4479768789114049076L), ("h", -5241787637716031954L),
      ("i", 511563035442587425L))
    val got = expected.map(_._1).toDF("t")
      .select(col("t"), xxhash64(col("t")).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    expected.foreach { case (t, h) => assert(got(t) === h, s"token $t") }
  }

  test("q31 hand evidence: exact pair and est_jaccard from hand-derived signatures") {
    val dir = docsDir(Seq((0L, "a b c d e f g h"), (1L, "a b c d e f g i")))
    val rows = Dedup.queries("q31_dedup_minhash")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq === Seq((0L, 1L, 0.6875))) // 11/16, see derivation
  }

  test("q32 hand evidence: exact hamming from hand-derived simhashes") {
    val dir = docsDir(Seq((0L, "a b c d e f g h"), (1L, "a b c d e f g i")))
    val rows = Dedup.queries("q32_dedup_simhash")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.toSeq === Seq((0L, 1L, 3)))
  }

  test("q128 neardup reps: membership, richest-doc election, tie to min id, drop accounting") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    // one token changed, and LONGER than the original -> doc 2 is the
    // richest member of the {1, 2, 4} cluster and must win election
    val b = ((1 to 39).map(i => s"tok$i") :+ "CHANGEDLONGER").mkString(" ")
    val c = (1 to 40).map(i => s"other$i").mkString(" ")
    // docs 5/6: a second cluster of EXACT copies — equal n_chars, so the
    // election must tie-break to the lowest doc_id
    val e = (1 to 30).map(i => s"extra$i").mkString(" ")
    val dir = docsDir(Seq((1L, base), (2L, b), (3L, c), (4L, base),
      (5L, e), (6L, e)))
    val rows = Dedup.queries("q128_neardup_reps")(spark, dir)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rows.keySet === Set(1L, 5L)) // cluster label = min member id
    // cluster 1 = {1, 2, 4}: doc 2 is longest, drops both copies of base
    assert(rows(1L) === ((3L, 2L, b.length.toLong, 2L * base.length)))
    // cluster 5 = {5, 6}: equal length, rep = min doc_id, one copy dropped
    assert(rows(5L) === ((2L, 5L, e.length.toLong, e.length.toLong)))
  }

  test("q132 rep remap: one row per member, elected rep attached, keep flag exact") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val b = ((1 to 39).map(i => s"tok$i") :+ "CHANGEDLONGER").mkString(" ")
    val c = (1 to 40).map(i => s"other$i").mkString(" ")
    val e = (1 to 30).map(i => s"extra$i").mkString(" ")
    val dir = docsDir(Seq((1L, base), (2L, b), (3L, c), (4L, base),
      (5L, e), (6L, e)))
    val rows = Dedup.queries("q132_rep_remap")(spark, dir)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    // cluster {1,2,4}: doc 2 (longest) elected; cluster {5,6}: tie -> 5
    assert(rows === Map(
      1L -> ((1L, 2L, false)), 2L -> ((1L, 2L, true)),
      4L -> ((1L, 2L, false)),
      5L -> ((5L, 5L, true)), 6L -> ((5L, 5L, false))))
    // doc 3 (unrelated, not in any pair) has no remap row: singletons
    // are implicit keepers, the rewrite job left-anti-joins them away
    assert(!rows.contains(3L))
  }

  test("q130 fuzzyLeakage: cross-split near-dups oriented and counted; same-split pairs excluded") {
    // md5-prefix split labels (hand-checked against the q46 arithmetic):
    // ids 1, 2, 22 -> train; 16 -> val; 8, 20 -> test
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val endChanged = ((1 to 39).map(i => s"tok$i") :+ "CHANGED").mkString(" ")
    val startChanged = ("CHANGED" +: (2 to 40).map(i => s"tok$i")).mkString(" ")
    val docs = Seq(
      (1L, base),          // train
      (16L, endChanged),   // val   — near-dup of 1 and 8
      (8L, startChanged),  // test  — near-dup of 1 and 16
      (2L, "same split twin one two three four five six"),   // train
      (22L, "same split twin one two three four five six"),  // train
      (20L, (1 to 40).map(i => s"other$i").mkString(" ")))   // test, unrelated
    val s = spark
    import s.implicits._
    val df = Dedup.fuzzyLeakage(docs.toDF("doc_id", "text"))
    val rows = df.collect().map(r => ((r.getString(0), r.getString(1)),
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // splits: train {1, 2, 22}, val {16}, test {8, 20}
    assert(rows === Map(
      ("train", "val") -> ((1L, 1L, 1L, 1000000L)),
      ("train", "test") -> ((1L, 1L, 2L, 500000L)),
      ("val", "test") -> ((1L, 1L, 2L, 500000L))))
    // the (2, 22) same-split exact pair contributed nowhere
  }

  test("q33 ngram jaccard: near-dup above 0.8, unrelated absent") {
    val p = pairs("q33_ngram_jaccard")
    assert(p.contains((1L, 4L)))
    assert(!p.exists { case (a, b) => a == 3L || b == 3L })
    val j = Dedup.queries("q33_ngram_jaccard")(spark, plantedDir)
      .filter(col("a") === 1L && col("b") === 4L)
      .collect()(0).getDouble(2)
    assert(j === 1.0) // identical docs: jaccard exactly 1 in the kept space
  }

  test("q33 survives docs shorter than 3 tokens mixed in") {
    val dir = docsDir(Seq((1L, "a"), (2L, "a b"), (3L, "x y z w"), (4L, "x y z w")))
    val p = Dedup.queries("q33_ngram_jaccard")(spark, dir)
      .select(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p === Set((3L, 4L)))
  }

  test("connectedComponents: transitive closure, multiple components, singleton exclusion") {
    val s = spark
    import s.implicits._
    // chain 1-2-3-4 (1~4 never a direct pair) + separate component {7,8};
    // doc 9 exists in the corpus but in no pair -> not in the output
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (7L, 8L)).toDF("a", "b")
    val got = Dedup.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got === Map(
      1L -> ((1L, true)), 2L -> ((1L, false)), 3L -> ((1L, false)), 4L -> ((1L, false)),
      7L -> ((7L, true)), 8L -> ((7L, false))))
  }

  test("connectedComponents: a long chain converges within maxIters") {
    val s = spark
    import s.implicits._
    val chain = (1L until 9L).map(i => (i, i + 1)).toDF("a", "b")
    val clusters = Dedup.connectedComponents(chain, maxIters = 10)
      .select(col("cluster")).distinct().collect().map(_.getLong(0)).toSeq
    assert(clusters === Seq(1L))
  }

  test("connectedComponents: pointer-jumping collapses a 1000-deep chain in O(log D) rounds") {
    // plain min-propagation needs D-1 rounds for a diameter-D chain —
    // this exact input THREW non-convergence at the default maxIters=20
    // before the jump (captured before the change: "did not converge in
    // 20 iterations" after 9.7 s). With label := label(label) from round
    // JumpAfter on, reach at least doubles per round.
    val s = spark
    import s.implicits._
    val chain = (1L until 1000L).map(i => (i, i + 1)).toDF("a", "b")
    val (labelled, iters) = Dedup.connectedComponentsIters(chain, maxIters = 20)
    val out = labelled.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out.size === 1000)
    assert(out.values.toSet === Set(1L), "every doc labels to the chain minimum")
    assert(iters <= 15, s"expected O(log 1000) ~ 12 rounds, took $iters")
    info(s"converged in $iters rounds (plain propagation needs 999)")
  }

  test("connectedComponents: 20k-node random graph (giant component, multi-partition " +
      "jump joins) matches an iterative union-find reference in O(log) rounds") {
    // 25k edges on 20k nodes → a giant component w.h.p. plus many small
    // ones: the labels frame spans all 32 shuffle partitions and the
    // jump join probes a heavily-concentrated cluster key — the shape
    // the 1000-chain (single skinny path) and the n<=60 fuzz never hit.
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(123)
    val n = 20000
    val edges = (1 to 25000).map { _ =>
      val a = rnd.nextInt(n); var b = rnd.nextInt(n)
      while (b == a) b = rnd.nextInt(n)
      (math.min(a, b).toLong, math.max(a, b).toLong)
    }.distinct
    // reference: union-find, ITERATIVE find (20k-deep recursion would
    // overflow the stack before path compression kicks in)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x0: Long): Long = {
      var x = x0
      while (parent.getOrElseUpdate(x, x) != x) x = parent(x)
      var y = x0 // path compression
      while (parent(y) != x) { val p = parent(y); parent(y) = x; y = p }
      x
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val minOfRoot = members.groupBy(find).map { case (r, ms) => r -> ms.min }
    val expect = members.map(d => d -> minOfRoot(find(d))).toMap
    val (labelled, iters) =
      Dedup.connectedComponentsIters(edges.toDF("a", "b"), maxIters = 20)
    val got = labelled.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === members.size)
    assert(got === expect)
    assert(iters <= 15, s"expected O(log) rounds on a random graph, took $iters")
    val giant = expect.values.groupBy(identity).values.map(_.size).max
    info(s"converged in $iters rounds; giant component: $giant of ${members.size} docs")
  }

  test("connectedComponents: refuses to return a half-merged clustering") {
    val s = spark
    import s.implicits._
    val deep = (1L until 30L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalStateException](
      Dedup.connectedComponents(deep, maxIters = 3))
    assert(e.getMessage.contains("did not converge"))
  }

  test("q69 dupSpans: positional cross-doc coverage; within-doc repeats don't count") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a b c d e"),       // 3 spans; "a b c","b c d" shared with doc 2
      (2L, "x a b c d y"),     // 4 spans; 2 shared with doc 1
      (3L, "p q r"),           // 1 span, duplicated verbatim by doc 5
      (4L, "m m m m"),         // within-doc repeat ONLY: gdf=1, no dup
      (5L, "p q r"),           // exact copy of doc 3
      (6L, "s t"),             // shorter than w: no spans, excluded
      (7L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Dedup.dupSpans(docs, w = 3)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(1L) === ((3L, 2L, math.rint(2.0 / 3 * 1e6) / 1e6)))
    assert(out(2L) === ((4L, 2L, 0.5)))
    assert(out(3L) === ((1L, 1L, 1.0)))
    assert(out(4L) === ((2L, 0L, 0.0)))
    assert(out(5L) === ((1L, 1L, 1.0)))
    assert(!out.contains(6L) && !out.contains(7L))
  }

  test("q70 stripDupSpans: duplicated windows cut, overlaps merged, rest normalized") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a b c d e"),   // spans "a b c"(0),"b c d"(1) shared with doc 2
      (2L, "x a b c d y"), // spans at 1,2 shared -> tokens 1..4 covered
      (3L, "p q r"),       // fully duplicated by doc 4: everything stripped
      (4L, "p q r"),
      (5L, "solo words only here"), // nothing shared: whitespace-normalized copy
      (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Dedup.stripDupSpans(docs, w = 3)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    // doc 1: dup starts {0,1} cover tokens 0..3 -> only "e" survives
    assert(out(1L) === ((5L, 1L, "e")))
    // doc 2: dup starts {1,2} cover tokens 1..4 -> "x" and "y" survive
    assert(out(2L) === ((6L, 2L, "x y")))
    assert(out(3L) === ((3L, 0L, "")))
    assert(out(4L) === ((3L, 0L, "")))
    assert(out(5L) === ((4L, 4L, "solo words only here")))
    assert(!out.contains(6L))
  }

  test("StripSpans expression: unsorted positions, boundary windows, empty list") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Seq("t0", "t1", "t2", "t3", "t4", "t5"), Seq(3L, 0L)), // unsorted input
      (Seq("t0", "t1", "t2"), Seq.empty[Long]),
      (Seq("t0", "t1", "t2", "t3"), Seq(2L))) // window runs past the end
      .toDF("t", "ps")
      .select(graft.functions.TextFunctions.stripSpans(col("t"), col("ps"), 2).as("st"))
      .select("st.n_tok", "st.n_kept", "st.text_clean")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(df(0) === ((6L, 2L, "t2 t5"))) // {3,0} cover 0,1 and 3,4
    assert(df(1) === ((3L, 3L, "t0 t1 t2")))
    assert(df(2) === ((4L, 2L, "t0 t1"))) // start 2 covers 2,3
  }

  test("incrementalDedup: flags cross-side near-dups only, best reference match wins") {
    val s = spark
    import s.implicits._
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val ref = Seq(
      (1000000000L, base),
      (2000000000L, "totally different reference content words written here right now"))
      .toDF("doc_id", "text")
    val inc = Seq(
      (3000000000L, base + " kilo"), // near-dup of reference 1e9
      (4000000000L, "unrelated increment text with its very own vocabulary entirely"),
      // twins: near-dups of EACH OTHER (same side) — must not be flagged
      (5000000000L, "twin increment doc sharing grams with its sibling only"),
      (6000000000L, "twin increment doc sharing grams with its sibling only plus tail"))
      .toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(ref, inc).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(_._1).toSet === Set(3000000000L))
    assert(out.head._2 === 1000000000L && out.head._3 >= 0.8)
  }

  test("incrementalDedup: argmax picks the highest jaccard, smallest id on ties") {
    val s = spark
    import s.implicits._
    val t = "one two three four five six seven eight nine ten"
    // increment doc is an exact copy of BOTH reference docs (jaccard 1.0
    // against each): tie broken toward the smaller reference id
    val ref = Seq((20L, t), (10L, t)).toDF("doc_id", "text")
    val inc = Seq((7L, t)).toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(ref, inc).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq((7L, 10L, 1.0)))
  }

  test("screenAgainstIndex: matches the one-shot screen on planted cases; cached frames freed") {
    val s = spark
    import s.implicits._
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val ref = Seq(
      (10L, base),
      (20L, "totally different reference content words written here right now"))
      .toDF("doc_id", "text")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val index = Dedup.buildRefIndex(ref)
    val inc = Seq(
      (1L, base + " kilo"),
      (2L, "unrelated increment text with its very own vocabulary entirely"))
      .toDF("doc_id", "text")
    val out = Dedup.screenAgainstIndex(index, inc).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(t => (t._1, t._2)).toSeq === Seq((1L, 10L)))
    assert(out.head._3 >= 0.8)
    // a SECOND screen reuses the same index (the streaming contract)
    val out2 = Dedup.screenAgainstIndex(index, Seq((3L, base)).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out2.toSeq === Seq((3L, 10L, 1.0)))
    index.free()
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty)
  }

  test("q62 driver query: odd-id increment screened against even-id reference") {
    val base = "papa quebec romeo sierra tango uniform victor whiskey xray yankee"
    val dir = docsDir(Seq(
      (2L, base),
      (3L, base + " zulu"),
      (5L, "no overlap with anything else in this corpus at all whatsoever")))
    val out = graft.SparkEntry.queries("q62_incr_dedup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((3L, 2L)))
  }

  test("q45 end to end: planted near-dup group clusters to the smallest doc_id") {
    val rows = Dedup.queries("q45_dedup_clusters")(spark, plantedDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    // docs 1, 2, 4 are the planted near/exact dups -> one cluster rooted
    // at 1, with exactly one canonical member; unrelated doc 3 never appears
    assert(rows.keySet === Set(1L, 2L, 4L))
    assert(rows.values.map(_._1).toSet === Set(1L))
    assert(rows.count(_._2._2) === 1 && rows(1L)._2)
  }

  test("q96 sourceOverlap: shared spans per source pair, containment of the small mirror") {
    val s = spark
    import s.implicits._
    val common = (1 to 16).map(i => s"t$i").mkString(" ")  // span in big+mini
    val other  = (1 to 16).map(i => s"u$i").mkString(" ")  // span in big+full, twice in full
    val docs = Seq(
      (1L, common + " " + other, "big"), // 32 tokens: 17 windows incl. both spans
      (2L, common, "mini"),              // 16 tokens: 1 window = its whole gram set
      (3L, other, "full"),
      (4L, other, "full"),               // within-source repeat: distinct'd away
      (5L, (1 to 16).map(i => s"z$i").mkString(" "), "lone"), // shares nothing
      (6L, null.asInstanceOf[String], "big"))
      .toDF("doc_id", "text", "source")
    val r = Dedup.sourceOverlap(docs).collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        ((x.getLong(2), x.getDouble(3)))).toMap
    // mini's ONE gram is inside big -> overlap 1.0 (subset mirror);
    // full's one distinct gram is inside big too; lone pairs with nobody
    assert(r === Map(
      ("big", "mini") -> ((1L, 1.0)),
      ("big", "full") -> ((1L, 1.0))))
  }

  test("q115 sourceDupMatrix: verbatim cross-source contents, ppm containment") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "shared one", "A"),   // in A, B and C
      (2L, "shared one", "B"),
      (3L, "shared one", "C"),
      (4L, "shared two", "A"),   // in A and B
      (5L, "shared two", "B"),
      (6L, "shared two", "B"),   // within-B duplicate: distinct contents count once
      (7L, "only in a", "A"),
      (8L, "only in b", "B"))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en")).withColumn("n_chars", length(col("text")))
    val r = Dedup.sourceDupMatrix(docs).collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        ((x.getLong(2), x.getLong(3)))).toMap
    // distinct contents: A {one,two,a}=3, B {one,two,b}=3, C {one}=1
    assert(r === Map(
      ("A", "B") -> ((2L, 666667L)), // 2 shared / min(3,3) -> round(2e6/3)
      ("A", "C") -> ((1L, 1000000L)),
      ("B", "C") -> ((1L, 1000000L))))
  }

  test("q115 driver query plants cross-source dups in-pipeline (non-vacuous at every scale)") {
    // The r16 verdict's one oracle hole: the sandbox corpus has no
    // cross-source verbatim duplicate at the gate scales, so the q115
    // oracle passed vacuously (0 rows both engines). The registration
    // now re-emits every doc_id % 37 == 0 doc under 'mirror' AND under
    // src{(doc_id div 37) % 20} — pin that the planted matrix is
    // non-empty and carries BOTH pair kinds, on a corpus that (like the
    // driver's) has no native cross-source dup.
    val dir = docsDirSrc(Seq(
      (0L, "planted zero", "src5"),    // 0 div 37 = 0  -> rotated to src0
      (37L, "planted one", "src9"),    // 37 div 37 = 1 -> rotated to src1
      (74L, "planted two", "src1"),    // 74 div 37 = 2 -> rotated to src2
      (5L, "bystander a", "src5"),
      (6L, "bystander b", "src9")))
    val r = graft.SparkEntry.queries("q115_source_dup_matrix")(spark, dir)
      .collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        ((x.getLong(2), x.getLong(3)))).toMap
    // distinct contents: mirror {zero,one,two}=3, src5 {zero,a}=2,
    // src9 {one,b}=2, src1 {two, one(rotated)}=2, src0 {zero}=1,
    // src2 {two}=1
    assert(r === Map(
      ("mirror", "src5") -> ((1L, 500000L)), // planted-mirror pairs
      ("mirror", "src9") -> ((1L, 500000L)),
      ("mirror", "src1") -> ((2L, 1000000L)),
      ("mirror", "src0") -> ((1L, 1000000L)),
      ("mirror", "src2") -> ((1L, 1000000L)),
      ("src0", "src5") -> ((1L, 1000000L)),  // rotated-source pairs
      ("src1", "src9") -> ((1L, 500000L)),
      ("src1", "src2") -> ((1L, 1000000L))))
  }

  // q46's md5-bucket split, recomputed independently of the Spark
  // expression (the SamplingSpec md5-prefix precedent): first 8 hex
  // chars of md5(doc_id) as a long, mod 100.
  private def splitOf(id: Long): String = {
    val h = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString, 16) % 100
    if (h < 80) "train" else if (h < 90) "val" else "test"
  }

  private def leakMatrixLocal(rows: Seq[(Long, String)]): Map[(String, String), (Long, Long, Long, Long)] = {
    val labeled = rows.filter(_._2 != null)
      .map { case (id, t) => (splitOf(id), t) }
    val bySplit = labeled.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      .withDefaultValue(0L)
    val groups = labeled.groupBy(_._2).values.map { g =>
      val c = g.groupBy(_._1).view.mapValues(_.size.toLong).toMap
        .withDefaultValue(0L)
      (c("train"), c("val"), c("test"))
    }.toSeq
    def cell(earlier: String, later: String,
             a: ((Long, Long, Long)) => Long,
             b: ((Long, Long, Long)) => Long) = {
      val hit = groups.filter(g => a(g) > 0 && b(g) > 0)
      val leaked = hit.map(b).sum
      (earlier, later) -> ((hit.size.toLong, leaked, bySplit(later),
        1000000L * leaked / bySplit(later)))
    }
    Map(
      cell("train", "val", _._1, _._2),
      cell("train", "test", _._1, _._3),
      cell("val", "test", _._2, _._3))
  }

  test("q123 splitLeakage: cross-split identity groups vs a naive md5 re-derivation") {
    val s = spark
    import s.implicits._
    // 60 docs, texts shared in groups of 3 (ids i, i+100, i+200) so
    // many groups straddle the md5 split boundary; a NULL doc and a
    // within-split duplicate ride along
    val rows = (0L until 20L).flatMap(i =>
      Seq(i, i + 100L, i + 200L).map(_ -> s"text $i")) ++
      Seq(300L -> null.asInstanceOf[String], 301L -> "text 1")
    val got = Dedup.splitLeakage(rows.toDF("doc_id", "text")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got === leakMatrixLocal(rows))
    // the fixture is leaky by construction — a vacuous matrix here
    // means the split re-derivation broke, not that the data is clean
    assert(got.values.map(_._2).sum > 0)
  }

  test("q123 driver query plants a re-crawl echo (non-vacuous at every scale)") {
    // The raw driver corpus is exact-dup-free at the gate scales
    // (the q115 lesson), so the registration re-emits every
    // doc_id % 7 == 0 doc under doc_id + 10M — an id whose md5 split is
    // independent of the original's. Pin BOTH that the driver query
    // matches the naive echo-inclusive derivation at sf0.001 AND that
    // every matrix cell is exercised (leaked_docs > 0 in all 3 rows).
    val dir = "/root/testdata/sf0.001"
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    val echoed = base ++ base.collect {
      case (id, t) if t != null && id % 7 == 0 => (id + 10000000L, t)
    }
    val got = graft.SparkEntry.queries("q123_split_leakage")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got === leakMatrixLocal(echoed))
    assert(got.size === 3 && got.values.forall(_._2 > 0))
  }

  test("q124 dupGrowth: hand-walked curve — clamp, NULL exclusion, empty checkpoints, 0-doc guard") {
    val s = spark
    import s.implicits._
    // live max_id = 10 so checkpoint k = doc_id (id 0 clamps into k=1);
    // checkpoints 2-4 and 6-9 mint nothing and still emit cumulative
    // rows via the spine. Groups: "a" first@0 (dups @1 and @10), "b"
    // first@5; the NULL doc is excluded from horizon and counts alike.
    val docs = Seq((0L, "a"), (1L, "a"), (5L, "b"), (10L, "a"),
      (11L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = Dedup.dupGrowth(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet === (1L to 10L).toSet)
    (1L to 4L).foreach(k => assert(got(k) === ((2L, 1L, 1L, 500000L)), s"k=$k"))
    (5L to 9L).foreach(k => assert(got(k) === ((3L, 2L, 1L, 333333L)), s"k=$k"))
    assert(got(10L) === ((4L, 2L, 2L, 500000L)))
    // a checkpoint BEFORE the first doc (sparse id remapping) has
    // n_docs = 0: dup_ppm must guard to 0, not fail the ANSI division
    val sparse = Seq((10L, "a")).toDF("doc_id", "text")
    val g2 = Dedup.dupGrowth(sparse).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    (1L to 9L).foreach(k => assert(g2(k) === ((0L, 0L, 0L, 0L)), s"k=$k"))
    assert(g2(10L) === ((1L, 1L, 0L, 0L)))
  }

  test("q124 driver query: interleaved re-fetch echo vs a naive derivation (non-vacuous everywhere)") {
    // evens host the corpus, odds the echoes (every doc_id % 7 == 0 doc
    // re-fetched immediately after its original), so every checkpoint's
    // dup arithmetic is exercised — the raw corpus is exact-dup-free at
    // the gate scales and a flat-zero curve would gate nothing
    val dir = "/root/testdata/sf0.001"
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .flatMap(r => Option(r.getString(1)).map(t => (r.getLong(0), t))).toSeq
    val all = base.map { case (id, t) => (id * 2, t) } ++
      base.collect { case (id, t) if id % 7 == 0 => (id * 2 + 1, t) }
    val maxId = all.map(_._1).max
    def k(id: Long) = math.max(1L, (10 * id + maxId - 1) / maxId)
    val docB = all.map(x => k(x._1)).groupBy(identity)
      .map { case (b, o) => b -> o.size.toLong }
    val grpB = all.groupBy(_._2).values.map(g => k(g.map(_._1).min))
      .groupBy(identity).map { case (b, o) => b -> o.size.toLong }
    def cum(m: Map[Long, Long], upTo: Long) =
      m.filter(_._1 <= upTo).values.sum
    val got = graft.SparkEntry.queries("q124_dup_growth")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    (1L to 10L).foreach { c =>
      val (nd, ng) = (cum(docB, c), cum(grpB, c))
      val ppm = if (nd == 0) 0L else (1000000L * (nd - ng)) / nd
      assert(got(c) === ((nd, ng, nd - ng, ppm)), s"checkpoint $c")
    }
    assert((1L to 10L).forall(c => got(c)._3 > 0))
  }

  test("q124 seeded fuzz: dupGrowth matches a naive local derivation on random corpora") {
    val s = spark
    import s.implicits._
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      // tiny vocab forces natural dup groups; sparse ids (incl. 0 and
      // gaps) exercise clamping and empty checkpoints
      val n = 30 + rnd.nextInt(40)
      val ids = rnd.shuffle((0L until 200L).toList).take(n)
      val rows = ids.map(id => (id,
        if (rnd.nextInt(10) == 0) null
        else Seq.fill(1 + rnd.nextInt(3))("w" + rnd.nextInt(6)).mkString(" ")))
      val live = rows.collect { case (id, t) if t != null => (id, t) }
      val maxId = live.map(_._1).max
      def k(id: Long) = math.max(1L, (10 * id + maxId - 1) / maxId)
      val docB = live.map(x => k(x._1)).groupBy(identity)
        .map { case (b, o) => b -> o.size.toLong }
      val grpB = live.groupBy(_._2).values.map(g => k(g.map(_._1).min))
        .groupBy(identity).map { case (b, o) => b -> o.size.toLong }
      def cum(m: Map[Long, Long], c: Long) = m.filter(_._1 <= c).values.sum
      val got = Dedup.dupGrowth(rows.toDF("doc_id", "text")).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      (1L to 10L).foreach { c =>
        val (nd, ng) = (cum(docB, c), cum(grpB, c))
        val ppm = if (nd == 0) 0L else (1000000L * (nd - ng)) / nd
        assert(got(c) === ((nd, ng, nd - ng, ppm)), s"seed $seed checkpoint $c")
      }
      // invariants: all three counters nondecreasing, dups never negative
      (2L to 10L).foreach { c =>
        assert(got(c)._1 >= got(c - 1)._1 && got(c)._2 >= got(c - 1)._2 &&
          got(c)._3 >= got(c - 1)._3, s"seed $seed monotonicity at $c")
      }
    }
  }

  test("q118: multiplicity histogram over exact-copy groups, ppm of all docs") {
    val dir = docsDir(Seq(
      1L -> "aaa", 2L -> "aaa", 3L -> "aaa", // one group at k=3
      4L -> "bbb", 5L -> "bbb",              // one group at k=2
      6L -> "ccc", 7L -> "ddd"))             // two singletons
    val r = graft.SparkEntry.queries("q118_dup_histogram")(spark, dir).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3))))
      .toMap
    assert(r === Map(
      3L -> ((1L, 3L, 428571L)), // 3/7 docs
      2L -> ((1L, 2L, 285714L)),
      1L -> ((2L, 2L, 285714L))))
  }

  test("q101 dedupSavings: keeper attribution, within/cross split, token savings") {
    val s = spark
    import s.implicits._
    val x = "x1 x2 x3 x4" // 4 tokens
    val y = "y1 y2"       // 2 tokens
    val docs = Seq(
      (1L, x, "A"),   // keeper of X (global min doc)
      (3L, x, "B"),   // B's first copy of X: removable only globally
      (5L, x, "B"),   // B's second copy: within-source catches it
      (2L, y, "B"),   // keeper of Y
      (4L, y, "A"),
      (6L, y, "A"),
      (7L, "z1", "C"),                       // unique: nothing removed
      (8L, null.asInstanceOf[String], "A"),  // null text: dropped
      (9L, x, null.asInstanceOf[String]))    // null source: dropped
      .toDF("doc_id", "text", "source")
    val r = Dedup.dedupSavings(docs).collect()
      .map(w => w.getString(0) -> ((w.getLong(1), w.getLong(2), w.getLong(3),
        w.getLong(4), w.getLong(5), w.getLong(6), w.getDouble(7)))).toMap
    assert(r === Map(
      // A: holds X's keeper (0 removed), loses both Y copies (1 within +
      // 1 cross); 4 of 8 tokens removed
      "A" -> ((3L, 2L, 1L, 1L, 8L, 4L, 0.5)),
      // B: holds Y's keeper, loses both X copies; 8 of 10 tokens removed
      "B" -> ((3L, 2L, 1L, 1L, 10L, 8L, 0.8)),
      "C" -> ((1L, 0L, 0L, 0L, 1L, 0L, 0.0))))
  }

  test("q102 jaccardCalibration: bins, best-pair doc attribution, cumulatives") {
    val s = spark
    import s.implicits._
    // kept gram space (df >= 2): abc in docs 1,2,3; bcd in 1,2. So
    // sz(1)=sz(2)=2, sz(3)=1 -> j(1,2)=2/2=1.0 (bin 20, its own top
    // bin), j(1,3)=j(2,3)=1/2=0.5 (bin 10). Doc 4 shares nothing.
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c d"), (3L, "a b c x"),
      (4L, "p q r s t"))
      .toDF("doc_id", "text")
    val r = Dedup.jaccardCalibration(docs).collect()
      .map(w => w.getLong(0) -> ((w.getDouble(1), w.getLong(2),
        w.getLong(3), w.getLong(4)))).toMap
    assert(r === Map(
      // bin 10: 2 pairs; cumulative >= 0.5 sees all 3 pairs; docs 1,2
      // peak at bin 20 and doc 3 at bin 10 -> 3 docs touched
      10L -> ((0.5, 2L, 3L, 3L)),
      20L -> ((1.0, 1L, 1L, 2L))))
  }

  test("q98 gramNovelty: first-occurrence ownership, exclusivity, null guards") {
    val s = spark
    import s.implicits._
    val x = (1 to 16).map(i => s"x$i").mkString(" ")
    val y = (1 to 16).map(i => s"y$i").mkString(" ")
    val z = (1 to 16).map(i => s"z$i").mkString(" ")
    val docs = Seq(
      (1L, x, "A"),    // X first seen in A
      (2L, y, "A"),    // Y only ever in A -> exclusive
      (3L, x, "B"),    // X again: B holds it but doesn't own it
      (4L, z, "B"),    // Z first seen in B...
      (5L, z, "C"),    // ...C re-crawls it -> owns nothing
      (6L, null.asInstanceOf[String], "A"),   // null text: dropped
      (7L, x, null.asInstanceOf[String]))     // null source: dropped
      .toDF("doc_id", "text", "source")
    val r = Dedup.gramNovelty(docs).collect()
      .map(w => w.getString(0) ->
        ((w.getLong(1), w.getLong(2), w.getLong(3), w.getDouble(4)))).toMap
    assert(r === Map(
      "A" -> ((2L, 2L, 1L, 1.0)),   // spans X,Y; owns both; Y exclusive
      "B" -> ((2L, 1L, 0L, 0.5)),   // spans X,Z; owns Z only
      "C" -> ((1L, 0L, 0L, 0.0)))) // Z arrived earlier in B
  }

  test("q130 fuzzyLeakage ≡ naive reference over the pair stream (seeded fuzz)") {
    // the marginal logic past the (already fuzz-verified) pair machinery
    // is labeling/orientation/aggregation: grade it against a plain-Scala
    // reference that labels via an INDEPENDENT md5 (MessageDigest, not
    // TextAnalysis.md5Prefix), orients train<val<test, and counts by hand
    val s = spark
    import s.implicits._
    def mdSplit(id: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val b = (java.lang.Long.parseLong(
        d.take(4).map(x => f"$x%02x").mkString, 16) % 100 + 100) % 100
      if (b < 80) "train" else if (b < 90) "val" else "test"
    }
    val rank = Map("train" -> 0, "val" -> 1, "test" -> 2)
    val rnd = new scala.util.Random(19)
    for (_ <- 0 until 3) {
      // random near-dup families: a base doc and 2-3 one-token variants,
      // ids drawn sparsely so splits vary across and within families
      val docs = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
      var nextId = 0L
      for (fam <- 0 until (4 + rnd.nextInt(4))) {
        val n = 12 + rnd.nextInt(8)
        val base = (1 to n).map(i => s"f${fam}t$i")
        for (_ <- 0 until (2 + rnd.nextInt(2))) {
          val v = base.updated(n - 1, s"v${rnd.nextInt(3)}")
          docs += ((nextId, v.mkString(" "))); nextId += 1 + rnd.nextInt(5)
        }
      }
      val df = docs.toSeq.toDF("doc_id", "text")
      val pairs = Dedup.jaccardPairs(df)
        .select(col("a"), col("b")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val crossing = pairs
        .map { case (a, b) => (a, mdSplit(a), b, mdSplit(b)) }
        .filter { case (_, sa, _, sb) => sa != sb }
        .map { case (a, sa, b, sb) =>
          if (rank(sa) < rank(sb)) (sa, sb, b) else (sb, sa, a)
        }
      val denom = docs.map { case (id, _) => mdSplit(id) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val expect = crossing.groupBy(t => (t._1, t._2)).map { case ((e, l), g) =>
        val leaked = g.map(_._3).distinct.length.toLong
        (e, l) -> ((g.length.toLong, leaked, denom(l),
          1000000L * leaked / denom(l)))
      }
      val got = Dedup.fuzzyLeakage(df).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
      assert(got === expect)
    }
  }

  test("connectedComponents equals a union-find reference on random graphs (seeded fuzz)") {
    // q45's engine graded against an independent algorithm: for random
    // pair lists, every doc must map to the MINIMUM doc_id of its
    // transitive component, with is_canonical marking exactly the minima
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 3) {
      val n = 20 + rnd.nextInt(40)
      val pairs = (0 until n).map { _ =>
        val a = rnd.nextInt(n); var b = rnd.nextInt(n)
        while (b == a) b = rnd.nextInt(n)
        (math.min(a, b).toLong, math.max(a, b).toLong)
      }.distinct
      // reference: plain union-find with path compression
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      val expect = members.map { d =>
        val root = find(d)
        val cmin = members.filter(m => find(m) == root).min
        (d, cmin, d == cmin)
      }.toSet
      val got = Dedup.connectedComponents(pairs.toDF("a", "b")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      assert(got === expect, s"trial $trial (n=$n, ${pairs.size} edges)")
    }
  }

  test("bucketPairs: output is EXACTLY the within-cap same-bucket pairs (seeded fuzz)") {
    // the one candidate generator every near-dup family rides (q31/q32/
    // q34/q36/q58/...): for random bucket assignments, the pair set must
    // equal the reference computed by brute force — every pair sharing a
    // bucket of size 2..cap present once (a < b), every pair whose only
    // shared buckets are over-cap absent. Seeded: failures reproduce.
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    var done = 0
    var draws = 0
    while (done < 3 && draws < 20) {
      draws += 1
      val cap = 2 + rnd.nextInt(6)    // 2..7, small enough to over-fill
      val nDocs = 30 + rnd.nextInt(40)
      // enough buckets that sizes straddle the cap: some within (pairs
      // expected), some over (disqualification expected)
      val nBuckets = 8 + rnd.nextInt(20)
      // each doc lands in 1..3 distinct buckets (multiple bands upstream
      // run array_distinct, so the banded frame has no duplicate rows)
      val rows = (0 until nDocs).flatMap { d =>
        (0 to rnd.nextInt(3)).map(_ => (d.toLong, rnd.nextInt(nBuckets)))
      }.distinct
      val sizes = rows.groupBy(_._2).values.map(_.size)
      // only grade draws that exercise BOTH branches: some within-cap
      // bucket (pairs must appear) and some over-cap one (must vanish)
      if (sizes.exists(sz => sz >= 2 && sz <= cap) && sizes.exists(_ > cap)) {
        done += 1
        val got = Dedup.bucketPairs(rows.toDF("doc_id", "bucket"),
            Seq("bucket"), cap)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        val expect = rows.groupBy(_._2).values.collect {
          case ds if ds.size >= 2 && ds.size <= cap =>
            val ids = ds.map(_._1).sorted
            for (i <- ids.indices; j <- i + 1 until ids.size)
              yield (ids(i), ids(j))
        }.flatten.toSet
        assert(got.toSet === expect, s"draw $draws cap=$cap")
        assert(got.size === got.distinct.size, s"draw $draws: duplicate pairs")
        assert(got.forall { case (a, b) => a < b }, s"draw $draws: unordered pair")
      }
    }
    assert(done === 3, s"generator produced only $done usable draws in $draws")
  }

  test("pairsOnce ≡ bucketPairs: same pair SET, exactly-once, payload intact (seeded fuzz)") {
    // the docstring's contract, as a differential test: for random
    // multi-band bucket assignments, pairsOnce's emitted pairs must equal
    // (1) brute force — every pair sharing some size-2..cap band bucket —
    // and (2) bucketPairs over the equivalent exploded banded frame; each
    // pair exactly ONCE even when several bands qualify it (the
    // first-surviving-matching-band rule), with both sides' payload
    // columns carrying the right per-doc values. Draws are only graded
    // when they exercise the interesting branches: an over-cap bucket, a
    // size-1 bucket, and at least one pair qualified by >= 2 bands.
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(4242)
    var done = 0
    var draws = 0
    while (done < 3 && draws < 30) {
      draws += 1
      val nb = 1 + rnd.nextInt(4)        // 1..4 bands (1 = no once-filter)
      val cap = 2 + rnd.nextInt(4)       // 2..5
      val nDocs = 25 + rnd.nextInt(30)
      val nBuckets = 4 + rnd.nextInt(8)  // few buckets -> collisions + over-cap
      // rows: (doc_id, payload, k0..k{nb-1})
      val rows = (0 until nDocs).map { d =>
        (d.toLong, rnd.nextLong(), (0 until nb).map(_ => rnd.nextInt(nBuckets)))
      }
      // brute-force reference: per band, buckets of size 2..cap emit all pairs
      val perBand = (0 until nb).map { b =>
        rows.groupBy(_._3(b)).values.collect {
          case ds if ds.size >= 2 && ds.size <= cap =>
            val ids = ds.map(_._1).sorted
            for (i <- ids.indices; j <- i + 1 until ids.size)
              yield (ids(i), ids(j))
        }.flatten.toSet
      }
      val expect = perBand.reduce(_ ++ _)
      val bandSizes = (0 until nb).flatMap(b => rows.groupBy(_._3(b)).values.map(_.size))
      val multiBand = nb >= 2 && perBand.combinations(2).exists(p => (p(0) & p(1)).nonEmpty)
      if (expect.nonEmpty && bandSizes.exists(_ > cap) && bandSizes.contains(1) &&
          (nb == 1 || multiBand)) {
        done += 1
        val perDoc = rows.map { case (d, p, ks) =>
          (d, p, ks.lift(0).getOrElse(0), ks.lift(1).getOrElse(0),
            ks.lift(2).getOrElse(0), ks.lift(3).getOrElse(0))
        }.toDF("doc_id", "p", "k0", "k1", "k2", "k3")
        val bandKeys = (0 until nb).map(i => col(s"k$i"))
        val got = Dedup.pairsOnce(perDoc, "doc_id", bandKeys, cap, payload = Seq("p"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
        val gotPairs = got.map(r => (r._1, r._2))
        assert(gotPairs.toSet === expect, s"draw $draws nb=$nb cap=$cap: wrong pair set")
        assert(gotPairs.size === gotPairs.distinct.size,
          s"draw $draws nb=$nb cap=$cap: a pair emitted more than once")
        val payloadOf = rows.map(r => r._1 -> r._2).toMap
        got.foreach { case (a, b, pa, pb) =>
          assert(a < b, s"draw $draws: unordered pair ($a,$b)")
          assert(pa === payloadOf(a) && pb === payloadOf(b),
            s"draw $draws: payload mismatch on ($a,$b)")
        }
        // the docstring's set-identity claim vs bucketPairs itself
        val banded = rows.flatMap { case (d, _, ks) =>
          ks.zipWithIndex.map { case (k, b) => (d, b, k) }
        }.toDF("doc_id", "band", "bucket")
        val bp = Dedup.bucketPairs(banded, Seq("band", "bucket"), cap)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(gotPairs.toSet === bp, s"draw $draws nb=$nb cap=$cap: diverges from bucketPairs")
      }
    }
    assert(done === 3, s"generator produced only $done usable draws in $draws")
  }

  test("q134: containment flags the fragment pair the jaccard screen misses") {
    import spark.implicits._
    // doc 1 = 20 distinct tokens; doc 2 = exact copy (keeps doc 1's 18
    // grams alive at df 2 — in the kept-gram space sz1 = sz2 = 18);
    // doc 3 = doc 1's LAST 8 tokens (6 grams, all shared, df 3)
    val full = (1 to 20).map(i => s"t$i").mkString(" ")
    val frag = (13 to 20).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, full), (2L, full), (3L, frag)).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    // (1,3)/(2,3): inter 6, min(18,6)=6 → contain 1.0; jaccard =
    // 6/(18+6−6) = 1/3 → floored 333333 ppm — under the 0.8 screen
    assert(got === Map(
      (1L, 2L) -> ((1000000L, 1000000L)),
      (1L, 3L) -> ((1000000L, 333333L)),
      (2L, 3L) -> ((1000000L, 333333L))))
    val jac = Dedup.jaccardPairs(df).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jac === Set((1L, 2L)),
      "the jaccard screen should NOT see the fragment pair")
  }

  test("q134: threshold filters on containment, not jaccard") {
    import spark.implicits._
    // two docs overlapping in 3 of each's 4 kept grams (third doc keeps
    // all grams alive): contain = 750000 < 900000 → no pair emitted
    val a = "s1 s2 s3 s4 s5 x1"  // grams: s1s2s3 s2s3s4 s3s4s5 s4s5x1
    val b = "s1 s2 s3 s4 s5 y1"
    val c = a + " " + b          // keeps every gram of both at df ≥ 2
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(df).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // (1,2) stays below the containment bar; (1,3)/(2,3) are genuine
    // full-containment pairs (every kept gram of 1 and of 2 is in 3)
    assert(!got.contains((1L, 2L)), got.toString)
    assert(got.contains((1L, 3L)) && got.contains((2L, 3L)), got.toString)
  }

  test("q139: span digit buckets on hand-planted groups; NULLs and singletons drop") {
    import spark.implicits._
    val docs = Seq(
      (10L, "alpha text one"), (13L, "alpha text one"),     // span 3 → 1 digit
      (20L, "beta text two"), (1020L, "beta text two"),     // span 1000 → 4 digits
      (30L, "gamma singleton"),                             // no group
      (40L, null.asInstanceOf[String]),                     // NULL pair must
      (41L, null.asInstanceOf[String]))                     // NOT form a group
      .toDF("doc_id", "text")
    val got = Dedup.dupSpread(docs).collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map(
      1 -> ((1L, 2L, 3L, 3L)),
      4 -> ((1L, 2L, 1000L, 1000L))))
  }

  test("q141: df spectrum buckets by digit count on hand-built gram dfs") {
    import spark.implicits._
    // 12 copies of one 3-token text → its single gram has df 12
    // (2 digits); one distinct doc contributes one df-1 gram (1 digit)
    val docs = ((1 to 12).map(i => (i.toLong, "x y z")) :+
      (100L, "a b c")).toDF("doc_id", "text")
    val got = Dedup.gramDfSpectrum(docs).collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map(
      1 -> ((1L, 1L, 1L, 1L)),      // "a b c": 1 gram, df 1
      2 -> ((1L, 12L, 12L, 12L))))  // "x y z": 1 gram, df 12
  }

  test("q142: per-source incidence counts flagged docs once; zero sources emit 0") {
    import spark.implicits._
    val dup = (1 to 12).map(i => s"d$i").mkString(" ")
    val docs = Seq(
      (1L, "A", dup), (2L, "B", dup),              // the one near-dup pair
      (3L, "A", (1 to 9).map(i => s"u$i").mkString(" ")), // unique
      (4L, "A", null.asInstanceOf[String]),        // not in the universe
      (5L, "C", (1 to 9).map(i => s"w$i").mkString(" "))) // untouched source
      .toDF("doc_id", "source", "text")
    val got = Dedup.neardupBySource(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      "A" -> ((2L, 1L, 500000L)),
      "B" -> ((1L, 1L, 1000000L)),
      "C" -> ((1L, 0L, 0L))))
  }
}
