package graft.ops

import scala.util.Random

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

class BpeSpec extends SparkSpec {

  private def corpus(words: Seq[String]): DataFrame = {
    import spark.implicits._
    // one doc per word instance keeps the freq table honest
    words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
  }

  /** Independent naive reference: same tie rules, written over a plain
    * freq map with sliding/groupMapReduce instead of the mutable loop.
    * Splits per CODEPOINT (via codePoints), like production — a UTF-16
    * char split would bar astral-plane chars from the differential.
    */
  private def refLearn(wordFreq: Map[String, Long],
      numMerges: Int): Vector[(String, String)] = {
    var table = wordFreq.toVector.map { case (w, c) =>
      val cps = w.codePoints().toArray.toVector
        .map(cp => new String(Character.toChars(cp)))
      (cps :+ Bpe.Eow, c)
    }
    var out = Vector.empty[(String, String)]
    var stop = false
    while (out.length < numMerges && !stop) {
      val counts = table
        .flatMap { case (sym, c) =>
          sym.sliding(2).collect { case Vector(a, b) => ((a, b), c) } }
        .groupMapReduce(_._1)(_._2)(_ + _)
      val best = counts.toVector.sortBy { case ((a, b), c) => (-c, a, b) }.headOption
      best match {
        case Some(((l, r), c)) if c >= 2 =>
          out :+= ((l, r))
          table = table.map { case (sym, c0) =>
            val merged = Vector.newBuilder[String]
            var i = 0
            while (i < sym.length) {
              if (i + 1 < sym.length && sym(i) == l && sym(i + 1) == r) {
                merged += (l + r); i += 2
              } else { merged += sym(i); i += 1 }
            }
            (merged.result(), c0)
          }
        case _ => stop = true
      }
    }
    out
  }

  test("Sennrich classic: first merge is the (e,s) suffix pair") {
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val model = Bpe.learn(corpus(words), numMerges = 10)
    assert(model.merges.head.left === "e")
    assert(model.merges.head.right === "s")
    // "es" then merges with t: (es, t) count 9 still the max
    assert(model.merges(1).left === "es")
    assert(model.merges(1).right === "t")
    // with 10 merges this tiny vocab merges all the way to whole words
    assert(model.segmentations("newest") === Vector("newest" + Bpe.Eow))
    // stopping after the first two merges leaves the est suffix visible
    val two = Bpe.learn(corpus(words), numMerges = 2)
    assert(two.segmentations("newest").contains("est"))
  }

  test("q94/q105 independence: FULL hand-derived merge table, greedy inference, counts, fertility") {
    // The r16 verdict's same-author-oracle item: q94/q105's gate oracle
    // is a fixture derived by deriveQ94/deriveQ105 — code by the same
    // author as the pipeline. This test is the independent half (the
    // ProtoWire hand-bytes precedent): the ENTIRE 15-merge table for the
    // Sennrich classic corpus, worked out by hand on paper with this
    // implementation's two tie rules (merge tie → (count desc, pair
    // asc); greedy encode → lowest rank first), plus hand-segmented
    // UNSEEN words through both encodeWord and the distributed
    // encodeCounts path, plus the q105 rollup arithmetic.
    //
    // Corpus: low x5, lower x2, newest x6, widest x3. Hand derivation
    // (pair counts recomputed after every merge):
    //   r0  (e,s)      9  ties (s,t),(t,</w>) at 9 — "e" sorts first
    //   r1  (es,t)     9  tie (t,</w>) — "es" < "t"
    //   r2  (est,</w>) 9
    //   r3  (l,o)      7  tie (o,w) — "l" < "o"
    //   r4  (lo,w)     7
    //   r5  (e,w)      6  ties (n,e),(w,est</w>) — "e" first
    //   r6  (ew,est</w>) 6  tie (n,ew) — "ew" < "n"
    //   r7  (n,ewest</w>) 6
    //   r8  (low,</w>) 5
    //   r9  (d,est</w>) 3  ties (i,d),(w,i) — "d" first
    //   r10 (i,dest</w>) 3  tie (w,i) — "i" < "w"
    //   r11 (w,idest</w>) 3
    //   r12 (e,r)      2  ties (low,e),(r,</w>) — "e" first
    //   r13 (er,</w>)  2  tie (low,er) — "er" < "low"
    //   r14 (low,er</w>) 2
    //   then every word is one symbol -> no pair reaches 2 -> stop.
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val model = Bpe.learn(corpus(words), numMerges = 200)
    val w = Bpe.Eow
    assert(model.merges.map(m => (m.left, m.right)) === Vector(
      ("e", "s"), ("es", "t"), ("est", w), ("l", "o"), ("lo", "w"),
      ("e", "w"), ("ew", "est" + w), ("n", "ewest" + w), ("low", w),
      ("d", "est" + w), ("i", "dest" + w), ("w", "idest" + w),
      ("e", "r"), ("er", w), ("low", "er" + w)))
    // greedy lowest-rank-first on UNSEEN words, hand-walked:
    //   lowest: es(0)→est(1)→est</w>(2)→lo(3)→low(4) → [low, est</w>]
    //   newer:  ew(5)→er(12)→er</w>(13)              → [n, ew, er</w>]
    //   wider:  er(12)→er</w>(13)                    → [w, i, d, er</w>]
    assert(Bpe.encodeWord("lowest", model) === Vector("low", "est" + w))
    assert(Bpe.encodeWord("newer", model) === Vector("n", "ew", "er" + w))
    assert(Bpe.encodeWord("wider", model) === Vector("w", "i", "d", "er" + w))
    // the distributed inference path (broadcast ranks, partition cache)
    // against the same hand counts: 2 + 3 + 4 + 1(training "low") = 10
    import spark.implicits._
    val unseen = Seq((42L, "lowest newer wider low")).toDF("doc_id", "text")
    val counts = Bpe.encodeCounts(spark, unseen, model).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(counts.toSeq === Seq((42L, 4L, 10L)))
    // q105's rollup arithmetic on the training corpus: every word
    // segments to ONE token (hand table above merges each to a whole
    // word), so per-lang sums must satisfy n_bpe_tokens == n_words and
    // fertility == 1.0 exactly, with totals 16/16 over 16 docs
    val fert = Bpe.fertility(spark, corpus(words), model).collect()
    assert(fert.map(_.getLong(1)).sum === 16L)   // n_docs
    assert(fert.map(_.getLong(2)).sum === 16L)   // n_words
    assert(fert.map(_.getLong(3)).sum === 16L)   // n_bpe_tokens
    fert.foreach(r => assert(r.getDouble(4) === 1.0,
      s"fertility must be exactly 1.0 for whole-word segmentations: $r"))
  }

  test("differential: Spark learn == naive reference on random corpora") {
    val rnd = new Random(17)
    (0 until 15).foreach { round =>
      // alphabet includes an astral-plane char so the differential
      // exercises the codepoint-splitting path too
      val alphabet = Vector("a", "b", "c", "d", "😀")
      val vocab = Seq.fill(12)(
        (0 until rnd.nextInt(5) + 2).map(_ => alphabet(rnd.nextInt(alphabet.length)))
          .mkString)
      val words = Seq.fill(60)(vocab(rnd.nextInt(vocab.length)))
      val freq = words.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
      val got = Bpe.learn(corpus(words), numMerges = 12).merges
        .map(m => (m.left, m.right))
      val want = refLearn(freq, 12)
      assert(got === want, s"round $round vocab=$vocab")
    }
  }

  test("encodeWord reproduces every training segmentation") {
    val rnd = new Random(23)
    val vocab = Seq.fill(20)(
      (0 until rnd.nextInt(6) + 2).map(_ => ('a' + rnd.nextInt(5)).toChar)
        .mkString)
    val words = Seq.fill(100)(vocab(rnd.nextInt(vocab.length)))
    val model = Bpe.learn(corpus(words), numMerges = 30)
    model.segmentations.foreach { case (w, seg) =>
      assert(Bpe.encodeWord(w, model) === seg, s"word $w")
    }
  }

  test("encodeCounts: per-doc counts equal summed encodeWord lengths") {
    import spark.implicits._
    val words = Seq.fill(8)("loop") ++ Seq.fill(4)("pool") ++ Seq("solo")
    val model = Bpe.learn(corpus(words), numMerges = 5)
    val docs = Seq(
      (1L, "loop pool loop"),
      (2L, "solo"),
      (3L, "  loop   solo  "), // whitespace soup
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Bpe.encodeCounts(spark, docs, model).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    def n(w: String) = Bpe.encodeWord(w, model).length.toLong
    assert(got.toSeq === Seq(
      (1L, 3L, n("loop") * 2 + n("pool")),
      (2L, 1L, n("solo")),
      (3L, 2L, n("loop") + n("solo"))))
  }

  test("no pair reaches count 2 -> zero merges; unicode words split by codepoint") {
    val model = Bpe.learn(corpus(Seq("ab", "cd", "ef")), numMerges = 10)
    assert(model.merges.isEmpty)
    val uni = Bpe.learn(corpus(Seq.fill(3)("😀x")), numMerges = 2)
    // ties break lexicographically: (x, </w>) < (😀, x); the second merge
    // then uses the astral smiley as ONE whole symbol — codepoint split,
    // never a lone surrogate half
    assert(uni.merges.map(m => (m.left, m.right)) ===
      Vector(("x", Bpe.Eow), ("😀", "x" + Bpe.Eow)))
  }

  test("q78 driver query: deterministic non-empty merge table with contiguous ranks") {
    val a = graft.SparkEntry.queries("q78_bpe_merges")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val b = graft.SparkEntry.queries("q78_bpe_merges")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(a.toSeq === b.toSeq)
    assert(a.length > 50, s"only ${a.length} merges learned")
    assert(a.map(_._1).sorted.toSeq === (0L until a.length).toSeq)
  }

  test("encodeWord is lossless for ANY word under ANY learned model (seeded fuzz)") {
    // merging only ever concatenates adjacent symbols, so the token
    // concatenation must equal the unmerged symbol concatenation for
    // every word — including words with characters the model never saw,
    // multi-byte code points, and words longer than anything trained on
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdeé日本ß"
    def word(n: Int) =
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val trainWords = (0 until 30).map(_ => word(1 + rnd.nextInt(8)))
    val model = Bpe.learn(
      Seq((0L, trainWords.mkString(" "))).toDF("doc_id", "text"),
      numMerges = 40)
    val noMerges = model.copy(merges = Vector.empty)
    for (_ <- 0 until 200) {
      val w = word(1 + rnd.nextInt(14))
      val tokens = Bpe.encodeWord(w, model)
      assert(tokens.mkString === Bpe.encodeWord(w, noMerges).mkString,
        s"characters lost/invented encoding '$w': $tokens")
      assert(tokens.nonEmpty)
    }
  }
}
