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
