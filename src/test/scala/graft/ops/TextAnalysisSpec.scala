package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {

  test("q37 lang id: stopword-heavy docs classified per language") {
    val dir = docsDir(Seq(
      (1L, "the cat sat of the mat and a dog is that"),
      (2L, "le chat et la porte de les maisons des un une"),
      (3L, "el gato y la puerta de los perros las un una"),
      (4L, "der hund und die katze das haus ein eine zu mit")))
    val rows = TextAnalysis.queries("q37_lang_id")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(rows(1L) === "en")
    assert(rows(2L) === "fr")
    assert(rows(3L) === "es")
    assert(rows(4L) === "de")
  }

  test("q40 fingerprint: matches the rolling-hash formula, whitespace-noise robust") {
    val text = "hello world foo"
    def h(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.take(4).map(b => f"${b & 0xff}%02x").mkString, 16)
    }
    val p = 2147483647L
    val expected = text.split("\\s+").foldLeft(7L)((acc, w) =>
      java.lang.Math.floorMod(acc * 31L + h(w), p))

    val dir = docsDir(Seq((1L, text), (2L, "hello   world\tfoo")))
    val rows = TextAnalysis.queries("q40_doc_fingerprint")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows(1L) === expected)
    assert(rows(2L) === expected) // whitespace runs collapse identically
  }

  test("latencyPctlApprox (cluster variant of q06) brackets the exact percentiles") {
    val sf = "/root/testdata/sf0.001"
    val exact = Relational.queries("q06_latency_pctl")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = Relational.latencyPctlApprox(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet === exact.keySet)
    for ((k, (p50, p95)) <- exact) {
      // high-accuracy sketch: within 5% relative of the exact values
      assert(math.abs(approx(k)._1 - p50) <= math.abs(p50) * 0.05 + 1e-9, k)
      assert(math.abs(approx(k)._2 - p95) <= math.abs(p95) * 0.05 + 1e-9, k)
    }
  }

  test("q44 repetition: planted repetitive doc scores high, diverse doc zero") {
    val dir = docsDir(Seq(
      (1L, "spam spam spam spam spam spam"),   // 4 grams, 1 distinct
      (2L, "all these tokens differ fully"),   // 3 grams, all distinct
      (3L, "x")))                               // no grams
    val rows = TextAnalysis.queries("q44_repetition")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(rows(1L)._1 === 4L)
    assert(rows(1L)._2 === 1L)
    assert(rows(1L)._3 === 0.75)      // 1 - 1/4
    assert(rows(1L)._4 === 1.0)       // one token dominates completely
    assert(rows(2L)._3 === 0.0)
    assert(rows(2L)._4 === 0.2)       // 1/5
    assert(rows(3L)._1 === 0L)
    assert(rows(3L)._3 === 0.0)       // guarded division
  }

  test("q82 compressionRatio: repetition compresses, noise doesn't, determinism holds") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val noise = (0 until 2000).map(_ => (33 + rnd.nextInt(90)).toChar).mkString
    val docs = Seq(
      (1L, "spam " * 400),           // heavy repetition
      (2L, noise),                    // incompressible printable noise
      (3L, ""),                       // empty: ratio pinned to 1.0
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TextAnalysis.compressionRatio(spark, docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.size === 3) // NULL excluded
    val (spamBytes, spamDef, spamRatio) = got(1L)
    val (_, _, noiseRatio) = got(2L)
    assert(spamBytes === 2000L)
    assert(spamRatio < 0.05, s"repetitive ratio $spamRatio")
    assert(noiseRatio > 0.8, s"noise ratio $noiseRatio")
    assert(got(3L) === ((0L, 2L, 1.0))) // empty still pays the 2-byte terminator
    assert(spamDef > 0L)
    // deterministic across runs (same zlib level, same JVM)
    val again = TextAnalysis.compressionRatio(spark, docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(again(1L) === spamRatio && again(2L) === noiseRatio)
  }

  test("wordsLocal is the exact JVM twin of the shared words expression") {
    import spark.implicits._
    // whitespace soups: ASCII whitespace, non-\s control chars (SQL trim
    // keeps them, Java trim would strip them at the edges — the drift
    // wordsLocal exists to prevent), NBSP (not \s), and letters
    val alphabet = Array('a', 'b', ' ', '\t', '\n', '\r', '\f',
      '\u000b', '\u0001', '\u00a0')
    val rnd = new scala.util.Random(4242)
    val soups = Seq.tabulate(300) { _ =>
      val n = rnd.nextInt(24)
      String.valueOf(Array.fill(n)(alphabet(rnd.nextInt(alphabet.length))))
    }
    val sparkSide = soups.toDF("text")
      .select(filter(TextAnalysis.words, _ =!= "").as("w"))
      .collect().map(_.getSeq[String](0))
    soups.lazyZip(sparkSide).foreach { (text, expect) =>
      assert(TextAnalysis.wordsLocal(text).toSeq === expect,
        s"drift on ${text.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }

  test("q114: per-language rollup uses exact sums; ratios in integer ppm/milli") {
    val dir = docsDir(Seq(
      1L -> "the a of and x",   // en: 5 words, 5 uniq
      2L -> "der die das und",  // de: 4 words, 4 uniq
      3L -> "the the the a"))   // en: 4 words, 2 uniq
    val r = TextAnalysis.queries("q114_lang_quality")(spark, dir).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getLong(5)))).toMap
    assert(r === Map(
      "en" -> ((2L, 9L, 7L, 777778L, 4500L)), // round(7e6/9), round(9000/2)
      "de" -> ((1L, 4L, 4L, 1000000L, 4000L))))
  }

  test("q38/q39: counts on a fixed doc") {
    val dir = docsDir(Seq((1L, "aa bb aa cc1 !")))
    val q38 = TextAnalysis.queries("q38_quality_score")(spark, dir).collect()(0)
    assert(q38.getLong(1) === 5L) // n_words
    assert(q38.getLong(2) === 4L) // n_uniq
    val q39 = TextAnalysis.queries("q39_token_count")(spark, dir).collect()(0)
    assert(q39.getLong(1) === 5L) // ws_tokens
    assert(q39.getLong(2) === 4L) // alpha runs: aa bb aa cc
    assert(q39.getLong(3) === 6L) // aa bb aa cc 1 !
  }
}
