package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LmSpec extends SparkSpec {

  test("hand-computed add-one bigram probabilities") {
    val s = spark
    import s.implicits._
    // train: tokens a,b,a,b → c1(a)=2, c1(b)=2, V=2; c2("a b")=2, c2("b a")=1
    val train = Seq((0L, "a b a b")).toDF("doc_id", "text")
    val (uni, bi, v) = Lm.bigramModel(train)
    assert(v === 2L)
    val docs = Seq(
      (1L, "a b"), // ln((2+1)/(2+2)) = ln(0.75)
      (2L, "z z"), // unseen: ln((0+1)/(0+2)) = ln(0.5)
      (3L, "solo"), // one token: excluded
      (4L, null.asInstanceOf[String])) // NULL text: excluded
      .toDF("doc_id", "text")
    val out = Lm.score(docs, uni, bi, v).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet === Set(1L, 2L))
    assert(out(1L)._1 === 1L)
    assert(math.abs(out(1L)._2 - math.log(0.75)) < 1e-12)
    assert(math.abs(out(2L)._2 - math.log(0.5)) < 1e-12)
  }

  test("reference-like text outscores scrambled and out-of-domain text") {
    val s = spark
    import s.implicits._
    val fluent = "the cat sat on the mat while the dog slept by the door"
    val train = Seq((0L, fluent), (1L, "the cat ran to the door and the dog sat"))
      .toDF("doc_id", "text")
    val (uni, bi, v) = Lm.bigramModel(train)
    val docs = Seq(
      (10L, "the cat sat by the door"),             // in-domain bigrams
      (20L, "door the by sat cat the"),             // same words, scrambled
      (30L, "quantum flux capacitors embiggen phase harmonics"))
      .toDF("doc_id", "text")
    val out = Lm.score(docs, uni, bi, v).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // in-domain text beats both. (Scrambled vs out-of-domain has no
    // guaranteed order under add-one smoothing: an unseen continuation of
    // a FREQUENT history, ln(1/(c1+V)), is penalized harder than a fully
    // unknown history's ln(1/V) — correct model behavior.)
    assert(out(10L) > out(20L), s"in-domain ${out(10L)} !> scrambled ${out(20L)}")
    assert(out(10L) > out(30L), s"in-domain ${out(10L)} !> out-of-domain ${out(30L)}")
  }

  test("differential fuzz: scores match an independent plain-Scala reference") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(0x5EED)
    val vocab = Vector("a", "b", "c", "dd", "eee", "", "x1", "y2")
    def doc(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val trainRows = (0 until 20).map(i => (i.toLong, doc(3 + rnd.nextInt(15))))
    val docRows = (100 until 160).map(i => (i.toLong, doc(rnd.nextInt(12))))
    val (uni, bi, v) = Lm.bigramModel(trainRows.toDF("doc_id", "text"))
    val got = Lm.score(docRows.toDF("doc_id", "text"), uni, bi, v).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // independent reference: plain Scala maps over the same tokenizer rule
    def toks(t: String) = t.trim.split("\\s+").toSeq
    val c1 = trainRows.flatMap(r => toks(r._2)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val c2 = trainRows.flatMap(r => toks(r._2).sliding(2).filter(_.size == 2))
      .map(_.mkString(" ")).groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(v === c1.size.toLong)
    docRows.foreach { case (id, text) =>
      val t = toks(text)
      if (t.size < 2) assert(!got.contains(id), s"doc $id should be excluded")
      else {
        val lps = t.sliding(2).map { p =>
          math.log((c2.getOrElse(p.mkString(" "), 0L) + 1.0) /
            (c1.getOrElse(p.head, 0L) + v.toDouble))
        }.toSeq
        val (n, score) = got(id)
        assert(n === lps.size.toLong, s"doc $id bigram count")
        assert(math.abs(score - lps.sum / lps.size) < 1e-9,
          s"doc $id score $score vs ${lps.sum / lps.size}")
      }
    }
  }

  test("q63 driver query: every multi-token doc scored, reference slice included") {
    val dir = docsDir(Seq(
      (10L, "alpha beta gamma delta"), // reference slice (doc_id % 10 == 0)
      (11L, "alpha beta gamma"),
      (12L, "single"),
      (13L, "epsilon zeta eta theta iota")))
    val out = graft.SparkEntry.queries("q63_lm_score")(spark, dir)
    val rows = out.orderBy("doc_id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(10L, 11L, 13L)) // 12 has no bigram
    val scores = rows.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // docs 10 and 11 tie by construction (every bigram of both has
    // c2=1, c1=1 → ln(2/5) each); in-vocab beats out-of-vocab
    assert(math.abs(scores(10L) - scores(11L)) < 1e-12)
    assert(scores(11L) > scores(13L))
  }
}
