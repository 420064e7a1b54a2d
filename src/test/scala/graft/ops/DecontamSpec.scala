package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DecontamSpec extends SparkSpec {

  private val benchText =
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"

  test("doc sharing an 8-token span with the benchmark is flagged; unrelated is not") {
    val s = spark
    import s.implicits._
    val bench = Seq((20L, benchText)).toDF("doc_id", "text")
    val train = Seq(
      // shares tokens 2..9 of the benchmark verbatim (one 8-gram, shifted context)
      (21L, "zulu bravo charlie delta echo foxtrot golf hotel india yankee"),
      // same vocabulary, different order — no shared 8-gram
      (22L, "lima kilo juliet india hotel golf foxtrot echo delta charlie bravo alpha"),
      (23L, "totally unrelated words about nothing at all in particular here now")
    ).toDF("doc_id", "text")
    val out = Decontam.contaminated(train, bench)
      .orderBy("doc_id").as[(Long, Long)].collect()
    assert(out.toSeq == Seq((21L, 1L)))
  }

  test("n_shared counts each distinct shared gram once") {
    val s = spark
    import s.implicits._
    val bench = Seq((0L, benchText)).toDF("doc_id", "text")
    // full copy of a 12-token benchmark doc => 12-8+1 = 5 shared 8-grams
    val train = Seq((1L, benchText)).toDF("doc_id", "text")
    val out = Decontam.contaminated(train, bench).as[(Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 5L)))
  }

  test("decontaminate drops exactly the contaminated docs, keeps the rest intact") {
    val s = spark
    import s.implicits._
    val bench = Seq((20L, benchText)).toDF("doc_id", "text")
    val train = Seq(
      // contaminated: shares an 8-gram with the benchmark
      (21L, "zulu bravo charlie delta echo foxtrot golf hotel india yankee"),
      (22L, "lima kilo juliet india hotel golf foxtrot echo delta charlie bravo alpha"),
      (23L, "totally unrelated words about nothing at all in particular here now")
    ).toDF("doc_id", "text")
    val kept = Decontam.decontaminate(train, bench)
    assert(kept.columns.toSeq == Seq("doc_id", "text")) // full rows survive, not a projection
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(22L, 23L))
  }

  test("q126 leakGrowth: hand-walked cumulative curve — leak entry points, 0-doc guard") {
    val s = spark
    import s.implicits._
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val leaky = "zulu bravo charlie delta echo foxtrot golf hotel india yankee"
    val clean = "totally unrelated words about nothing at all in particular here now"
    // train max_id = 10 → checkpoint k = doc_id; leaks enter at 3 and 7
    val train = (1L to 10L)
      .map(i => (i, if (i == 3 || i == 7) leaky else clean))
      .toDF("doc_id", "text")
    val got = Decontam.leakGrowth(train, bench).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    (1L to 10L).foreach { k =>
      val leaked = (if (k >= 3) 1L else 0L) + (if (k >= 7) 1L else 0L)
      assert(got(k) === ((k, leaked, 1000000L * leaked / k)), s"k=$k")
    }
    // a checkpoint before the first train doc (sparse id remapping)
    // guards leaked_ppm to 0 instead of failing the ANSI division
    val sparse = Decontam
      .leakGrowth(Seq((10L, leaky)).toDF("doc_id", "text"), bench)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    (1L to 9L).foreach(k => assert(sparse(k) === ((0L, 0L, 0L)), s"k=$k"))
    assert(sparse(10L) === ((1L, 1L, 1000000L)))
  }

  test("q126 driver query: curve matches the q49 screen folded locally (non-vacuous)") {
    // the screen itself is q49's (independently DuckDB-oracled); what
    // q126 adds — checkpoint assignment + cumulative fold — is
    // re-derived here from q49's output and the raw train ids
    val dir = "/root/testdata/sf0.001"
    val contam = graft.SparkEntry.queries("q49_decontam")(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val train = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).filter(_ % 20 != 0)
    val maxId = train.max
    def k(id: Long) = math.max(1L, (10 * id + maxId - 1) / maxId)
    val got = graft.SparkEntry.queries("q126_leak_growth")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    (1L to 10L).foreach { c =>
      val nd = train.count(k(_) <= c).toLong
      val nl = contam.count(k(_) <= c).toLong
      val ppm = if (nd == 0) 0L else 1000000L * nl / nd
      assert(got(c) === ((nd, nl, ppm)), s"checkpoint $c")
    }
    assert(got(10L)._2 > 0) // the corpus leaks at gate scales — non-vacuous
  }

  test("q126 seeded fuzz: leakGrowth matches a naive 8-gram screen + local fold") {
    val s = spark
    import s.implicits._
    def grams(t: String): Set[Seq[String]] = {
      val w = t.trim.split("\\s+").toSeq
      if (w.length < 8) Set.empty else w.sliding(8).toSet
    }
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(100 + seed)
      // docs built from a tiny vocab with long texts so 8-gram overlaps
      // occur naturally; sparse ids exercise clamping/empty checkpoints
      def text() =
        Seq.fill(6 + rnd.nextInt(8))("t" + rnd.nextInt(4)).mkString(" ")
      val trainRows = rnd.shuffle((0L until 150L).toList)
        .take(25 + rnd.nextInt(25)).map(id => (id, text()))
      val benchRows = (1000L until 1000L + 3 + rnd.nextInt(3))
        .map(id => (id, text()))
      val benchG = benchRows.flatMap(r => grams(r._2)).toSet
      val contam = trainRows.collect {
        case (id, t) if grams(t).exists(benchG) => id
      }.toSet
      val maxId = trainRows.map(_._1).max
      def k(id: Long) = math.max(1L, (10 * id + maxId - 1) / maxId)
      val got = Decontam.leakGrowth(trainRows.toDF("doc_id", "text"),
        benchRows.toDF("doc_id", "text")).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      (1L to 10L).foreach { c =>
        val nd = trainRows.count(x => k(x._1) <= c).toLong
        val nl = contam.count(k(_) <= c).toLong
        val ppm = if (nd == 0) 0L else 1000000L * nl / nd
        assert(got(c) === ((nd, nl, ppm)), s"seed $seed checkpoint $c")
      }
    }
  }

  test("q68 bloom path emits exactly q49's rows, even with a tiny saturated bloom") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(3)
    def sentence(i: Int) =
      (0 until 20).map(_ => s"w${rnd.nextInt(40)}").mkString(" ")
    val bench = (0 until 10).map(i => (i.toLong, sentence(i))).toDF("doc_id", "text")
    val train = ((100 until 160).map(i => (i.toLong, sentence(i))) ++
      Seq((200L, benchText), (201L, "zulu " + benchText))).toDF("doc_id", "text")
    val benchPlus = bench.union(Seq((20L, benchText)).toDF("doc_id", "text"))
    val exact = Decontam.contaminated(train, benchPlus)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val viaBloom = Decontam.bloomContaminated(train, benchPlus)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(viaBloom === exact)
    // 64-bit bloom is fully saturated (every probe true → prescreen passes
    // everything): the exact confirm join still kills ALL false positives
    val saturated = Decontam.bloomContaminated(train, benchPlus, numBits = 64)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(saturated === exact)
  }

  test("q104 leakProfile: per-bench-item breadth, distinct counts, clean items absent") {
    val s = spark
    import s.implicits._
    val s1 = "a1 a2 a3 a4 a5 a6 a7 a8"  // span 1 (exactly one 8-gram)
    val s2 = "b1 b2 b3 b4 b5 b6 b7 b8"  // span 2
    val bench = Seq(
      (20L, s"$s1 $s2"),  // leaks via both spans
      (40L, "c1 c2 c3 c4 c5 c6 c7 c8")) // clean: nothing shares it
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, s1),             // shares S1
      (2L, s"$s1 extra"),   // shares S1 (its second gram is unique)
      (3L, s2))             // shares S2
      .toDF("doc_id", "text")
    val r = Decontam.leakProfile(train, bench).collect()
      .map(w => w.getLong(0) -> ((w.getLong(1), w.getLong(2)))).toMap
    // item 20: 3 distinct train docs, 2 distinct shared grams; item 40 absent
    assert(r === Map(20L -> ((3L, 2L))))
  }

  test("q108: each width admits exactly the spans long enough to match") {
    val b = (1 to 16).map(i => s"b$i").mkString(" ") // bench doc: b1..b16
    val dir = docsDir(Seq(
      20L -> b,                                            // the bench slice
      1L -> ((1 to 8).map(i => s"b$i").mkString(" ") + " x1 x2"), // 8-token overlap
      2L -> (1 to 12).map(i => s"b$i").mkString(" "),      // 12-token overlap
      3L -> b,                                             // full 16-token copy
      4L -> (1 to 8).map(i => s"z$i").mkString(" ")))      // clean
    val r = graft.SparkEntry.queries("q108_width_sweep")(spark, dir).collect()
      .map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    // w=8: docs 1,2,3 leak; the union of shared 8-grams is all 9 bench
    // 8-grams (doc 3 alone contributes all of them). w=12: docs 2,3 / 5
    // grams. w=16: doc 3 / 1 gram. 4 train docs total; rate in ppm.
    assert(r === Map(
      8L -> ((3L, 9L, 750000L)),
      12L -> ((2L, 5L, 500000L)),
      16L -> ((1L, 1L, 250000L))))
  }

  test("q49 driver query: benchmark slice is excluded from the output") {
    val dir = docsDir(Seq(
      (20L, benchText),
      (40L, "some other benchmark item with its own distinct words entirely"),
      (21L, benchText + " with a tail"),
      (33L, "nothing in common with any benchmark document at all whatsoever truly")))
    val out = graft.SparkEntry.queries("q49_decontam")(spark, dir)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows.forall { case (id, _) => id % 20 != 0 })
    assert(rows.map(_._1).toSet == Set(21L))
  }
}
