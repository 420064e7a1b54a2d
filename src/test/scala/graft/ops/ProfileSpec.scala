package graft.ops

import graft.SparkSpec

class ProfileSpec extends SparkSpec {

  test("columnStats: counts, nulls, distincts, string-rendered min/max") {
    import spark.implicits._
    val df = Seq(
      (1L, "b", Some(10L)),
      (2L, "a", None),
      (3L, null.asInstanceOf[String], Some(30L)),
      (4L, "a", Some(10L)))
      .toDF("id", "s", "v")
    val got = Profile.columnStats(df, Seq("id", "s", "v")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    assert(got("id") === ((4L, 0L, 4L, "1", "4")))
    assert(got("s") === ((4L, 1L, 2L, "a", "b")))
    assert(got("v") === ((4L, 1L, 2L, "10", "30")))
  }

  test("columnStats: all-null column has NULL min/max and zero distincts") {
    import spark.implicits._
    val df = Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]))
      .toDF("id", "s")
    val row = Profile.columnStats(df, Seq("s")).collect().head
    assert(row.getLong(1) === 2L && row.getLong(2) === 2L && row.getLong(3) === 0L)
    assert(row.isNullAt(4) && row.isNullAt(5))
    intercept[IllegalArgumentException](Profile.columnStats(df, Seq.empty))
  }

  test("q83 plan: ONE aggregation pass feeds every column's stats") {
    val df = graft.SparkEntry.queries("q83_column_stats")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.optimizedPlan.toString
    // multiple DISTINCT aggs compile to one Aggregate over an Expand —
    // the table is scanned once, not once per column
    assert("(?i)relation".r.findAllIn(plan).size <= 1, plan)
  }

  private def giniDocs(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  test("q120: hand-computed Gini ppm per source, histogram blocks exact") {
    // A: counts [1,2,3,4] → Σi·x = 1+4+9+16 = 30, s = 10, m = 4
    //    → G = (60 − 5·10)/(4·10) = 0.25 → 250000 ppm; mean 2500 milli
    // B: uniform [5,5,5] → G = 0 (one histogram block of multiplicity 3:
    //    Σi·x = 5·(3·1 + 3) = 30, (60 − 4·15)/45 = 0)
    // C: duplicates [2,2,4] → Σi·x = 2+4+12 = 18
    //    → (36 − 4·8)/(3·8) = 4/24 → ⌊166666.6⌋ = 166666 ppm; mean 2666
    val dir = giniDocs(Seq(
      (1L, "A", "w"),
      (2L, "A", "w w"),
      (3L, "A", "w w w"),
      (4L, "A", "w w w w"),
      (5L, "B", "w w w w w"),
      (6L, "B", "w w w w w"),
      (7L, "B", "w w w w w"),
      (8L, "C", "w w"),
      (9L, "C", "w w"),
      (10L, "C", "w w w w"),
      (11L, "C", null.asInstanceOf[String]))) // NULL text excluded
    val got = Profile.lengthGini(dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got("A") === ((4L, 10L, 2500L, 250000L)))
    assert(got("B") === ((3L, 15L, 5000L, 0L)))
    assert(got("C") === ((3L, 8L, 2666L, 166666L)))
  }

  test("q120: histogram reconstruction equals the naive sorted-rank form") {
    // seeded fuzz: random per-source length multisets; Σi·x from the
    // histogram blocks must equal the row-sorted rank sum exactly
    val rnd = new scala.util.Random(120)
    val rows = (0 until 400).map { i =>
      val src = s"s${rnd.nextInt(5)}"
      val n = 1 + rnd.nextInt(12)
      (i.toLong, src, Seq.fill(n)("w").mkString(" "))
    }
    val got = Profile.lengthGini(giniDocs(rows)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(4))))
      .toMap
    val expect = rows.groupBy(_._2).map { case (src, docs) =>
      val xs = docs.map(_._3.split(" ").length.toLong).sorted
      val m = xs.length.toLong
      val s = xs.sum
      val s1 = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      src -> ((m, s, 1000000L * (2 * s1 - (m + 1) * s) / (m * s)))
    }
    assert(got === expect)
  }

  test("q120 plan: the window runs over the HISTOGRAM, not corpus rows") {
    val df = graft.SparkEntry.queries("q120_length_gini")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.optimizedPlan.toString
    // the printed tree runs root-first, so the shape must read
    // Aggregate(per source) → Window → Aggregate(histogram) → scan: a
    // second Aggregate BELOW the Window proves the sort runs over
    // (source, n) histogram rows, not corpus rows
    val winAt = plan.indexOf("Window")
    val aggs = "Aggregate".r.findAllMatchIn(plan).map(_.start).toSeq
    assert(winAt >= 0 && aggs.size === 2, plan)
    assert(aggs.head < winAt && aggs.last > winAt, plan)
    assert(df.count() > 0)
  }

  test("q122: hand-computed TV ppm — floored distributions, absent-token fold") {
    import spark.implicits._
    // corpus: x=3 y=1 z=1, N=5 → p_ppm x=600000 y=200000 z=200000,
    // P_total=1000000. A: "x x y" (+ an ignored NULL doc and a
    // whitespace-only doc that tokenizes to nothing): p_A x=666666
    // y=333333 → terms=66666+133333=199999, cov=800000,
    // tv=(199999+1000000-800000) div 2 = 199999 (true TV 0.2 — the
    // floor costs 1 ppm). B: "x z": p_B both 500000 →
    // terms=100000+300000=400000, cov=800000, tv=300000 exactly.
    // B never sees y — its share folds through P_total − cov, never a
    // materialized (B, y) row.
    val docs = Seq(
      ("A", "x x y"), ("A", null.asInstanceOf[String]), ("A", "  \t "),
      ("B", "x z"))
      .toDF("source", "text")
    val got = Profile.sourceDivergence(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map("A" -> ((3L, 2L, 199999L)), "B" -> ((2L, 2L, 300000L))))
  }

  test("q122 driver query matches a naive local derivation at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select("source", "text").collect()
      .flatMap(r => Option(r.getString(1)).toSeq.flatMap(t =>
        t.trim.split("\\s+").filter(_.nonEmpty).map(r.getString(0) -> _)))
    val corpus = toks.groupBy(_._2).map { case (t, o) => t -> o.length.toLong }
    val n = corpus.values.sum
    val pT = corpus.map { case (t, c) => t -> 1000000L * c / n }
    val pTotal = pT.values.sum
    val expect = toks.groupBy(_._1).map { case (src, o) =>
      val cs = o.groupBy(_._2).map { case (t, x) => t -> x.length.toLong }
      val ns = cs.values.sum
      val terms = cs.map { case (t, c) => math.abs(1000000L * c / ns - pT(t)) }.sum
      // keysIterator, NOT keys.map: mapping a key SET through pT would
      // deduplicate equal p_t values before the sum
      val cov = cs.keysIterator.map(pT).sum
      src -> ((ns, cs.size.toLong, (terms + pTotal - cov) / 2))
    }
    val got = graft.SparkEntry.queries("q122_source_divergence")(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === expect)
  }

  test("q135: hand-computed quantized-log regression; vocab-1 source excluded") {
    import spark.implicits._
    // A: counts a=4 b=2 c=1 → ranks 1,2,3
    //   x = round(1e3·ln i) = [0, 693, 1099]; y = round(1e3·ln c) =
    //   [1386, 693, 0]; sx=1792 sy=2079 sxy=480249 sxx=1688050
    //   num = sx·sy − 3·sxy = 2284821; den = 3·sxx − sx² = 1852886
    //   slope_ppm = −(10⁶·2284821 // 1852886) = −1233114
    // B: vocab 1 → dropped (den would be 0)
    val docs = Seq(
      (1L, "A", "a a b c"), (2L, "A", "a a b"),
      (3L, "B", "x x x"), (4L, "A", null.asInstanceOf[String]))
      .toDF("doc_id", "source", "text")
    val got = Profile.zipfSlope(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === Map("A" -> ((3L, 7L, -1233114L))))
  }

  test("q135: flat distribution reads slope 0; tie rank order is (count desc, tok asc)") {
    import spark.implicits._
    // all counts equal → every y identical → num = 0 exactly
    val flat = Seq((1L, "A", "a b c d")).toDF("doc_id", "source", "text")
    val row = Profile.zipfSlope(flat).collect().head
    assert(row.getLong(3) === 0L)
  }

  test("q136: hand-computed quantized-log entropy and normalized form") {
    import spark.implicits._
    // A: counts 4,2,1; N=7 → Σc·x = 4·1386 + 2·693 = 6930
    //   entropy_milli = round(1e3·ln7) − 6930//7 = 1946 − 990 = 956
    //   norm = (1e6·956) // round(1e3·ln3) = 956000000 // 1099 = 869881
    // uniform-vocab check: all counts 1 → entropy = ln V exactly, norm = 1e6
    val docs = Seq(
      (1L, "A", "a a b c"), (2L, "A", "a a b"),
      (3L, "U", "p q r s"))
      .toDF("doc_id", "source", "text")
    val got = Profile.tokenEntropy(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map(
      "A" -> ((3L, 7L, 956L, 869881L)),
      "U" -> ((4L, 4L, 1386L, 1000000L))))
  }

  test("q138: hand-counted hapax/dis shares; NULL text carries no tokens") {
    import spark.implicits._
    // A: counts a=4 b=2 c=1 → vocab 3, N 7, hapax {c}, dis {b}
    //   hapax_vocab = 1e6//3 = 333333; hapax_mass = 1e6//7 = 142857;
    //   dis_vocab = 333333
    val docs = Seq(
      (1L, "A", "a a b c"), (2L, "A", "a a b"),
      (3L, "A", null.asInstanceOf[String]))
      .toDF("doc_id", "source", "text")
    val r = Profile.hapaxProfile(docs).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getString(0) === "A")
    assert((row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
      === ((3L, 7L, 1L, 1L)))
    assert((row.getLong(5), row.getLong(6), row.getLong(7))
      === ((333333L, 142857L, 333333L)))
  }
}
