package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {

  private def stats(text: String): (Long, Long, Long, Long) = {
    val r = RepetitionStats.compute(UTF8String.fromString(text))
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("repetition_stats: token/gram counts on hand-checked docs") {
    // "a b a b a b": 6 toks, top(a)=3, grams = 4 total, 2 distinct
    assert(stats("a b a b a b") === ((6L, 3L, 4L, 2L)))
    // all-distinct doc: ng == nu
    assert(stats("w x y z") === ((4L, 1L, 2L, 2L)))
    // short docs: no 3-grams (matches gramsOf's empty-array contract)
    assert(stats("one two") === ((2L, 1L, 0L, 0L)))
    // empty string tokenizes to [""] exactly like split(trim(text), "\\s+")
    assert(stats("") === ((1L, 1L, 0L, 0L)))
    // leading/trailing whitespace trimmed first
    assert(stats("  a a  ") === ((2L, 2L, 0L, 0L)))
    // SQL trim strips SPACES only — a leading tab survives the trim and
    // the \s+ split then yields a leading empty token, exactly like
    // trim()/regexp_split_to_array in the DuckDB oracle (Java's
    // String.trim would eat the tab and silently diverge)
    assert(stats("\ta b c") === ((4L, 1L, 2L, 2L)))
  }

  test("repetition_stats: codegen path equals interpreted eval") {
    val s = spark
    import s.implicits._
    val docs = Seq("a b a b a b c", "single", "x y z x y z x y z", "")
    val viaPlan = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), RepetitionStats(col("text")).as("st"))
      .collect()
      .map(r => r.getLong(0) -> r.getStruct(1))
      .toMap
    docs.zipWithIndex.foreach { case (t, i) =>
      val direct = stats(t)
      val p = viaPlan(i.toLong)
      assert((p.getLong(0), p.getLong(1), p.getLong(2), p.getLong(3)) === direct, t)
    }
  }

  test("q44 stays inside whole-stage codegen with zero exchanges") {
    val df = graft.SparkEntry.queries("q44_repetition")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan) // map-side only — the point
    assert(plan.contains("*(1)"), plan) // the whole query is ONE codegen stage
  }

  test("HashedGrams: window contract and equality structure match string grams") {
    val s = spark
    import s.implicits._
    // adversarial shapes: repeats, shared windows, short docs, empties
    val rnd = new scala.util.Random(17)
    val docs = (Seq(
      "a b c d e", "c d e a b", "a a a a", "x", "", "a b",
      "a b c a b c a b c") ++
      (0 until 50).map(_ => (0 until rnd.nextInt(30)).map(_ => s"t${rnd.nextInt(6)}").mkString(" ")))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    for (n <- Seq(2, 3, 8)) {
      val rows = docs.toDF("id", "text")
        .select(col("id"),
          TextFunctions.hashedGrams(graft.ops.Dedup.tokens, n).as("h"),
          graft.ops.Dedup.gramsN(graft.ops.Dedup.tokens, n).as("g"))
        .collect()
        .map(r => (r.getSeq[Long](1), r.getSeq[String](2)))
      rows.foreach { case (h, g) =>
        assert(h.length === g.length) // same window count incl. short docs
        // the hash distinguishes exactly the pairs the strings distinguish
        for (i <- h.indices; j <- i + 1 until h.length)
          assert((h(i) == h(j)) === (g(i) == g(j)), s"n=$n windows $i,$j")
      }
      // cross-doc: equal gram strings hash equal (the join-key contract)
      val all = rows.flatMap { case (h, g) => h.zip(g) }
      all.groupBy(_._2).values.foreach(grp =>
        assert(grp.map(_._1).distinct.length === 1))
      // ... and distinct gram strings get distinct hashes at this scale
      assert(all.map(_._1).distinct.length === all.map(_._2).distinct.length)
    }
  }

  test("HashedGramsTagged: differential vs per-width array_distinct(hashedGrams)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    val widths = Seq(2, 3, 8)
    val docs = (Seq("a b c d e f g h i", "a a a a a", "x y", "", "one") ++
      (0 until 50).map(_ =>
        (0 until rnd.nextInt(25)).map(_ => s"t${rnd.nextInt(5)}").mkString(" ")))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val rows = docs.toDF("id", "text")
      .select(col("id"),
        TextFunctions.hashedGramsTagged(graft.ops.Dedup.tokens, widths).as("tg"),
        array(widths.map(w => array_distinct(
          TextFunctions.hashedGrams(graft.ops.Dedup.tokens, w))): _*).as("ref"))
      .collect()
    rows.foreach { r =>
      val got = r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getInt(0), x.getLong(1))).toSet
      val want = widths.zipWithIndex.flatMap { case (w, i) =>
        r.getSeq[scala.collection.Seq[Long]](2)(i).map(g => (w, g)) }.toSet
      assert(got === want, s"id=${r.getLong(0)}")
    }
  }

  // ---- r21 fused map-side kernels: differentials against the exact ----
  // ---- relational spellings they replaced                          ----

  test("NormText ≡ translate + regexp_replace×2 + trim (edge cases + fuzz)") {
    val s = spark
    import s.implicits._
    val upper = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    val lower = "abcdefghijklmnopqrstuvwxyz"
    def oldNorm(c: org.apache.spark.sql.Column) =
      trim(regexp_replace(
        regexp_replace(translate(c, upper, lower), "[^a-z0-9 \\t\\n\\r]", ""),
        "[ \\t\\n\\r]+", " "))
    val rnd = new scala.util.Random(7)
    val alphabet = "aZ09 .!\t\n\ré世_-"
    val docs: Seq[String] = Seq(
      "", " ", "\t\n\r", "A.B", "a . b", "  Hello,  WORLD!!  ",
      "café résumé", "世界 abc", "ab",
      "MiXeD 123 ...", "\ttab lead", "trail \n") ++
      (0 until 200).map(_ => (0 until rnd.nextInt(40))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val rows = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), NormText(col("text")).as("fused"),
        oldNorm(col("text")).as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(1) === r.getString(2), s"id=${r.getLong(0)}")
    }
  }

  test("SimhashBits ≡ explode(array_distinct) + xxhash64 + 64 vote sums") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val docs = (Seq("a b c d e f g h", "a a a", "", "x", "one two one") ++
      (0 until 60).map(_ => (0 until rnd.nextInt(30))
        .map(_ => s"t${rnd.nextInt(8)}").mkString(" ")))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    val fused = df.select(col("doc_id"),
        SimhashBits(graft.ops.Dedup.tokens).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the exact pre-r21 relational spelling
    val toks = df.select(col("doc_id"),
      explode(array_distinct(graft.ops.Dedup.tokens)).as("t"))
    val hashed = toks.select(col("doc_id"), xxhash64(col("t")).as("h"))
    val voteCols = (0 until 64).map(i =>
      sum(when(shiftrightunsigned(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"v$i"))
    val shExpr = (0 until 64).map(i =>
      when(col(s"v$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    val ref = hashed.groupBy(col("doc_id")).agg(voteCols.head, voteCols.tail: _*)
      .select(col("doc_id"), shExpr.as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused.keySet === ref.keySet)
    ref.foreach { case (id, sh) => assert(fused(id) === sh, s"doc $id") }
  }

  test("SimhashBits skips NULL array elements instead of NPE-ing (r22)") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Seq[String]("a", null, "b")), (2L, Seq[String]("a", "b")))
      .toDF("doc_id", "toks")
    // containsNull=true input: the null element must be ignored, so rows
    // 1 and 2 hash identically
    val got = df.select(col("doc_id"), SimhashBits(col("toks")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === got(2L))
  }

  test("MinhashSig ≡ explode(array_distinct) + pmod + 16 min aggregates") {
    val s = spark
    import s.implicits._
    val p = 2147483647L
    val perms = (0 until 16).map(i => (1000003L * (2 * i + 1)) % p)
    val rnd = new scala.util.Random(13)
    val docs = (Seq("a b c d e f g h", "x y", "", "a b c") ++
      (0 until 60).map(_ => (0 until rnd.nextInt(30))
        .map(_ => s"t${rnd.nextInt(8)}").mkString(" ")))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    val fused = df.select(col("doc_id"),
        MinhashSig(TextFunctions.hashedGrams(graft.ops.Dedup.tokens, 3),
          perms, p).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // the exact pre-r21 relational spelling (docs under 3 tokens have no
    // rows — the fused form's all-P sentinel stands in for absence)
    val hashed = df.select(col("doc_id"), explode(array_distinct(
        TextFunctions.hashedGrams(graft.ops.Dedup.tokens, 3))).as("g"))
      .select(col("doc_id"), pmod(col("g"), lit(p)).as("h"))
    val minCols = (0 until 16).map(i =>
      min(pmod(col("h") * perms(i), lit(p))).as(s"m$i"))
    val ref = hashed.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to 16).map(r.getLong(_))).toMap
    docs.foreach { case (id, _) =>
      ref.get(id) match {
        case Some(sig) => assert(fused(id) === sig, s"doc $id")
        case None => assert(fused(id) === Seq.fill(16)(p), s"doc $id sentinel")
      }
    }
  }
}
