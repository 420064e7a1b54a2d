package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SnapshotSpec extends SparkSpec {

  test("diff classifies added/removed/changed; unchanged and NULL-NULL drop out") {
    import spark.implicits._
    val a = Seq(
      (1L, "same"), (2L, "old body"), (3L, "goes away"),
      (4L, null.asInstanceOf[String]), (5L, "becomes null"))
      .toDF("doc_id", "text")
    val b = Seq(
      (1L, "same"), (2L, "new body"),
      (4L, null.asInstanceOf[String]), (5L, null.asInstanceOf[String]),
      (6L, "brand new"))
      .toDF("doc_id", "text")
    val got = Snapshot.diff(a, b).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(
      2L -> "changed", // body edit
      3L -> "removed",
      5L -> "changed", // text -> NULL is a change
      6L -> "added"))  // 1 unchanged, 4 NULL==NULL unchanged
  }

  test("diff(a, a) is empty; diff against empty is all removed/added") {
    import spark.implicits._
    val a = Seq((1L, "x"), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Snapshot.diff(a, a).count() === 0)
    assert(Snapshot.diff(a, empty).collect().map(_.getString(1)).toSet === Set("removed"))
    assert(Snapshot.diff(empty, a).collect().map(_.getString(1)).toSet === Set("added"))
  }

  test("q86 tokenDrift: flooded token tops the list, stable token near zero") {
    import spark.implicits._
    // snapshot A: balanced; snapshot B: "spam" floods in, "stable" stays
    val a = (1L to 40L).map(i => (i, "stable alpha beta")).toDF("doc_id", "text")
    val b = (41L to 80L).map(i => (i, "stable spam spam spam")).toDF("doc_id", "text")
    val rows = Snapshot.tokenDrift(a, b, k = 10).collect()
    val byTok = rows.map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getDouble(5)))).toMap
    // counts: A has 40 stable/alpha/beta; B has 40 stable, 120 spam
    assert(byTok("spam")._1 === 0L && byTok("spam")._2 === 120L)
    assert(byTok("alpha")._1 === 40L && byTok("alpha")._2 === 0L)
    // the top |contribution| token is one of the fully-shifted ones
    val top = rows.head.getString(0)
    assert(Set("spam", "alpha", "beta").contains(top), top)
    // spam's KL contribution is NEGATIVE from A's view (underrepresented
    // in A) and alpha's positive; both dwarf stable's near-zero drift
    assert(byTok("spam")._3 < 0.0)
    assert(byTok("alpha")._3 > 0.0)
    assert(math.abs(byTok("stable")._3) < math.abs(byTok("alpha")._3) / 10)
    // hand-check alpha: ta=120, tb=160, union vocab 4
    // p_a = (40+1)/(120+4), p_b = (0+1)/(160+4)
    val pa = 41.0 / 124.0; val pb = 1.0 / 164.0
    val expect = BigDecimal(pa * math.log(pa / pb) * 1e6)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(byTok("alpha")._3 === expect)
  }

  test("q86 plan: top-k is a heap TakeOrderedAndProject, totals broadcast") {
    val df = graft.SparkEntry.queries("q86_token_drift")(
      spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // token-count agg is partial (map-side combine before the shuffle)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("bodies never cross the exchange: both sides project to hashes pre-join") {
    val df = graft.SparkEntry.queries("q80_snapshot_diff")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // the shuffled attributes are (id, hash) — the text column must be
    // consumed by xxhash64 below the join, not carried through it
    assert(plan.contains("xxhash64"), plan)
    val joinLine = plan.linesIterator
      .find(l => l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))
    assert(joinLine.isDefined, plan)
    assert(!joinLine.get.contains("text"), joinLine.get)
  }

  test("q133 qualityDrift: integer deciles/means, floored-share TVD, both-endpoints rule") {
    val s = spark
    import s.implicits._
    val a = Seq(
      (1L, "w x y z", "s1"),  // 4/4 uniq: ppm 1000000, decile clamps 10->9
      (2L, "w w x x", "s1"),  // 2/4: ppm 500000, decile 5
      (3L, "a b c", "only_a")) // source absent from B: must drop
      .toDF("doc_id", "text", "source")
    val b = Seq(
      (4L, "p p q q", "s1"),  // 2/4: ppm 500000, decile 5
      (5L, "p p p p", "s1"),  // 1/4: ppm 250000, decile 2
      (6L, null.asInstanceOf[String], "s1")) // NULL text excluded
      .toDF("doc_id", "text", "source")
    val rows = Snapshot.qualityDrift(a, b).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // s1: means (1000000+500000) div 2 = 750000 vs (500000+250000) div 2;
    // decile shares A = {9: 0.5, 5: 0.5}, B = {5: 0.5, 2: 0.5} ->
    // terms = |500000-0| + |500000-500000| + |0-500000| -> tvd 500000
    assert(rows === Map("s1" -> ((2L, 2L, 750000L, 375000L, 500000L))))
  }

  test("q133 qualityDrift ≡ naive local reference on random corpora (seeded fuzz)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    for (_ <- 0 until 3) {
      def corpus(tag: String) = (0 until (30 + rnd.nextInt(30))).map { i =>
        val n = 1 + rnd.nextInt(12)
        // draw from a small token pool so uniq ratios spread over deciles
        val toks = (0 until n).map(_ => s"w${rnd.nextInt(6)}")
        (s"src${rnd.nextInt(3)}", toks.mkString(" "), s"$tag$i")
      }
      val aRows = corpus("a"); val bRows = corpus("b")
      def stats(t: String): (Long, Long) = {
        val w = t.trim.split("\\s+"); (w.length.toLong, w.distinct.length.toLong)
      }
      def cells(rows: Seq[(String, String, String)]) = rows.map { case (src, t, _) =>
        val (nw, nu) = stats(t)
        (src, 1000000L * nu / nw, math.min(10L * nu / nw, 9L))
      }
      val ca = cells(aRows).groupBy(_._1); val cb = cells(bRows).groupBy(_._1)
      val expect = (ca.keySet intersect cb.keySet).map { src =>
        val (xa, xb) = (ca(src), cb(src))
        val (na, nb) = (xa.length.toLong, xb.length.toLong)
        val terms = (0L to 9L).map { bk =>
          val sa = 1000000L * xa.count(_._3 == bk) / na
          val sb = 1000000L * xb.count(_._3 == bk) / nb
          math.abs(sa - sb)
        }.sum
        src -> ((na, nb, xa.map(_._2).sum / na, xb.map(_._2).sum / nb,
          terms / 2))
      }.toMap
      val got = Snapshot.qualityDrift(
        aRows.toDF("source", "text", "tag").select(col("source"), col("text")),
        bRows.toDF("source", "text", "tag").select(col("source"), col("text")))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
      assert(got === expect)
    }
  }
}
