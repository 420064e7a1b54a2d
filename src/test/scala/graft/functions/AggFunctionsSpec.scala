package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AggFunctionsSpec extends SparkSpec {

  test("exact sorted distinct set below the cap, even across partitions") {
    val s = spark
    import s.implicits._
    // values scattered over 8 partitions force partial-buffer merges
    val df = (1 to 100).map(i => ("g", (i % 7).toLong)).toDF("g", "v")
      .repartition(8)
    val out = df.groupBy("g")
      .agg(CappedCollectSetLong(col("v"), cap = 10).as("ids"))
      .select("ids").as[Seq[Long]].collect()(0)
    assert(out == Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("over-cap groups stop at cap+1 elements (disqualification marker)") {
    val s = spark
    import s.implicits._
    val df = (1 to 1000).map(i => ("g", i.toLong)).toDF("g", "v").repartition(4)
    val out = df.groupBy("g")
      .agg(CappedCollectSetLong(col("v"), cap = 50).as("ids"))
      .select(size(col("ids"))).as[Int].collect()(0)
    assert(out == 51)
  }

  test("null inputs are ignored; empty group yields empty array") {
    val s = spark
    import s.implicits._
    val df = Seq(("g", Some(1L)), ("g", None), ("g", Some(1L)))
      .toDF("g", "v")
    val out = df.groupBy("g")
      .agg(CappedCollectSetLong(col("v"), cap = 5).as("ids"))
      .select("ids").as[Seq[Long]].collect()(0)
    assert(out == Seq(1L))
  }

  test("registered on the SQL surface: capped_collect_set_long parses in spark.sql") {
    val s = spark
    import s.implicits._
    VectorFunctions.register(s)
    (1 to 20).map(i => ("g", (i % 4).toLong)).toDF("g", "v")
      .createOrReplaceTempView("agg_sql_t")
    val out = s.sql(
      "SELECT capped_collect_set_long(v, 10) AS ids FROM agg_sql_t GROUP BY g")
      .as[Seq[Long]].collect()(0)
    assert(out == Seq(0L, 1L, 2L, 3L))
  }

  test("misra-gries: exact counts below the cap, even across partitions") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(3)
    val rows = (1 to 3000).map(_ => ("g", s"tok${rnd.nextInt(25)}"))
    val df = rows.toDF("g", "t").repartition(8).cache()
    val sketch = df.groupBy("g")
      .agg(MisraGriesTopK(col("t"), cap = 64).as("m"))
      .select(explode(col("m")).as(Seq("t", "c")))
      .as[(String, Long)].collect().toMap
    val exact = df.groupBy("t").count().as[(String, Long)].collect().toMap
    assert(sketch === exact) // 25 distinct < 64 cap: no eviction anywhere
    df.unpersist()
  }

  test("misra-gries: heavy hitter survives eviction within the n/(cap+1) bound") {
    val s = spark
    import s.implicits._
    // one dominant token (300 of n=540) + 240 distinct singletons, cap 8:
    // undercount per item <= n/(cap+1) = 60
    val rnd = new scala.util.Random(9)
    val rows = rnd.shuffle(
      Seq.fill(300)("hh") ++ (1 to 240).map(i => s"rare$i")).map(("g", _))
    val out = rows.toDF("g", "t").coalesce(1)
      .groupBy("g").agg(MisraGriesTopK(col("t"), cap = 8).as("m"))
      .select(explode(col("m")).as(Seq("t", "c")))
      .as[(String, Long)].collect().toMap
    assert(out.size <= 8)
    assert(out.contains("hh"), s"heavy hitter evicted: $out")
    assert(out("hh") <= 300L && out("hh") >= 300L - 540L / 9)
  }

  test("misra-gries: merge of over-cap partials keeps heavy hitters, respects cap") {
    val s = spark
    import s.implicits._
    // every partition sees the heavy hitter plus its own disjoint noise
    val rows = (0 until 8).flatMap { p =>
      Seq.fill(100)((p, "hh")) ++ (1 to 30).map(i => (p, s"noise${p}_$i"))
    }
    val out = rows.toDF("p", "t").repartition(8, col("p"))
      .groupBy(lit("g")).agg(MisraGriesTopK(col("t"), cap = 16).as("m"))
      .select(explode(col("m")).as(Seq("t", "c")))
      .as[(String, Long)].collect().toMap
    assert(out.size <= 16)
    // n = 1040, true hh count 800, bound n/(cap+1) ~ 61 per merge level;
    // assert the conservative half-way floor
    assert(out.contains("hh") && out("hh") >= 400L && out("hh") <= 800L)
  }

  test("misra-gries: registered on the SQL surface") {
    val s = spark
    import s.implicits._
    VectorFunctions.register(s)
    (1 to 30).map(i => ("g", s"t${i % 3}")).toDF("g", "t")
      .createOrReplaceTempView("mg_sql_t")
    val out = s.sql(
      "SELECT misra_gries_topk(t, 8) AS m FROM mg_sql_t GROUP BY g")
      .select(explode(col("m"))).as[(String, Long)].collect().toMap
    assert(out === Map("t0" -> 10L, "t1" -> 10L, "t2" -> 10L))
  }

  test("q61 end to end: sketch top-10 equals exact top-10 on the fixture") {
    val dir = docsDir(Seq(
      (1L, "apple apple apple banana banana cherry"),
      (2L, "apple banana date egg fig grape"),
      (3L, "apple cherry cherry date date date")))
    val out = graft.SparkEntry.queries("q61_vocab_topk")(spark, dir)
      .orderBy("rk", "tok")
      .collect().map(r => (r.getString(1), r.getLong(2), r.getInt(3)))
    // exact counts: apple 5, date 4, banana 3, cherry 3, egg/fig/grape 1
    assert(out.take(4).toSeq === Seq(
      ("apple", 5L, 1), ("date", 4L, 2), ("banana", 3L, 3), ("cherry", 3L, 4)))
    assert(out.length === 7)
  }

  test("misra-gries fuzz: surviving counts bounded by [true - n/(cap+1), true] at any cap") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(0xBEEF)
    for (trial <- 0 until 8) {
      val nDistinct = 5 + rnd.nextInt(60)
      val cap = 2 + rnd.nextInt(40)
      val n = 200 + rnd.nextInt(800)
      // zipf-ish skew so some tokens are heavy
      val rows = (0 until n).map { _ =>
        val t = math.min(nDistinct - 1,
          (nDistinct * math.pow(rnd.nextDouble(), 2)).toInt)
        ("g", s"t$t")
      }
      val df = rows.toDF("g", "t").repartition(1 + rnd.nextInt(6))
      val sketch = df.groupBy("g")
        .agg(MisraGriesTopK(col("t"), cap).as("m"))
        .select(explode(col("m")).as(Seq("t", "c")))
        .as[(String, Long)].collect().toMap
      val exact = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      assert(sketch.size <= cap, s"trial $trial: ${sketch.size} > cap $cap")
      sketch.foreach { case (t, c) =>
        val truth = exact(t)
        assert(c <= truth, s"trial $trial: overcount $t $c > $truth")
        assert(c >= truth - n / (cap + 1),
          s"trial $trial: $t undercount $c < ${truth - n / (cap + 1)} (true $truth)")
      }
      // every item above the guarantee threshold survives
      exact.foreach { case (t, truth) =>
        if (truth > n.toLong / (cap + 1))
          assert(sketch.contains(t), s"trial $trial: heavy $t ($truth) evicted")
      }
    }
  }

  test("q33 equivalence: capped aggregate matches collect_set under the cap") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 2000).map(_ => (rnd.nextInt(40).toString, rnd.nextInt(30).toLong))
    val df = rows.toDF("g", "v").repartition(8).cache()
    val capped = df.groupBy("g")
      .agg(CappedCollectSetLong(col("v"), cap = 50).as("ids"))
    val builtin = df.groupBy("g")
      .agg(sort_array(collect_set(col("v"))).as("ids"))
    val a = capped.orderBy("g").as[(String, Seq[Long])].collect().toSeq
    val b = builtin.orderBy("g").as[(String, Seq[Long])].collect().toSeq
    assert(a == b) // every group here is under the cap (<= 30 distinct)
    df.unpersist()
  }

  test("arg_max_tie_min: max metric wins, ties to min id, across partial merges") {
    val s = spark
    import s.implicits._
    // 8 partitions so the merge path (partial buffers combining) runs;
    // group a: metric tie at 9 between ids 3 and 7 -> id 3 wins;
    // group b: strict max 50 at id 99 beats id 1's 10
    val df = Seq(
      ("a", 9L, 7L), ("a", 9L, 3L), ("a", 1L, 1L),
      ("b", 10L, 1L), ("b", 50L, 99L))
      .toDF("g", "c", "id").repartition(8)
    val out = df.groupBy("g")
      .agg(ArgMaxTieMin(col("c"), col("id")).as("m"))
      .select(col("g"), col("m.c"), col("m.id"))
      .as[(String, Long, Long)].collect()
      .map { case (g, c, id) => g -> ((c, id)) }.toMap
    assert(out == Map("a" -> ((9L, 3L)), "b" -> ((50L, 99L))))
  }

  test("arg_max_tie_min: equals max(struct(c, -id)) on random data, but hash-aggregated") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map(_ =>
      ((rnd.nextInt(20)).toString, rnd.nextInt(10).toLong, rnd.nextInt(100).toLong))
    val df = rows.toDF("g", "c", "id").repartition(8)
    val got = df.groupBy("g").agg(ArgMaxTieMin(col("c"), col("id")).as("m"))
      .select(col("g"), col("m.c"), col("m.id"))
    val want = df.groupBy("g")
      .agg(max(struct(col("c"), (-col("id")).as("nid"))).as("m"))
      .select(col("g"), col("m.c"), (-col("m.nid")).as("id"))
    assert(got.orderBy("g").collect().toSeq === want.orderBy("g").collect().toSeq)
    // and the plan property the aggregate exists for:
    val p = got.queryExecution.executedPlan.toString
    assert(p.contains("HashAggregate") && !p.contains("SortAggregate"), p)
  }

  test("arg_max_tie_min: null inputs ignored; all-null group is NULL; SQL-registered") {
    val s = spark
    import s.implicits._
    VectorFunctions.register(s)
    Seq(("a", Some(5L), Some(2L)), ("a", None, Some(9L)),
      ("b", None, None))
      .toDF("g", "c", "id").createOrReplaceTempView("amax_t")
    val rows = s.sql(
      "SELECT g, arg_max_tie_min(c, id) AS m FROM amax_t GROUP BY g ORDER BY g")
      .collect()
    assert(rows(0).getStruct(1).getLong(0) === 5L)
    assert(rows(0).getStruct(1).getLong(1) === 2L)
    assert(rows(1).isNullAt(1))
  }

  test("arg_max_tie_min: INT inputs coerce to long like a builtin aggregate") {
    val s = spark
    import s.implicits._
    VectorFunctions.register(s)
    Seq(("g", 3, 7), ("g", 9, 4)).toDF("g", "c", "id")
      .createOrReplaceTempView("amax_int_t")
    val m = s.sql(
      "SELECT arg_max_tie_min(c, id) AS m FROM amax_int_t GROUP BY g")
      .collect()(0).getStruct(0)
    assert(m.getLong(0) === 9L && m.getLong(1) === 4L)
  }
}
