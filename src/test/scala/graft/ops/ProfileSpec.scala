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
}
