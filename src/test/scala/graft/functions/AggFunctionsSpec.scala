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
}
