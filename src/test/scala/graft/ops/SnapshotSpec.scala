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
}
