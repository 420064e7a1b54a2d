package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.SparkSpec

/** Physical-plan regression guards for the scale-critical properties:
  * filter/projection pushdown into the parquet scan, broadcast of the
  * dimension sides, and the absence of unbounded shuffles where the
  * operator promises map-side pruning. These are the properties that
  * decide whether a plan survives a 100x scale-up — locked in as tests so
  * a refactor can't silently regress them.
  */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def executed(df: DataFrame): SparkPlan = {
    val plan = df.queryExecution.executedPlan
    plan
  }

  private def planString(q: String): String = {
    val df = graft.SparkEntry.queries(q)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("q02: filter AND projection reach the parquet scan") {
    val p = planString("q02_filter_project")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("IsNotNull(event_type)") || p.contains("EqualTo(event_type,purchase)"), p)
    // pruned read schema: only the 4 needed columns, not props/ts
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("props"), readSchema)
  }

  test("q10: dimension joins broadcast, fact side never broadcast") {
    val p = planString("q10_hot_regions")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
  }

  test("q01: aggregation is partial (map-side combine before the shuffle)") {
    val p = planString("q01_method_counts")
    assert(p.contains("HashAggregate"), p)
    // partial + final pair means map-side combine happened
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("q35: the corpus is pruned before any exchange (per-partition top-k)") {
    val df = graft.SparkEntry.queries("q35_ann_topk")(spark, sf)
    val plan = executed(df)
    // every shuffle in the plan must sit ABOVE the mapPartitions pruning:
    // no ShuffleExchange may have the parquet scan of the corpus as a
    // descendant without the SerializeFromObject (mapPartitions) between
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
    shuffles.foreach { s =>
      val hasScanBelow = s.child.collect {
        case f if f.nodeName.contains("Scan parquet") => f
      }.nonEmpty
      val hasPruneBelow = s.child.collect {
        case f if f.nodeName.contains("SerializeFromObject") => f
      }.nonEmpty
      assert(!hasScanBelow || hasPruneBelow,
        s"shuffle over unpruned corpus:\n$s")
    }
  }

  test("q31: no cross join anywhere; bucket pairs generated in-group") {
    val p = planString("q31_dedup_minhash")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q33: no cross join; inverted index is the only fact-scale shuffle") {
    val p = planString("q33_ngram_jaccard")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }
}
