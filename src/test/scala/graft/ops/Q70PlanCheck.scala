package graft.ops

import org.apache.spark.sql.SparkSession

/** Dev check (test sourceset): does q70's one-gram-pass shape actually
  * get its (g, doc_id) aggregate computed ONCE at runtime (AQE shuffle
  * stage reuse), or do both consumers replay the gram pipeline? Executes
  * the query, then prints the FINAL adaptive plan — look for
  * ReusedExchange / reused ShuffleQueryStage ids vs duplicated
  * HashedGrams subtrees.
  *
  *   sbt "Test/runMain graft.ops.Q70PlanCheck /root/testdata/sf0.001 q70_strip_spans"
  */
object Q70PlanCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val q = args.lift(1).getOrElse("q70_strip_spans")
    val spark = graft.Sessions.tune(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(q)(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    println(s"==== final adaptive plan for $q ====")
    println(plan)
    println("==== summary ====")
    println(s"ReusedExchange/reused-stage mentions: " +
      "ReusedExchange=" + "ReusedExchange".r.findAllIn(plan).size +
      " ShuffleQueryStage=" + "ShuffleQueryStage".r.findAllIn(plan).size +
      " hashed_grams=" + "hashed_grams".r.findAllIn(plan).size +
      " Scan parquet=" + "Scan parquet".r.findAllIn(plan).size)
    spark.stop()
  }
}
