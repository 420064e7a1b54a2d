package graft.ops

import org.apache.spark.sql.SparkSession

/** TEMPORARY dev: print q31's formatted plan at a corpus. */
object ProfileQ31b {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = graft.Sessions.tune(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries("q31_dedup_minhash")(spark, dir)
    df.foreachPartition((_: Iterator[org.apache.spark.sql.Row]) => ())
    import org.apache.spark.sql.execution.debug._
    val cg = codegenString(df.queryExecution.executedPlan)
    // print subtree headers + their plan fragments (skip generated code)
    var inCode = false
    cg.linesIterator.foreach { l =>
      if (l.contains("Generated code")) inCode = true
      if (l.startsWith("== Subtree")) { inCode = false; println(l) }
      else if (!inCode && l.nonEmpty) println(l)
    }
    // also: the final executed plan outline (which ops are OUTSIDE codegen)
    println("=== FINAL PLAN ===")
    df.queryExecution.executedPlan.toString.linesIterator
      .map(_.take(110)).take(60).foreach(println)
    spark.stop()
  }
}
