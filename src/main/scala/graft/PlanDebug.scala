package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc timing harness: runs named queries N times in one session to
  * separate fixed per-query overhead (scheduling, checkpoint, AQE rounds)
  * from real work. Usage: runMain graft.PlanDebug <sfDir> <n> <q1,q2,...>
  */
object PlanDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(3)
    val qs = args.lift(2).map(_.split(',').toSeq)
      .getOrElse(Seq("q33_ngram_jaccard", "q31_dedup_minhash"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (q <- qs; i <- 1 to n) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[plandebug] $q run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
