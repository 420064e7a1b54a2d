package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** TEMPORARY dev: q31 pair-join, AQE off, static codegen markers. */
object ProfileQ31c {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf10d"
    val spark = graft.Sessions.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false"))
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.codegen.wholeStage",
        sys.env.getOrElse("PROF_WSCG", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo; val m = si.taskMetrics
        stages.put(si.stageId, f"[stage ${si.stageId}%3d] ${si.name.take(40)}%-40s " +
          f"tasks=${si.numTasks}%3d run=${m.executorRunTime / 1000.0}%8.1fs " +
          f"cpu=${m.executorCpuTime / 1e9}%8.1fs " +
          f"sRead=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fMB " +
          f"sWrite=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB " +
          f"spill=${m.diskBytesSpilled / 1e6}%6.0fMB gc=${m.jvmGCTime / 1000.0}%5.1fs")
      }
    })
    val df = graft.SparkEntry.queries("q31_dedup_minhash")(spark, dir)
    val t0 = System.nanoTime()
    val n = df.count()
    println(f"[profile] q31 AQE-off ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    Thread.sleep(1000)
    import scala.jdk.CollectionConverters._
    stages.asScala.toSeq.sortBy(_._1).foreach(p => println(p._2))
    spark.stop()
  }
}
