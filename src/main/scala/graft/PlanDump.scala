package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dumps `explain("formatted")` of named queries to one file per query —
  * the optimization-round evidence artifact (plans/rNN/<query>_<tag>.txt).
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <tag> <q1,q2,...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse("plans/r21")
    val tag = args.lift(2).getOrElse("before")
    val qs = args.lift(3).map(_.split(',').toSeq)
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    val spark = Sessions.tune(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      // plan evidence wants the WHOLE pipeline, not ExistingRDD stubs at
      // every Materialize boundary (never set outside this dev main)
      .config(graft.ops.Materialize.PassthroughFlag, "true")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    qs.foreach { k =>
      val df = SparkEntry.queries(k)(spark, sfDir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(s"$outDir/${k}_$tag.txt"), plan)
      println(s"[plandump] $outDir/${k}_$tag.txt")
    }
    spark.stop()
  }
}
