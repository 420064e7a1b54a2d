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
    val qs = args.lift(3).filter(_ != "all").map(_.split(',').toSeq)
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    // passthrough (arg 5, default true): dump the WHOLE pipeline instead
    // of ExistingRDD stubs at Materialize boundaries. Turn OFF for
    // queries whose CONSTRUCTION runs a loop of actions (q45/q128/q132's
    // connected components, q63's model count) — passthrough would
    // replay their iterations uncheckpointed.
    val passthrough = args.lift(4).forall(_.toBoolean)
    val spark = Sessions.tune(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config(graft.ops.Materialize.PassthroughFlag, passthrough.toString)
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
