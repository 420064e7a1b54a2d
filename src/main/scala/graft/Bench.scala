package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints ONE JSON line to stdout (the driver contract) and
  * also writes it to BENCH_LOCAL.json in the cwd as a belt-and-braces copy —
  * rounds 1/2 produced `"parsed": null` because sbt's logger prefixed the
  * stdout line (fixed via `run / outputStrategy` in build.sbt).
  *
  * Each query is fully materialized through the `noop` sink: `count()` lets
  * Catalyst prune the plan to the aggregated columns only, which under-times
  * wide projections. Failures are recorded per-query (`"status"`) instead of
  * being silently timed as successes.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // stdout is the bench contract: exactly one JSON line. Everything else
    // — log4j (routed to stderr by log4j2.properties, but belt-and-braces
    // against a foreign config winning the classpath race), third-party
    // System.out chatter, the round-5 DAGScheduler accumulator trace — is
    // diverted to stderr for the whole run and restored only for the final
    // println, which happens AFTER spark.stop() so nothing can log behind it.
    val realOut = System.out
    System.setOut(System.err)
    val spark = Sessions.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: session/codegen/noop-sink init otherwise lands entirely on
    // the first timed query (alphabetically q01). Warm on a table the
    // queries actually read (events is q01's own input) and SAY SO when
    // warmup fails — a silent no-op hands q01 ~1 s of codegen init.
    try spark.read.parquet(s"$sfDir/events.parquet").limit(1000)
      .write.format("noop").mode("overwrite").save()
    catch { case e: Throwable =>
      System.err.println(s"[bench] warmup failed (q01 will absorb init): $e")
    }
    // pre-write the q20-q22 oracle fixtures so a fresh /tmp doesn't
    // charge three parquet-write jobs to the first inspector query's
    // timed region (round-8 review)
    try inspector.SyntheticTraffic.ensureFixtures(spark)
    catch { case e: Throwable =>
      System.err.println(s"[bench] fixture pre-write failed: $e")
    }

    // SPARK_GRAFT_ONLY=q48,q59 runs the named queries (qNN prefix or full
    // name) in isolation — the knob for attributing interleaving effects
    // (GC/codegen-cache pressure from neighbors) vs real plan changes.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty) // SPARK_GRAFT_ONLY= (empty) means "no filter"
    def selected(name: String): Boolean =
      only.forall(s => s.contains(name) || s.exists(name.startsWith))
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(t => selected(t._1)).map { case (name, fn) =>
      // stderr start marker: attributes any async scheduler noise (e.g.
      // the benign late-task accumulator ERRORs after localCheckpoint
      // cleanup) to the query that provoked it
      System.err.println(s"[bench] $name start")
      val t0 = System.nanoTime()
      val status =
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          "ok"
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
            "fail"
        }
      val sec = (System.nanoTime() - t0) / 1e9
      (name, sec, status)
    }
    val json = renderJson(results, sfDir)
    try Files.writeString(Paths.get("BENCH_LOCAL.json"), json)
    catch { case _: Throwable => () }
    // Stop Spark (and its late-task log noise) BEFORE the JSON line: the
    // driver keeps only the last 2000 chars of stdout, so anything printed
    // after the line would evict it from the parse window.
    try spark.stop() catch { case _: Throwable => () }
    System.setOut(realOut)
    // print through the captured stream, NOT Predef.println: scala.Console
    // snapshots System.out at Console-object init, which can happen while
    // stdout is redirected — println would then write the JSON to stderr
    realOut.println(json)
    realOut.flush()
  }

  /** One JSON line for the driver. The driver keeps only the LAST 2000
    * characters of stdout and parses the JSON line out of that window —
    * round 4's line (with a per-query status map) grew to 2045 chars and
    * its head fell outside the window, costing the round its bench score.
    * So: no per-query status map (failures-only list, normally absent),
    * and BenchSpec pins the worst-case rendered length well under the
    * window minus sbt's trailing output.
    */
  def renderJson(results: Seq[(String, Double, String)], sfDir: String): String = {
    // Locale.ROOT: the f-interpolator is locale-sensitive and a comma
    // decimal separator would produce unparseable JSON
    def d3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    // per-query times at 2 decimals: 10 ms resolution is ample and the
    // saved character per entry keeps 60+ queries inside the tail window
    def d2(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    // only successful queries carry a meaningful time — failed ones are
    // named in "fails" instead, which also keeps the worst-case render
    // (everything failed) far inside the tail window. Keys are shortened
    // to their unique "qNN" prefix: the full names cost ~15 chars each,
    // which at 69 queries is the whole tail-window budget.
    def short(k: String): String = {
      val cut = k.indexOf('_')
      if (cut > 0) k.substring(0, cut) else k
    }
    // two names sharing a qNN prefix would silently collide into duplicate
    // JSON keys; fall back to the full names for just those
    val collide = results.map(t => short(t._1))
      .groupBy(identity).collect { case (p, g) if g.size > 1 => p }.toSet
    def key(k: String): String = if (collide(short(k))) k else short(k)
    val qs = results.collect { case (k, v, "ok") => s""""${key(k)}":${d2(v)}""" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, "ok") => v }.sum
    val fails = results.collect { case (k, _, s) if s != "ok" => s""""$k"""" }
    // fails capped at 6 names so even an everything-failed render stays
    // inside the tail window; "failed" keeps the exact count.
    val failPart =
      if (fails.isEmpty) s""""failed":0"""
      else s""""failed":${fails.length},"fails":${fails.take(6).mkString("[", ",", "]")}"""
    s"""{"metric":"total","value":${d3(total)},"unit":"sec","queries":$qs,$failPart,"sf":"$sfDir"}"""
  }
}
