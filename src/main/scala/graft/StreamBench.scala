package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.inspector.SyntheticTraffic
import graft.streaming.{InspectorStream, StreamingOps}

/** Streaming throughput benchmark (r16 verdict item 4: the streaming rows
  * were spec-green but carried no committed scaled bench — the batch side
  * has PcapBench and the 10x gate; streaming had nothing).
  *
  * Four legs, each a bounded replay measured end to end:
  *
  *  1. `inspector` — the full streaming packet pipeline
  *     ([[InspectorStream.recordsFromPcapDir]]): synthetic rotated pcap
  *     files ([[SyntheticTraffic.bulkPcapDir]], the PcapBench generator)
  *     replayed with `Trigger.AvailableNow` through the stateful
  *     flatMapGroupsWithState correlate → noop sink. Decode loss is a
  *     hard failure, like PcapBench.
  *  2. `exact_dedup` — [[StreamingOps.exactDedup]]
  *     (dropDuplicatesWithinWatermark on (xxhash64, len)) over the
  *     documents corpus replayed as micro-batches through the FILE
  *     source (maxFilesPerTrigger over the parquet part files — no
  *     driver-side collect; the corpus streams from disk exactly as a
  *     tailing ingest would).
  *  3. `decontam` — [[StreamingOps.contaminationScreen]]: every
  *     micro-batch screened against the broadcast benchmark gram set
  *     inside foreachBatch.
  *  4. `neardup_screen` — [[StreamingOps.nearDupScreen]] (r20): per-row
  *     minhash signatures through the band-keyed flatMapGroupsWithState,
  *     replayed with a watermark that keeps the whole corpus resident —
  *     the worst-case state volume for the band-bucket discipline.
  *
  * Per leg: wall seconds, rows in/out, rows/s, and the state store's
  * peak (rows, MB) across all triggers — the number that decides
  * whether the state discipline (16-byte dedup keys, per-connection
  * snapshots) actually bounds memory at scale. One JSON line on stdout
  * (the Bench contract) + BENCH_STREAM.json, with the same host
  * preamble fields as Bench (steal/jit deltas over the measured
  * region) so a contended run is self-describing.
  *
  * Scale knobs (env): SPARK_GRAFT_SF_DIR (documents corpus; default the
  * 10x gate corpus, falling back to sf0.1 with a notice),
  * SPARK_GRAFT_STREAM_CONNS/CALLS/FILES (pcap volume; defaults
  * 256/200/16 ≈ 870k messages over 16 rotated files).
  */
object StreamBench {

  final case class Leg(name: String, rowsIn: Long, rowsOut: Long,
      sec: Double, stateRowsPeak: Long, stateMbPeak: Double) {
    def json: String =
      f""""$name":{"rows_in":$rowsIn,"rows_out":$rowsOut,"sec":$sec%.3f,""" +
        f""""rows_per_s":${(rowsIn / math.max(sec, 1e-9)).toLong},""" +
        f""""state_rows_peak":$stateRowsPeak,"state_mb_peak":$stateMbPeak%.1f}"""
  }

  /** Run one bounded streaming replay to the noop sink and measure it.
    * `build` receives a unique query name and returns a STARTED query.
    */
  private def timeQuery(spark: SparkSession, name: String)(
      build: String => org.apache.spark.sql.streaming.StreamingQuery): (Long, Double, Long, Double) = {
    val tracker = new InspectorStream.ProgressTracker(name)
    spark.streams.addListener(tracker)
    val t0 = System.nanoTime()
    val q = build(name)
    try q.awaitTermination()
    finally spark.streams.removeListener(tracker)
    val sec = (System.nanoTime() - t0) / 1e9
    // state peaks from the retained per-trigger progresses
    val progresses = q.recentProgress
    val stateRows = progresses.flatMap(_.stateOperators.map(_.numRowsTotal))
      .foldLeft(0L)(math.max)
    val stateMb = progresses
      .flatMap(_.stateOperators.map(_.memoryUsedBytes / 1048576.0))
      .foldLeft(0.0)(math.max)
    (tracker.total, sec, stateRows, stateMb)
  }

  private def ckpt(tag: String): String =
    Files.createTempDirectory(s"graft_stream_ck_$tag").toString

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val conns = sys.env.get("SPARK_GRAFT_STREAM_CONNS").map(_.toInt).getOrElse(256)
    val calls = sys.env.get("SPARK_GRAFT_STREAM_CALLS").map(_.toInt).getOrElse(200)
    val files = sys.env.get("SPARK_GRAFT_STREAM_FILES").map(_.toInt).getOrElse(16)
    val sfDir = {
      val want = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1d")
      if (Files.exists(Paths.get(want, "documents.parquet"))) want
      else {
        System.err.println(s"[streambench] $want has no documents.parquet — " +
          "falling back to /root/testdata/sf0.1")
        "/root/testdata/sf0.1"
      }
    }

    val spark = Sessions.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.quietRddWarnings()

    val legs = scala.collection.mutable.ArrayBuffer.empty[Leg]
    val jvm0 = JvmTelemetry.snapshot()
    val foreignAtStart = Bench.liveForeignJvms()
    val t0 = System.nanoTime()

    // ---- leg 1: streaming packet pipeline over rotated pcap ----
    val (pcapDir, nReq, nRes) = SyntheticTraffic.bulkPcapDir(conns, calls, files)
    try {
      val msgs = nReq + nRes
      val (out, sec, stRows, stMb) = timeQuery(spark, "graft_stream_inspector") {
        name =>
          // withIdleTimeout=false: a bounded AvailableNow replay would
          // otherwise schedule empty timeout-check triggers that measure
          // the trigger clock, not the pipeline (the spec's determinism
          // posture); event-ts-relative expiry still runs.
          InspectorStream.recordsFromPcapDir(spark, pcapDir,
              withIdleTimeout = false)
            .writeStream.format("noop").queryName(name)
            .option("checkpointLocation", ckpt("inspector"))
            .trigger(Trigger.AvailableNow()).start()
      }
      legs += Leg("inspector", msgs, out, sec, stRows, stMb)
      // a decode/correlation regression must not publish plausible rates
      if (out != msgs) {
        System.err.println(s"[streambench] DECODE LOSS: $out records != $msgs generated")
        sys.exit(1)
      }
    } finally Fs.deleteTree(Paths.get(pcapDir))

    // ---- shared streaming documents source (file-source micro-batches) ----
    // FileStreamSource needs a DIRECTORY. Spark-written corpora (the 10x
    // gate dir) already are one; the driver's small-SF testdata ships a
    // single parquet FILE — stage it into a temp dir so the same replay
    // runs at any scale (no copy on the real corpus path).
    val docsPath = {
      val p = Paths.get(s"$sfDir/documents.parquet")
      if (Files.isDirectory(p)) p.toString
      else {
        val d = Files.createTempDirectory("graft_stream_docs")
        Files.copy(p, d.resolve("documents.parquet"))
        d.toString
      }
    }
    val docsSchema = spark.read.parquet(docsPath).schema
    val nDocs = spark.read.parquet(docsPath).count()
    def docsStream(maxFilesPerTrigger: Int) = spark.readStream
      .schema(docsSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(docsPath)
      // replayed history: synthesize a bounded event-time so the
      // watermark horizon covers the whole replay (a live ingest would
      // carry real arrival time here)
      .withColumn("event_time",
        timestamp_seconds(lit(1700000000L) + col("doc_id") % 300))

    // ---- leg 2: streaming exact dedup (stateful, watermark-bounded) ----
    locally {
      val (out, sec, stRows, stMb) = timeQuery(spark, "graft_stream_dedup") {
        name =>
          StreamingOps.exactDedup(docsStream(4))
            .writeStream.format("noop").queryName(name)
            .option("checkpointLocation", ckpt("dedup"))
            .trigger(Trigger.AvailableNow()).start()
      }
      legs += Leg("exact_dedup", nDocs, out, sec, stRows, stMb)
    }

    // ---- leg 3: streaming decontamination screen (foreachBatch) ----
    locally {
      // benchmark set: every 41st doc stands in for the eval corpus —
      // caller-owned gram-set lifecycle (the contaminationScreen contract)
      val bench = spark.read.parquet(docsPath)
        .filter(col("doc_id") % 41 === 0).select(col("doc_id"), col("text"))
      val benchGrams = graft.ops.Decontam.benchGramSet(bench).cache()
      benchGrams.count() // materialize outside the timed region
      val contaminated = new java.util.concurrent.atomic.LongAdder
      try {
        val (_, sec, stRows, stMb) = timeQuery(spark, "graft_stream_decontam") {
          name =>
            StreamingOps.contaminationScreen(
                docsStream(4).select(col("doc_id"), col("text")), benchGrams) {
              (contam, _) => contaminated.add(contam.count())
            }.queryName(name)
              .option("checkpointLocation", ckpt("decontam"))
              .trigger(Trigger.AvailableNow()).start()
        }
        legs += Leg("decontam", nDocs, contaminated.sum(), sec, stRows, stMb)
      } finally benchGrams.unpersist()
    }

    // ---- leg 4: streaming near-dup screen (r20 — the live q31) ----
    locally {
      val (out, sec, stRows, stMb) = timeQuery(spark, "graft_stream_neardup") {
        name =>
          StreamingOps.nearDupScreen(
              docsStream(4).select(col("event_time"), col("doc_id"), col("text")))
            .writeStream.format("noop").queryName(name)
            .option("checkpointLocation", ckpt("neardup"))
            .trigger(Trigger.AvailableNow()).start()
      }
      // out = emitted hits; state peak is the live (band, bucket)
      // member volume — the number that decides whether the band-keyed
      // state discipline holds under a replayed-history watermark that
      // keeps the WHOLE corpus inside the horizon (worst case: every
      // signed doc stays resident in all 4 bands)
      legs += Leg("neardup_screen", nDocs, out, sec, stRows, stMb)
    }

    val total = (System.nanoTime() - t0) / 1e9
    val jvm1 = JvmTelemetry.snapshot()
    val health = Bench.Health(
      stealMs = (jvm1.stealJiffies - jvm0.stealJiffies) * JvmTelemetry.msPerJiffy,
      jitMs = jvm1.jitMs - jvm0.jitMs,
      foreignJvms = (foreignAtStart ++ Bench.liveForeignJvms()).distinct.length)
    val json =
      f"""{"metric":"stream_total","value":$total%.3f,"unit":"sec","streams":{${legs.map(_.json).mkString(",")}},${health.json},"pcap":{"conns":$conns,"calls":$calls,"files":$files},"sf":"$sfDir"}"""
    try Files.writeString(Paths.get("BENCH_STREAM.json"), json)
    catch { case _: Throwable => () }
    try spark.stop() catch { case _: Throwable => () }
    println(json)
  }
}
