package graft

import org.apache.spark.sql.SparkSession

import graft.inspector.{Inspector, SyntheticTraffic}

/** Packet-pipeline throughput benchmark — the reference's headline use
  * case (pcap files → decoded/correlated request/response/action/result
  * tables) at a size where rate, not fixture correctness, is what's
  * measured. Generates a bulk capture with [[SyntheticTraffic.bulkPcapDir]]
  * and times the FULL four-table materialization (what the reference's H2
  * sink persists per run).
  *
  * Usage: runMain graft.PcapBench [conns] [callsPerConn] [files] [stage]
  * `stage` — the attribution knob for where pipeline time actually goes:
  * `full` (default) decode + all four table derivations; `decode` pcap →
  * correlated records only (adds the connection shuffle + state walk);
  * `segments` pcap → keyed TCP segments only (file parse + link decode,
  * no shuffle).
  */
object PcapBench {
  def main(args: Array[String]): Unit = {
    val conns = args.headOption.map(_.toInt).getOrElse(256)
    val calls = args.lift(1).map(_.toInt).getOrElse(200)
    val files = args.lift(2).map(_.toInt).getOrElse(8)
    val stage = args.lift(3).getOrElse("full")
    require(Set("full", "decode", "segments")(stage), s"unknown stage: $stage")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    val t0 = System.nanoTime()
    val (dir, nReq, nRes) = SyntheticTraffic.bulkPcapDir(conns, calls, files)
    try {
      val genSec = (System.nanoTime() - t0) / 1e9
      val listing = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      val bytes =
        try listing.mapToLong(p => java.nio.file.Files.size(p)).sum()
        finally listing.close()

      val spark = Sessions.tune(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false"))
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")

      def runOnce(): (Long, Double) = {
        val t1 = System.nanoTime()
        val n =
          if (stage == "segments") Inspector.segments(spark, dir).count()
          else if (stage == "decode") Inspector.records(spark, dir).count()
          else {
            val records = Inspector.records(spark, dir).cache()
            val c = records.count()
            Seq(Inspector.requests(records), Inspector.responses(records),
              Inspector.actionsTable(records), Inspector.resultsTable(records))
              .foreach(_.write.format("noop").mode("overwrite").save())
            records.unpersist()
            c
          }
        val sec = (System.nanoTime() - t1) / 1e9
        (n, sec)
      }
      val (n1, cold) = runOnce()
      val (_, warm) = runOnce()
      val msgs = nReq + nRes
      println(f"[pcapbench] conns=$conns calls=$calls files=$files " +
        f"bytes=$bytes msgs=$msgs records=$n1 gen=$genSec%.1fs " +
        f"cold=$cold%.2fs warm=$warm%.2fs " +
        f"rate_cold=${msgs / cold}%.0f msg/s rate_warm=${msgs / warm}%.0f msg/s " +
        f"mb_s=${bytes / 1e6 / warm}%.1f")
      spark.stop()
      // a decode/correlation regression must not yield plausible-looking
      // throughput: the rates above are computed from GENERATED messages
      // (segments-stage counts raw TCP segments, which need not be 1:1
      // with messages — no loss check there)
      if (stage != "segments" && n1 != msgs) {
        System.err.println(s"[pcapbench] DECODE LOSS: $n1 records != $msgs generated")
        sys.exit(1)
      }
    } finally Fs.deleteTree(java.nio.file.Paths.get(dir))
  }
}
