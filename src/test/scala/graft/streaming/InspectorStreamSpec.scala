package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.inspector.{Inspector, KeyedSegment, SyntheticTraffic}

class InspectorStreamSpec extends SparkSpec {

  private lazy val allSegments: Seq[KeyedSegment] =
    Inspector.segments(spark, SyntheticTraffic.ensurePcapDir())
      .collect().toSeq.sortBy(s => (s.ts, s.order))

  test("streaming pipeline emits the same records as batch, across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext

    val ms = MemoryStream[KeyedSegment]
    val query = InspectorStream.records(ms.toDS(), withIdleTimeout = false)
      .writeStream.format("memory").queryName("stream_records")
      .outputMode("append").start()
    try {
      // split mid-capture: the second chunk starts INSIDE the split big-get
      // frame of conn B, so reassembly state must survive the batch boundary
      val cut = allSegments.indexWhere(seg =>
        seg.client == "10.0.0.2" && seg.inbound) + 1
      ms.addData(allSegments.take(cut))
      query.processAllAvailable()
      ms.addData(allSegments.drop(cut))
      query.processAllAvailable()

      val streamed = s.table("stream_records")
        .select(col("client"), col("port"), col("call_id"), col("inbound"),
          col("method"), col("cells"), col("elapsed"))
        .collect().map(_.toSeq).toSet
      val batch = Inspector.records(s, SyntheticTraffic.ensurePcapDir())
        .toDF()
        .select(col("client"), col("port"), col("call_id"), col("inbound"),
          col("method"), col("cells"), col("elapsed"))
        .collect().map(_.toSeq).toSet
      assert(streamed === batch)
      assert(streamed.size ===
        SyntheticTraffic.ExpectedRequests + SyntheticTraffic.ExpectedResponses)
    } finally query.stop()
  }

  test("pcap-dir file source: rotated files processed incrementally, state crosses files") {
    val s = spark
    import java.nio.file.{Files, Paths}
    val srcDir = Files.createTempDirectory("graft_stream_pcap")
    val pcaps = Paths.get(SyntheticTraffic.ensurePcapDir())
    val query = InspectorStream
      .recordsFromPcapDir(s, srcDir.toString, withIdleTimeout = false)
      .writeStream.format("memory").queryName("pcap_dir_records")
      .outputMode("append").start()
    try {
      // "rotate" the capture files in one at a time
      Files.copy(pcaps.resolve("capture-00001.pcap"), srcDir.resolve("c1.pcap"))
      query.processAllAvailable()
      val afterFirst = s.table("pcap_dir_records").count()
      assert(afterFirst === 22L) // conn A requests+responses
      Files.copy(pcaps.resolve("capture-00002.pcap"), srcDir.resolve("c2.pcap"))
      query.processAllAvailable()
      assert(s.table("pcap_dir_records").count() ===
        (SyntheticTraffic.ExpectedRequests + SyntheticTraffic.ExpectedResponses).toLong)
    } finally query.stop()
  }

  test("watermarked windowed aggregation over the streaming records") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = MemoryStream[KeyedSegment]
    // per-10s-window method counts with a 30 s watermark — the streaming
    // equivalent of q01 over live traffic
    val windowed = InspectorStream.records(ms.toDS(), withIdleTimeout = false)
      .toDF()
      .select(org.apache.spark.sql.functions.timestamp_millis(col("ts")).as("event_time"),
        col("method"))
      .withWatermark("event_time", "30 seconds")
      .groupBy(
        org.apache.spark.sql.functions.window(col("event_time"), "10 seconds"),
        col("method"))
      .count()
    val query = windowed.writeStream.format("memory")
      .queryName("windowed_methods").outputMode("complete").start()
    try {
      ms.addData(allSegments)
      query.processAllAvailable()
      val counts = s.table("windowed_methods")
        .select(col("method"), col("count")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).groupBy(_._1)
        .view.mapValues(_.map(_._2).sum).toMap
      assert(counts("get") === 8L)   // 4 requests + 4 responses
      assert(counts("multi") === 2L) // batch-3 multi req + res
    } finally query.stop()
  }

  test("expireBefore drops stale pending correlation entries") {
    val t = new graft.inspector.ConnTracker("c", 1)
    // feed only a request (no response): entry stays pending
    val reqSeg = allSegments.find(s => s.client == "10.0.0.1" && s.inbound).get
    t.push(reqSeg)
    assert(t.pendingCalls === 1)
    assert(t.expireBefore(reqSeg.ts + 121000L) === 1)
    assert(t.pendingCalls === 0)
  }

  test("per-key byte cap drops oversized reassembly buffers, stream keeps going") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext

    val connB = allSegments.filter(_.client == "10.0.0.2")
    val ms = MemoryStream[KeyedSegment]
    // cap of 100 bytes: the ~600-byte split get cannot be buffered
    val query = InspectorStream.records(ms.toDS(), maxBufferBytes = 100L,
      withIdleTimeout = false)
      .writeStream.format("memory").queryName("capped_records")
      .outputMode("append").start()
    try {
      // one segment per micro-batch: the cap must fire between batches
      connB.grouped(1).foreach { chunk =>
        ms.addData(chunk); query.processAllAvailable()
      }
      val got = s.table("capped_records")
        .select(col("call_id"), col("inbound")).collect()
        .map(r => (r.getInt(0), r.getBoolean(1))).toSet
      // the big get request (call 1 inbound) was dropped by the cap;
      // later frames on the same connection still decode
      assert(!got.contains((1, true)))
      assert(got.contains((2, true)) && got.contains((3, true)))
    } finally query.stop()
  }
}
