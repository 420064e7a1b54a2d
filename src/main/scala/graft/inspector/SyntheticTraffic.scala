package graft.inspector

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}

import graft.pcap.{LinkDecode, PcapFile}
import graft.proto.ProtoWire.{writer, Writer}

/** Deterministic synthetic HBase traffic, hand-encoded with the ProtoWire
  * writer and wrapped in real Ethernet/IPv4/TCP/pcap bytes (SURVEY §6:
  * "synthetic pcap bytes generated in-test; protobuf messages hand-encoded
  * via ProtoWire writer"). Exercises every decode path the reference's own
  * test traffic does (test/hbase_packet_inspector/hbase_test.clj cases):
  * get, the four scan flavors, mutate (+check-and-), multi (+single-action
  * merge, per-action exceptions), bulk-load, header-level errors, an
  * unknown-call-id response, a frame split across TCP segments, two frames
  * coalesced in one segment (Nagle), and non-RPC noise the `valid-length?`
  * heuristic must skip (connection preamble, mid-stream fragments).
  */
object SyntheticTraffic {

  final val Server = "10.0.0.99"
  final val Port = 16020
  private val T0 = 1600000000000L // ms

  // --- proto builders ----------------------------------------------------

  private def hex32(table: String): String =
    (f"${math.abs(table.hashCode)}%08x" * 4).take(32)

  def regionName(table: String): String =
    s"$table,startkey,1630000000000.${hex32(table)}."

  def encodedRegion(table: String): String = hex32(table)

  private def regionSpec(table: String): Writer =
    writer.varint(1, 1L).bytes(2, regionName(table).getBytes(UTF_8))

  private def reqHeader(callId: Int, method: String): Writer =
    writer.varint(1, callId.toLong).string(3, method).bool(4, true)

  private def resHeader(callId: Int, error: Option[String] = None): Writer = {
    val w = writer.varint(1, callId.toLong)
    error.fold(w)(e => w.msg(2, writer.string(1, e)))
  }

  /** 4-byte length prefix + delimited header (+ delimited body). */
  private def frame(parts: Writer*): Array[Byte] = {
    val body = parts.toArray.flatMap(_.toDelimitedBytes)
    val out = new ByteArrayOutputStream(body.length + 4)
    val n = body.length
    out.write((n >>> 24) & 0xff); out.write((n >>> 16) & 0xff)
    out.write((n >>> 8) & 0xff); out.write(n & 0xff)
    out.write(body, 0, body.length)
    out.toByteArray
  }

  private def mutationProto(mtype: Long, row: String, qualifierValues: Int,
                            assocCells: Int, durability: Long = 0L): Writer = {
    val w = writer.bytes(1, row.getBytes(UTF_8)).varint(2, mtype)
    if (qualifierValues > 0) {
      val cv = writer.bytes(1, "cf".getBytes(UTF_8))
      (0 until qualifierValues).foreach(i =>
        cv.msg(2, writer.bytes(1, s"q$i".getBytes(UTF_8))))
      w.msg(3, cv)
    }
    w.varint(6, durability)
    if (assocCells > 0) w.varint(8, assocCells.toLong)
    w
  }

  private def result(cells: Int): Writer = writer.varint(2, cells.toLong)

  private def scanResponse(scannerId: Long, cellsPerResult: Seq[Long]): Writer = {
    val w = writer
    cellsPerResult.foreach(c => w.varint(1, c))
    w.varint(2, scannerId)
  }

  // --- traffic -----------------------------------------------------------

  /** (tsMillis, clientAddr, clientPort, inbound, payload) */
  private type Event = (Long, String, Int, Boolean, Array[Byte])

  private def connA: Seq[Event] = {
    val c = "10.0.0.1"; val p = 40001
    def req(t: Long, f: Array[Byte]): Event = (T0 + t, c, p, true, f)
    def res(t: Long, f: Array[Byte]): Event = (T0 + t, c, p, false, f)
    Seq(
      // 1: get + response (2 result cells + 2 associated)
      req(0, frame(reqHeader(1, "Get"),
        writer.msg(1, regionSpec("tget")).msg(2,
          writer.bytes(1, "row1".getBytes(UTF_8))
            .msg(2, writer.bytes(1, "cf".getBytes(UTF_8))
              .bytes(2, "qa".getBytes(UTF_8)).bytes(2, "qb".getBytes(UTF_8)))))),
      res(5, frame(resHeader(1), writer.msg(1,
        writer.msg(1, writer.bytes(1, "c".getBytes(UTF_8)))
          .msg(1, writer.bytes(1, "c".getBytes(UTF_8))).varint(2, 2L)))),
      // 2-4: scan lifecycle open -> next -> close
      req(10, frame(reqHeader(2, "Scan"),
        writer.msg(1, regionSpec("tscan"))
          .msg(2, writer.bytes(3, "aaa".getBytes(UTF_8))
            .bytes(4, "zzz".getBytes(UTF_8)).varint(17, 100L)))),
      res(12, frame(resHeader(2), scanResponse(7001L, Seq(10L)))),
      req(20, frame(reqHeader(3, "Scan"), writer.varint(3, 7001L).varint(4, 20L))),
      res(22, frame(resHeader(3), scanResponse(7001L, Seq(10L, 5L)))),
      req(30, frame(reqHeader(4, "Scan"), writer.varint(3, 7001L).bool(5, true))),
      res(31, frame(resHeader(4), scanResponse(7001L, Nil))),
      // 5: put (2 qualifier-values + 1 associated; sync_wal)
      req(40, frame(reqHeader(5, "Mutate"),
        writer.msg(1, regionSpec("tmut")).msg(2, mutationProto(2L, "prow", 2, 1, 3L)))),
      res(44, frame(resHeader(5), writer.msg(1, result(0)))),
      // 6: multi, 3 actions over 2 regions; response has one exception
      req(50, frame(reqHeader(6, "Multi"), writer
        .msg(1, writer.msg(1, regionSpec("t1"))
          .msg(3, writer.msg(3, writer.bytes(1, "g1".getBytes(UTF_8))))
          .msg(3, writer.msg(2, mutationProto(2L, "p1", 2, 0))))
        .msg(1, writer.msg(1, regionSpec("t2"))
          .msg(3, writer.msg(2, mutationProto(3L, "d1", 0, 1)))))),
      res(55, frame(resHeader(6), writer
        .msg(1, writer
          .msg(1, writer.msg(2, result(1)))
          .msg(1, writer.msg(3, writer.string(1, "org.foo.PerActionError"))))
        .msg(1, writer.msg(1, writer.msg(2, result(2)))))),
      // 7: single-action multi (merged into parent by shaping)
      req(60, frame(reqHeader(7, "Multi"), writer
        .msg(1, writer.msg(1, regionSpec("t3"))
          .msg(3, writer.msg(2, mutationProto(2L, "solo", 2, 0)))))),
      res(62, frame(resHeader(7), writer
        .msg(1, writer.msg(1, writer.msg(2, result(2)))))),
      // 8: check-and-put, response carries a header-level exception
      req(70, frame(reqHeader(8, "Mutate"),
        writer.msg(1, regionSpec("tmut")).msg(2, mutationProto(2L, "crow", 1, 0))
          .msg(3, writer.bytes(1, "crow".getBytes(UTF_8))))),
      res(72, frame(
        resHeader(8, Some("org.apache.hadoop.hbase.exceptions.FailedSanityCheckException")))),
      // 9: bulk-load-hfile
      req(80, frame(reqHeader(9, "BulkLoadHFile"), writer.msg(1, regionSpec("tbulk")))),
      res(81, frame(resHeader(9), writer.varint(1, 1L))),
      // 10: small-scan (open+close in one)
      req(90, frame(reqHeader(10, "Scan"),
        writer.msg(1, regionSpec("tsmall"))
          .msg(2, writer.bytes(3, "k".getBytes(UTF_8))).bool(5, true))),
      res(92, frame(resHeader(10), scanResponse(0L, Seq(3L)))),
      // 11: get answered by a HEADER-ONLY exception response (no body —
      // the normal wire shape for e.g. NotServingRegionException)
      req(95, frame(reqHeader(11, "Get"),
        writer.msg(1, regionSpec("tget")).msg(2,
          writer.bytes(1, "missing".getBytes(UTF_8))))),
      res(97, frame(
        resHeader(11, Some("org.apache.hadoop.hbase.NotServingRegionException")))))
  }

  private def connB: Seq[Event] = {
    val c = "10.0.0.2"; val p = 40002
    // big get split across two TCP segments
    val big = frame(reqHeader(1, "Get"),
      writer.msg(1, regionSpec("tbig")).msg(2,
        writer.bytes(1, ("k" * 600).getBytes(UTF_8))))
    val (bigA, bigB) = big.splitAt(big.length / 2)
    // two coalesced requests in one segment (Nagle)
    val coalesced = frame(reqHeader(2, "Get"),
      writer.msg(1, regionSpec("tco")).msg(2, writer.bytes(1, "r2".getBytes(UTF_8)))) ++
      frame(reqHeader(3, "Mutate"),
        writer.msg(1, regionSpec("tco")).msg(2, mutationProto(2L, "r3", 1, 0)))
    val coalescedRes = frame(resHeader(2), writer.msg(1, result(1))) ++
      frame(resHeader(3), writer.msg(1, result(0)))
    Seq(
      (T0 + 100, c, p, true, bigA),
      (T0 + 101, c, p, true, bigB),
      (T0 + 105, c, p, false, frame(resHeader(1), writer.msg(1, result(1)))),
      (T0 + 110, c, p, true, coalesced),
      (T0 + 115, c, p, false, coalescedRes),
      // response with no matching request -> method "unknown"
      (T0 + 120, c, p, false, frame(resHeader(99))))
  }

  /** Noise the heuristic must skip: a connection preamble ("HBas" reads as
    * an absurd length) and a mid-stream fragment with no buffered state.
    */
  private def noise: Seq[Event] = Seq(
    (T0 + 130, "10.0.0.3", 40003, true, "HBas P".getBytes(UTF_8)),
    (T0 + 135, "10.0.0.4", 40004, false, Array.fill[Byte](40)(0x7f)))

  private def toPcap(events: Seq[Event]): Array[Byte] = {
    val w = new PcapFile.Writer
    events.foreach { case (ts, client, cport, inbound, payload) =>
      val fr =
        if (inbound) LinkDecode.encode(client, cport, Server, Port, payload)
        else LinkDecode.encode(Server, Port, client, cport, payload)
      w.record(ts * 1000L, fr)
    }
    w.toBytes
  }

  /** Expected record counts (used by specs): 14 requests, 15 responses. */
  val ExpectedRequests = 14
  val ExpectedResponses = 15

  /** Writes the two capture files under a content-hashed directory (a
    * plain existence check would silently reuse stale fixtures from an
    * older code version across JVMs sharing /tmp); writes go through a
    * temp file + atomic move so concurrent JVMs never see partial bytes.
    * Returns the directory.
    */
  def ensurePcapDir(): String = synchronized {
    val file1 = toPcap(connA)
    val file2 = toPcap(connB ++ noise)
    val hash = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(file1); md.update(file2)
      md.digest().take(4).map(b => f"${b & 0xff}%02x").mkString
    }
    val tmpRoot = Paths.get(sys.props("java.io.tmpdir"))
    val dir: Path = tmpRoot.resolve(s"graft_synth_pcap_$hash")
    // best-effort cleanup of fixtures minted by older traffic versions
    // (content-hashed dirs would otherwise accumulate forever)
    try {
      val listing = Files.list(tmpRoot)
      try listing.iterator().forEachRemaining { p =>
          val n = p.getFileName.toString
          if (n.startsWith("graft_synth_pcap") && p != dir) {
            val walk = Files.walk(p)
            try {
              import scala.jdk.CollectionConverters._
              walk.iterator().asScala.toSeq.sortBy(-_.getNameCount)
                .foreach(Files.deleteIfExists(_))
            } finally walk.close()
          }
        }
      finally listing.close()
    } catch { case _: Throwable => () }
    Files.createDirectories(dir)
    Seq("capture-00001.pcap" -> file1, "capture-00002.pcap" -> file2)
      .foreach { case (name, bytes) =>
        val target = dir.resolve(name)
        if (!Files.exists(target)) {
          // hidden "."-prefixed temp name: the binaryFile source must never
          // list a half-written or orphaned temp as a capture
          val tmp = Files.createTempFile(dir, "." + name, ".tmp")
          Files.write(tmp, bytes)
          try Files.move(tmp, target, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          catch { case _: java.nio.file.FileAlreadyExistsException =>
            Files.deleteIfExists(tmp)
          }
        }
      }
    dir.toString
  }

  /** Bulk capture generator for pipeline throughput benchmarking
    * ([[graft.PcapBench]]): `conns` connections, each running `calls`
    * generator iterations — a get/put mix where every 16th iteration
    * emits a full scan open→next→close (3 round-trips), so a connection
    * carries `calls + 2*(calls/16)` round-trips total — split round-robin
    * by CONNECTION across `files` rotated captures. Returns (dir, request
    * count, response count); the CALLER owns deleting the directory.
    */
  def bulkPcapDir(conns: Int, calls: Int, files: Int): (String, Long, Long) = {
    require(conns > 0 && calls > 0 && files > 0)
    // second client-IP octet is 1 + (c >> 8): past 65280 connections it
    // would exceed 255 and LinkDecode would silently mask it to 0,
    // desyncing the generated client string from the decoded address
    require(conns <= 65280, s"conns=$conns exceeds the client-IP space")
    val dir = Files.createTempDirectory("graft_bulk_pcap")
    var nReq = 0L
    var nRes = 0L
    for (f <- 0 until files) {
      val w = new PcapFile.Writer
      for (c <- f until conns by files) {
        val client = s"10.${1 + ((c >> 8) & 0xff)}.${c & 0xff}.7"
        val cport = 30000 + (c % 20000)
        var ts = T0 + c // stagger connections
        var callId = 0
        def emit(inbound: Boolean, frameBytes: Array[Byte]): Unit = {
          val fr =
            if (inbound) LinkDecode.encode(client, cport, Server, Port, frameBytes)
            else LinkDecode.encode(Server, Port, client, cport, frameBytes)
          w.record(ts * 1000L, fr)
          ts += 1
          if (inbound) nReq += 1 else nRes += 1
        }
        var i = 0
        while (i < calls) {
          callId += 1
          if (i % 16 == 15) { // scan open -> next -> close
            emit(inbound = true, frame(reqHeader(callId, "Scan"),
              writer.msg(1, regionSpec("tbulkscan"))
                .msg(2, writer.bytes(3, s"r$i".getBytes(UTF_8)).varint(17, 50L))))
            emit(inbound = false, frame(resHeader(callId),
              scanResponse(900000L + c, Seq(8L))))
            callId += 1
            emit(inbound = true, frame(reqHeader(callId, "Scan"),
              writer.varint(3, 900000L + c).varint(4, 20L)))
            emit(inbound = false, frame(resHeader(callId),
              scanResponse(900000L + c, Seq(8L, 4L))))
            callId += 1
            emit(inbound = true, frame(reqHeader(callId, "Scan"),
              writer.varint(3, 900000L + c).bool(5, true)))
            emit(inbound = false, frame(resHeader(callId),
              scanResponse(900000L + c, Nil)))
          } else if (i % 2 == 0) { // get
            emit(inbound = true, frame(reqHeader(callId, "Get"),
              writer.msg(1, regionSpec("tbulkget")).msg(2,
                writer.bytes(1, s"row$i".getBytes(UTF_8))
                  .msg(2, writer.bytes(1, "cf".getBytes(UTF_8))
                    .bytes(2, "q".getBytes(UTF_8))))))
            emit(inbound = false, frame(resHeader(callId),
              writer.msg(1, writer.varint(2, 1L))))
          } else { // put
            emit(inbound = true, frame(reqHeader(callId, "Mutate"),
              writer.msg(1, regionSpec("tbulkput"))
                .msg(2, mutationProto(2L, s"prow$i", 2, 0, 3L))))
            emit(inbound = false, frame(resHeader(callId),
              writer.msg(1, result(0))))
          }
          i += 1
        }
      }
      Files.write(dir.resolve(f"capture-$f%05d.pcap"), w.toBytes)
    }
    (dir.toString, nReq, nRes)
  }
}
