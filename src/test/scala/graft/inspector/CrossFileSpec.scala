package graft.inspector

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pcap.{LinkDecode, PcapFile}
import graft.proto.ProtoWire.writer

/** tcpdump rotates capture files mid-connection; the batch pipeline must
  * stitch a frame whose halves live in DIFFERENT files (ts-ordered walk
  * inside the connection's partition).
  */
class CrossFileSpec extends SparkSpec {

  test("a frame split across two rotated capture files reassembles") {
    val client = "10.7.7.7"; val port = 41000
    val header = writer.varint(1, 77L).string(3, "Get").bool(4, true)
    val get = writer.msg(1, writer.varint(1, 1L)
      .bytes(2, SyntheticTraffic.regionName("tsplit").getBytes("UTF-8")))
      .msg(2, writer.bytes(1, ("r" * 300).getBytes("UTF-8")))
    val body = header.toDelimitedBytes ++ get.toDelimitedBytes
    val frame = Array[Byte](
      (body.length >>> 24).toByte, (body.length >>> 16).toByte,
      (body.length >>> 8).toByte, body.length.toByte) ++ body
    val (half1, half2) = frame.splitAt(frame.length / 2)

    def pcap(ts: Long, payload: Array[Byte]): Array[Byte] =
      (new PcapFile.Writer).record(ts * 1000L,
        LinkDecode.encode(client, port, SyntheticTraffic.Server,
          SyntheticTraffic.Port, payload)).toBytes

    val dir = Files.createTempDirectory("graft_crossfile")
    Files.write(dir.resolve("rot-1.pcap"), pcap(1000L, half1))
    Files.write(dir.resolve("rot-2.pcap"), pcap(2000L, half2))

    val reqs = Inspector.requests(Inspector.records(spark, dir.toString))
    val rows = reqs.filter(col("client") === client).collect()
    assert(rows.length === 1)
    assert(rows(0).getAs[String]("method") === "get")
    assert(rows(0).getAs[String]("row") === "r" * 300)
    assert(rows(0).getAs[Int]("call_id") === 77)
  }
}
