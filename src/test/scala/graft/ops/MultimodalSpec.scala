package graft.ops

import org.apache.spark.sql.types._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("q41 schema contract: typed features, no raw bytes in output") {
    val dir = docsDir(Seq((1L, "some media payload"), (2L, "x")))
    val df = Multimodal.queries("q41_multimodal")(spark, dir)
    assert(df.schema.fieldNames.toSeq ===
      Seq("doc_id", "media_type", "n_bytes", "width", "height", "checksum"))
    assert(df.schema("n_bytes").dataType === LongType)
    assert(df.schema("width").dataType === IntegerType)
    assert(!df.schema.fields.exists(_.dataType == BinaryType))
  }

  test("q42 frame sampling: every 4th fixed-size frame, checksummed") {
    val text = "x" * 200 // 200 bytes -> frames of 32: indices 0..6, last=8 bytes
    val dir = docsDir(Seq((1L, text)))
    val rows = Multimodal.queries("q42_frame_sample")(spark, dir)
      .orderBy("frame_idx").collect()
    assert(rows.map(_.getInt(1)).toSeq === Seq(0, 4)) // 7 frames, stride 4
    assert(rows(0).getInt(2) === 32)
    var crc = 0L
    Array.fill[Byte](32)('x').foreach(b => crc = crc * 31 + (b & 0xff))
    assert(rows(0).getLong(3) === crc)
  }

  test("q41 stub decode is deterministic over the blob bytes") {
    val text = "some media payload"
    val dir = docsDir(Seq((1L, text)))
    val row = Multimodal.queries("q41_multimodal")(spark, dir).collect()(0)
    var crc = 0L
    text.getBytes("UTF-8").foreach(b => crc = crc * 31 + (b & 0xff))
    assert(row.getLong(2) === text.getBytes("UTF-8").length.toLong)
    assert(row.getLong(5) === crc)
    assert(row.getInt(3) === math.abs((crc % 1920).toInt) + 1)
    assert(row.getInt(4) === math.abs((crc % 1080).toInt) + 1)
  }
}
