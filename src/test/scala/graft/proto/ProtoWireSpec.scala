package graft.proto

import org.scalatest.funsuite.AnyFunSuite

import ProtoWire._

class ProtoWireSpec extends AnyFunSuite {

  test("varint round-trip incl. 10-byte negatives") {
    for (v <- Seq(0L, 1L, 127L, 128L, 300L, 0xFFFFFFFFL, Long.MaxValue, -1L, Long.MinValue)) {
      val bytes = writer.writeRawVarint(v).toBytes
      assert(new Reader(bytes).readVarint() === v, s"value $v")
    }
    // -1 encodes as ten 0xFF..0x01 bytes on the wire
    assert(writer.writeRawVarint(-1L).toBytes.length === 10)
  }

  test("zigzag") {
    for (v <- Seq(0L, -1L, 1L, -2L, Long.MaxValue, Long.MinValue))
      assert(zigzagDecode(zigzagEncode(v)) === v)
    assert(zigzagEncode(-1L) === 1L)
    assert(zigzagEncode(1L) === 2L)
  }

  test("message round-trip: varint, fixed, bytes, nested msg, repeated") {
    val inner = writer.varint(1, 42L).string(2, "hello")
    val m = writer
      .varint(1, 7L)
      .fixed32(2, -5)
      .fixed64(3, Long.MinValue)
      .string(4, "héllo∆")           // non-ASCII utf-8
      .msg(5, inner)
      .varint(6, 1L).varint(6, 2L).varint(6, 3L) // repeated
    val p = parse(m.toBytes)
    assert(p.varint(1) === Some(7L))
    assert(p.fields(2).head === Fixed32V(-5))
    assert(p.fields(3).head === Fixed64V(Long.MinValue))
    assert(p.string(4) === Some("héllo∆"))
    val pi = p.msg(5).get
    assert(pi.varint(1) === Some(42L))
    assert(pi.string(2) === Some("hello"))
    assert(p.varints(6) === Vector(1L, 2L, 3L))
  }

  test("duplicated scalar field resolves last-wins (proto2 semantics)") {
    val m = parse(writer.varint(1, 10L).varint(1, 20L)
      .string(2, "first").string(2, "second").toBytes)
    assert(m.varint(1) === Some(20L))
    assert(m.string(2) === Some("second"))
  }

  test("delimited round-trip") {
    val body = writer.varint(1, 99L)
    val r = new Reader(body.toDelimitedBytes)
    val m = parse(r.readDelimited())
    assert(m.varint(1) === Some(99L))
    assert(!r.hasRemaining)
  }

  test("truncated input throws TruncatedException") {
    val full = writer.string(1, "abcdefgh").toBytes
    for (cut <- 1 until full.length) {
      val sliced = full.take(cut)
      assertThrows[TruncatedException](parse(sliced))
    }
    assertThrows[TruncatedException](new Reader(Array[Byte](0x08)).readSlice(5))
  }

  test("packed repeated varints readable via Reader loop") {
    val packed = {
      val w = writer
      Seq(3L, 270L, 86942L).foreach(w.writeRawVarint)
      writer.bytes(4, w.toBytes).toBytes
    }
    val m = parse(packed)
    val r = new Reader(m.bytes(4).get)
    val out = Vector.newBuilder[Long]
    while (r.hasRemaining) out += r.readVarint()
    assert(out.result() === Vector(3L, 270L, 86942L))
  }

  test("groups (wire types 3/4) rejected") {
    // tag: field 1, wire type 3
    assertThrows[TruncatedException](parse(Array[Byte]((1 << 3 | 3).toByte)))
  }
}
