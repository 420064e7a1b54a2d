package graft.ops

import graft.SparkSpec

class Mp4BoxesSpec extends SparkSpec {

  private def mkSamples(n: Int): Seq[Array[Byte]] =
    (0 until n).map(i => Array.tabulate[Byte](10 + i)(j => (i * 31 + j).toByte))

  test("writer round-trip: every frame's offset/size points at its mdat bytes") {
    val samples = mkSamples(10)
    val blob = Mp4Boxes.writeMp4(samples, keyframes1 = Some(Seq(1, 5, 9)), chunksOf = 3)
    val frames = Mp4Boxes.videoFrames(blob)
    assert(frames.length == 10)
    frames.zip(samples).foreach { case (f, expected) =>
      val actual = java.util.Arrays.copyOfRange(blob, f.offset.toInt,
        f.offset.toInt + f.size)
      assert(actual.sameElements(expected), s"frame ${f.index} bytes differ")
    }
    assert(frames.filter(_.keyframe).map(_.index) == Seq(0, 4, 8))
  }

  test("no stss box means every frame is a keyframe") {
    val blob = Mp4Boxes.writeMp4(mkSamples(5), keyframes1 = None)
    val frames = Mp4Boxes.videoFrames(blob)
    assert(frames.length == 5 && frames.forall(_.keyframe))
  }

  test("partial last chunk is laid out and parsed correctly") {
    // 7 samples, 3 per chunk -> chunks of 3/3/1
    val samples = mkSamples(7)
    val blob = Mp4Boxes.writeMp4(samples, None, chunksOf = 3)
    val frames = Mp4Boxes.videoFrames(blob)
    assert(frames.length == 7)
    frames.zip(samples).foreach { case (f, expected) =>
      assert(java.util.Arrays.copyOfRange(blob, f.offset.toInt,
        f.offset.toInt + f.size).sameElements(expected))
    }
  }

  test("non-MP4, truncated and bit-flipped blobs never throw") {
    val rnd = new scala.util.Random(777)
    assert(Mp4Boxes.videoFrames(Array.empty[Byte]).isEmpty)
    assert(Mp4Boxes.videoFrames("GIF89a".getBytes).isEmpty)
    for (len <- Seq(1, 8, 12, 64, 500)) {
      val junk = new Array[Byte](len); rnd.nextBytes(junk)
      Mp4Boxes.videoFrames(junk) // must not throw
    }
    val good = Mp4Boxes.writeMp4(mkSamples(6), Some(Seq(1)))
    for (cut <- 0 until good.length by 7) {
      val frames = Mp4Boxes.videoFrames(java.util.Arrays.copyOf(good, cut))
      // whatever parses must stay in bounds
      frames.foreach(f => assert(f.offset + f.size <= cut))
    }
    for (_ <- 1 to 500) {
      val t = good.clone()
      t(rnd.nextInt(t.length)) = rnd.nextInt(256).toByte
      val frames = Mp4Boxes.videoFrames(t) // must not throw
      frames.foreach(f => assert(f.offset >= 0 && f.offset + f.size <= t.length))
    }
  }

  test("hostile declared sample count is rejected, not allocated") {
    // hand-build an stsz claiming 2^31-ish samples inside a valid shell
    val good = Mp4Boxes.writeMp4(mkSamples(3), None)
    // find stsz and overwrite its sample_count field with a huge value
    val idx = good.indexOfSlice("stsz".getBytes)
    assert(idx > 0)
    val t = good.clone()
    // payload: version/flags(4) + sample_size(4) + sample_count(4)
    val countOff = idx + 4 + 8
    t(countOff) = 0x7f.toByte; t(countOff + 1) = 0xff.toByte
    t(countOff + 2) = 0xff.toByte; t(countOff + 3) = 0xff.toByte
    assert(Mp4Boxes.videoFrames(t).isEmpty)
  }

  test("zero-samples-per-chunk stsc run is rejected (chunk-loop spin guard)") {
    val good = Mp4Boxes.writeMp4(mkSamples(6), None, chunksOf = 3)
    val idx = good.indexOfSlice("stsc".getBytes)
    assert(idx > 0)
    // first run: first_chunk(4) at +8, samples_per_chunk(4) at +12
    val t = good.clone()
    val spcOff = idx + 4 + 8 + 4
    t(spcOff) = 0; t(spcOff + 1) = 0; t(spcOff + 2) = 0; t(spcOff + 3) = 0
    assert(Mp4Boxes.videoFrames(t).isEmpty)
  }

  test("malformed stss rejects the blob instead of flipping all sync flags") {
    val good = Mp4Boxes.writeMp4(mkSamples(6), Some(Seq(1, 4)))
    val idx = good.indexOfSlice("stss".getBytes)
    assert(idx > 0)
    val t = good.clone()
    val countOff = idx + 4 + 4 // payload: version/flags(4) then entry_count
    t(countOff) = 0x7f.toByte; t(countOff + 1) = 0xff.toByte
    t(countOff + 2) = 0xff.toByte; t(countOff + 3) = 0xff.toByte
    assert(Mp4Boxes.videoFrames(t).isEmpty)
  }

  test("sampleFrames keeps every 4th MP4 frame with real data checksums") {
    val samples = mkSamples(9)
    val blob = Mp4Boxes.writeMp4(samples, None)
    val out = Multimodal.sampleFrames(7L, blob).toSeq
    assert(out.map(_.frame_idx) == Seq(0, 4, 8))
    def crc(a: Array[Byte]): Long = a.foldLeft(0L)((c, b) => c * 31 + (b & 0xff))
    assert(out.map(_.checksum) == Seq(crc(samples(0)), crc(samples(4)), crc(samples(8))))
    assert(out.map(_.n_bytes) == Seq(10, 14, 18))
  }
}
