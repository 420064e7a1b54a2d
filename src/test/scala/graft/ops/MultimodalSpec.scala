package graft.ops

import org.apache.spark.sql.types._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("q41 schema contract: typed features, no raw bytes in output") {
    val dir = docsDir(Seq((1L, "some media payload"), (2L, "x")))
    val df = Multimodal.queries("q41_multimodal")(spark, dir)
    assert(df.schema.fieldNames.toSeq ===
      Seq("doc_id", "media_type", "n_bytes", "width", "height", "checksum", "phash"))
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

  test("q42 even-id docs go through the REAL MP4 container walk") {
    val text = "y" * 200 // 5 mp4 samples of 48 + one of 8; stride 4 -> 0, 4
    val dir = docsDir(Seq((2L, text)))
    val rows = Multimodal.queries("q42_frame_sample")(spark, dir)
      .orderBy("frame_idx").collect()
    assert(rows.map(_.getInt(1)).toSeq === Seq(0, 4))
    // MP4 sample sizes (48, 8), not raw 32-byte chunks — proves the
    // container path ran, and the checksum covers the mdat bytes
    assert(rows.map(_.getInt(2)).toSeq === Seq(48, 8))
    var crc48 = 0L
    Array.fill[Byte](48)('y').foreach(b => crc48 = crc48 * 31 + (b & 0xff))
    assert(rows(0).getLong(3) === crc48)
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

  // --- REAL image header decode (round-3 verdict item 10) ----------------

  /** Render a real image via the JDK's own encoder — the parser must agree
    * with a second, independent implementation, not with itself.
    */
  private def imageBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, (x * 31 + y) & 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  test("ImageHeaders: real PNG/JPEG/GIF dimensions parsed from bytes") {
    assert(ImageHeaders.parse(imageBytes("png", 13, 7))
      === Some(ImageHeaders.ImageInfo("png", 13, 7)))
    assert(ImageHeaders.parse(imageBytes("jpg", 31, 17))
      === Some(ImageHeaders.ImageInfo("jpeg", 31, 17)))
    assert(ImageHeaders.parse(imageBytes("gif", 9, 21))
      === Some(ImageHeaders.ImageInfo("gif", 9, 21)))
    // non-images fall through to None (q41's stub path)
    assert(ImageHeaders.parse("just text".getBytes("UTF-8")) === None)
    assert(ImageHeaders.parse(Array.empty[Byte]) === None)
    // a truncated PNG signature must not crash or match
    assert(ImageHeaders.parse(imageBytes("png", 5, 5).take(10)) === None)
  }

  test("decodeMedia: real dimensions for images, stub for everything else") {
    val png = imageBytes("png", 64, 48)
    val real = Multimodal.decodeMedia(1L, "application/octet-stream", png)
    assert(real.media_type === "image/png")
    assert((real.width, real.height) === ((64, 48)))
    assert(real.n_bytes === png.length.toLong)
    val stub = Multimodal.decodeMedia(2L, "text/plain", "hello".getBytes("UTF-8"))
    assert(stub.media_type === "text/plain") // fell back: declared type kept
  }

  test("decodeMedia: decompression-bomb header skips pixel decode, keeps dims") {
    // a real PNG whose IHDR is patched to DECLARE 60000x60000: ImageIO
    // would allocate w*h*4 bytes (an OutOfMemoryError — an Error, fatal to
    // the executor), so decodeMedia must gate on the header dims and skip
    // the pixel pass: header dimensions kept, phash 0, no throw
    val bomb = imageBytes("png", 8, 8)
    def putU32(o: Int, v: Long): Unit = {
      bomb(o) = ((v >> 24) & 0xff).toByte; bomb(o + 1) = ((v >> 16) & 0xff).toByte
      bomb(o + 2) = ((v >> 8) & 0xff).toByte; bomb(o + 3) = (v & 0xff).toByte
    }
    putU32(16, 60000L) // IHDR width
    putU32(20, 60000L) // IHDR height
    val f = Multimodal.decodeMedia(3L, "application/octet-stream", bomb)
    assert(f.media_type === "image/png")
    assert((f.width, f.height) === ((60000, 60000)))
    assert(f.phash === 0L)
  }

  /** Minimal hand-built animated GIF: header, 4x3 logical screen, no
    * color tables, `n` frames of varying geometry, trailer. The walker
    * reads structure only, so the "pixel" sub-blocks are arbitrary bytes.
    */
  private def animatedGif(n: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(Array[Byte](4, 0, 3, 0, 0, 0, 0)) // LSD: 4x3, no GCT
    for (i <- 0 until n) {
      out.write(0x2c)                       // image descriptor
      out.write(Array[Byte](i.toByte, 0, 0, 0)) // left=i, top=0
      out.write(Array[Byte](2, 0, 1, 0, 0))     // 2x1, no LCT
      out.write(2)                          // LZW min code size
      out.write(3); out.write(Array[Byte](7, 7, 7)) // one 3-byte sub-block
      out.write(0)                          // sub-block terminator
    }
    out.write(0x3b)
    out.toByteArray
  }

  test("gifFrames: real frame boundaries from an animated GIF container") {
    val frames = ImageHeaders.gifFrames(animatedGif(5))
    assert(frames.map(_.index) === Seq(0, 1, 2, 3, 4))
    // dataBytes = compressed pixel DATA only (3-byte sub-block), prefix excluded
    assert(frames.forall(f => f.width == 2 && f.height == 1 && f.dataBytes == 3))
    assert(frames.map(_.left) === Seq(0, 1, 2, 3, 4))
    // non-GIF and pre-frame truncation yield no frames, never throw
    assert(ImageHeaders.gifFrames("not a gif".getBytes) === Seq.empty)
    assert(ImageHeaders.gifFrames(animatedGif(3).take(12)) === Seq.empty)
    // a blob cut mid-frame (partial download) keeps the full frames before
    // the tear instead of dropping everything
    val torn = animatedGif(3).dropRight(8)
    assert(ImageHeaders.gifFrames(torn).map(_.index) === Seq(0, 1))
  }

  test("sampleFrames: GIF path keeps every 4th REAL frame; others stub-chunk") {
    val sampled = Multimodal.sampleFrames(1L, animatedGif(9)).toSeq
    assert(sampled.map(_.frame_idx) === Seq(0, 4, 8))
    assert(sampled.forall(_.n_bytes == 3)) // compressed data size, per container
    val stub = Multimodal.sampleFrames(2L, ("y" * 100).getBytes).toSeq
    assert(stub.map(_.frame_idx) === Seq(0)) // 4 chunks of 32 -> index 0 only
  }

  test("aHash: perceptual fingerprint separates near-dups from different images") {
    def gradient(invert: Boolean): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 64; y <- 0 until 64) {
        val lum = math.min(255, x * 4)
        val v = if (invert) 255 - lum else lum
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val base = gradient(invert = false)
    val h1 = Multimodal.aHash(base)
    // a small local edit: same hash neighborhood
    val edited = new java.awt.image.BufferedImage(64, 64,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = edited.createGraphics(); g.drawImage(base, 0, 0, null); g.dispose()
    for (x <- 0 until 4; y <- 0 until 4) edited.setRGB(x, y, 0xffffff)
    assert(hamming(h1, Multimodal.aHash(edited)) <= 8)
    // structurally different content: far in hamming space
    assert(hamming(h1, Multimodal.aHash(gradient(invert = true))) >= 16)
    // decodeMedia surfaces a real nonzero phash for real images...
    val png = imageBytes("png", 32, 32)
    val feat = Multimodal.decodeMedia(1L, "bin", png)
    assert(feat.phash !== 0L)
    assert(feat.phash === Multimodal.aHash(
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))))
    // ...and 0 on the stub path
    assert(Multimodal.decodeMedia(2L, "bin", "words".getBytes).phash === 0L)
  }

  test("imageNearDupPairs: edited copy found, different image not, stubs excluded") {
    val s = spark
    import s.implicits._
    // three real PNGs: a gradient, a lightly-edited copy, an inverted one
    def gradPng(invert: Boolean, patch: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 64; y <- 0 until 64) {
        val lum = math.min(255, x * 4)
        val v = if (invert) 255 - lum else lum
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      if (patch) for (x <- 0 until 4; y <- 0 until 4) img.setRGB(x, y, 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val blobs = Seq(
      (1L, gradPng(invert = false, patch = false)),
      (2L, gradPng(invert = false, patch = true)),
      (3L, gradPng(invert = true, patch = false)),
      (4L, "not an image".getBytes("UTF-8"))) // stub: excluded from pairing
    val feats = blobs.toDF("doc_id", "blob").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) => Multimodal.decodeMedia(id, "bin", b) })
      .toDF()
    val got = Multimodal.imageNearDupPairs(feats).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L)))
  }

  test("q58 media near-dup: planted image and audio groups pair; nothing crosses kind or group") {
    // 32 docs = two full plant groups (ids 0-15 → gid 0, 16-31 → gid 1),
    // each 8 images (even ids) + 8 audio clips (odd ids, gain variants)
    val dir = docsDir((0L until 32L).map(i => (i, s"doc $i text")))
    val out = graft.SparkEntry.queries("q58_media_neardup")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(out.nonEmpty)
    out.foreach { case (kind, a, b, h) =>
      assert(a >> 4 === b >> 4, s"cross-group pair $a-$b")
      assert(a % 2 === b % 2, s"cross-kind pair $a-$b")
      assert((a % 2 == 0) === (kind == "image"))
      assert(h <= 8)
    }
    // both kinds pair in both groups
    assert(out.map(p => (p._1, p._2 >> 4)).toSet ===
      Set(("image", 0L), ("image", 1L), ("audio", 0L), ("audio", 1L)))
    // amplitude variants of one waveform pair up (ids 1 and 3 differ only
    // in gain — the fingerprint is amplitude-invariant)
    assert(out.exists { case (k, a, b, _) => k == "audio" && a == 1L && b == 3L })
    // same-group images are one inverted pixel apart each: hamming ≤ 2
    out.collect { case ("image", _, _, h) => assert(h <= 2) }
  }

  test("ImageHeaders fuzz: random and mutated-image bytes never throw") {
    val rnd = new scala.util.Random(4242)
    for (_ <- 1 to 500) {
      val blob = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(blob)
      ImageHeaders.parse(blob)     // must not throw
      ImageHeaders.gifFrames(blob) // must not throw
    }
    // valid images with random byte flips (torn downloads, bit rot)
    val bases = Seq(imageBytes("png", 8, 8), imageBytes("jpg", 8, 8),
      imageBytes("gif", 8, 8), animatedGif(4))
    for (base <- bases; _ <- 1 to 100) {
      val blob = base.clone()
      blob(rnd.nextInt(blob.length)) = rnd.nextInt(256).toByte
      ImageHeaders.parse(blob)
      ImageHeaders.gifFrames(blob)
      Multimodal.decodeMedia(1L, "bin", blob)
    }
  }

  test("decodeMedia through the distributed pipeline (binary column end to end)") {
    val s = spark
    import s.implicits._
    val png = imageBytes("png", 40, 30)
    val jpg = imageBytes("jpg", 20, 10)
    val feats = Seq((1L, png), (2L, jpg), (3L, "noise".getBytes("UTF-8")))
      .toDF("doc_id", "blob")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) => Multimodal.decodeMedia(id, "bin", b) })
      .collect().map(f => f.doc_id -> ((f.media_type, f.width, f.height))).toMap
    assert(feats(1L) === (("image/png", 40, 30)))
    assert(feats(2L) === (("image/jpeg", 20, 10)))
    assert(feats(3L)._1 === "bin")
  }
}
