package graft.ops

/** Minimal MP4 / ISO-BMFF container walk (public ISO/IEC 14496-12 box
  * layout) for REAL video frame boundaries without any codec: the sample
  * tables inside `moov/trak/mdia/minf/stbl` give every frame's byte
  * offset, size and keyframe flag, which is all frame SAMPLING needs —
  * pixel decode stays out of scope (no codec in the sandbox), exactly the
  * GIF approach of round 4.
  *
  * Parser contract (the [[ImageHeaders]] one): bounds-checked everywhere,
  * arbitrary bytes can never throw or over-allocate; anything malformed
  * yields Seq.empty (or the frames parsed before a torn tail).
  */
object Mp4Boxes {

  /** One video sample (frame): byte range within the blob + sync flag. */
  final case class Mp4Frame(index: Int, offset: Long, size: Int, keyframe: Boolean)

  /** Hostile-input cap: a 4-byte declared sample count can demand a
    * multi-GiB allocation; real clips this library meets stay far below.
    */
  private val MaxSamples = 1 << 20

  private def be32(b: Array[Byte], o: Int): Long =
    if (o < 0 || o + 4 > b.length) -1L
    else ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def be64(b: Array[Byte], o: Int): Long =
    if (o < 0 || o + 8 > b.length) -1L
    else (be32(b, o) << 32) | be32(b, o + 4)

  private def typ(b: Array[Byte], o: Int): String =
    if (o < 0 || o + 4 > b.length) ""
    else new String(Array(b(o), b(o + 1), b(o + 2), b(o + 3)), "ISO-8859-1")

  /** Child boxes of [start, end) as (type, payloadStart, payloadEnd). */
  private def boxes(b: Array[Byte], start: Int, end: Int): Seq[(String, Int, Int)] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    var p = start
    var guard = 0
    while (p + 8 <= end && guard < 4096) {
      guard += 1
      val size32 = be32(b, p)
      val t = typ(b, p + 4)
      val (payload, boxEnd): (Int, Long) =
        if (size32 == 0) (p + 8, end.toLong) // box extends to container end
        else if (size32 == 1) (p + 16, p + be64(b, p + 8))
        else (p + 8, p + size32)
      if (t.isEmpty || boxEnd < payload || boxEnd > end) return out.result()
      out += ((t, payload, boxEnd.toInt))
      p = boxEnd.toInt
    }
    out.result()
  }

  private def child(b: Array[Byte], s: Int, e: Int, t: String): Option[(Int, Int)] =
    boxes(b, s, e).collectFirst { case (`t`, ps, pe) => (ps, pe) }

  /** Frames of the first video (`hdlr` type "vide") track; Seq.empty when
    * the blob is not an MP4 or the sample tables are malformed.
    */
  def videoFrames(b: Array[Byte]): Seq[Mp4Frame] = {
    // cheap sniff: a top-level ftyp box keeps non-MP4 blobs out fast
    if (b.length < 12 || typ(b, 4) != "ftyp") return Seq.empty
    val top = boxes(b, 0, b.length)
    val moov = top.collectFirst { case ("moov", s, e) => (s, e) }
      .getOrElse(return Seq.empty)
    val stbl = boxes(b, moov._1, moov._2).collect { case ("trak", ts, te) => (ts, te) }
      .flatMap { case (ts, te) =>
        for {
          (ms, me) <- child(b, ts, te, "mdia")
          (hs, _)  <- child(b, ms, me, "hdlr")
          // hdlr payload: version/flags(4) + pre_defined(4) + handler_type(4)
          if typ(b, hs + 8) == "vide"
          (ns, ne) <- child(b, ms, me, "minf")
          st       <- child(b, ns, ne, "stbl")
        } yield st
      }.headOption.getOrElse(return Seq.empty)

    val (ss, se) = stbl
    // stsz: version/flags(4) + sample_size(4) + sample_count(4) [+ sizes]
    val sizes: IndexedSeq[Int] = child(b, ss, se, "stsz") match {
      case Some((p, e)) =>
        val fixed = be32(b, p + 4)
        val n = be32(b, p + 8)
        if (n < 0 || n > MaxSamples) return Seq.empty
        if (fixed > 0) IndexedSeq.fill(n.toInt)(fixed.toInt)
        else if (p + 12 + 4L * n > e) return Seq.empty
        else (0 until n.toInt).map(i => be32(b, p + 12 + 4 * i).toInt)
      case None => return Seq.empty
    }
    // stco (32-bit chunk offsets; co64 accepted too)
    val chunkOffsets: IndexedSeq[Long] = child(b, ss, se, "stco") match {
      case Some((p, e)) =>
        val n = be32(b, p + 4)
        if (n < 0 || n > MaxSamples || p + 8 + 4L * n > e) return Seq.empty
        (0 until n.toInt).map(i => be32(b, p + 8 + 4 * i))
      case None => child(b, ss, se, "co64") match {
        case Some((p, e)) =>
          val n = be32(b, p + 4)
          if (n < 0 || n > MaxSamples || p + 8 + 8L * n > e) return Seq.empty
          (0 until n.toInt).map(i => be64(b, p + 8 + 8 * i))
        case None => return Seq.empty
      }
    }
    // stsc: runs of (first_chunk, samples_per_chunk, sample_desc_idx)
    val stscRuns: IndexedSeq[(Int, Int)] = child(b, ss, se, "stsc") match {
      case Some((p, e)) =>
        val n = be32(b, p + 4)
        if (n < 0 || n > MaxSamples || p + 8 + 12L * n > e) return Seq.empty
        (0 until n.toInt).map(i =>
          (be32(b, p + 8 + 12 * i).toInt, be32(b, p + 12 + 12 * i).toInt))
      case None => return Seq.empty
    }
    // spc == 0 is rejected too: a zero-sample chunk run would let a
    // crafted file spin the chunk loop without ever consuming a sample
    if (stscRuns.isEmpty || stscRuns.exists { case (fc, spc) => fc < 1 || spc <= 0 })
      return Seq.empty
    // stss: 1-based keyframe sample numbers; absent = every frame is sync.
    // A MALFORMED stss rejects the blob like every other malformed table
    // (degrading to "no keyframes" would silently flip every sync flag).
    val keyframes: Option[Set[Long]] = child(b, ss, se, "stss") match {
      case None => None
      case Some((p, e)) =>
        val n = be32(b, p + 4)
        if (n < 0 || n > MaxSamples || p + 8 + 4L * n > e) return Seq.empty
        Some((0 until n.toInt).map(i => be32(b, p + 8 + 4 * i)).toSet)
    }

    // expand chunk runs -> per-sample offsets; the run cursor advances
    // monotonically with the chunk loop (stsc first_chunk is ascending
    // per spec), keeping expansion O(chunks + runs), not O(chunks × runs)
    var run = 0
    def samplesInChunk(chunk1: Int): Int = {
      while (run + 1 < stscRuns.length && stscRuns(run + 1)._1 <= chunk1) run += 1
      stscRuns(run)._2
    }
    val out = Seq.newBuilder[Mp4Frame]
    var sample = 0
    var chunk = 0
    while (sample < sizes.length && chunk < chunkOffsets.length) {
      var off = chunkOffsets(chunk)
      var i = 0
      val spc = samplesInChunk(chunk + 1)
      while (i < spc && sample < sizes.length) {
        val sz = sizes(sample)
        if (sz < 0 || off < 0 || off + sz > b.length) return out.result()
        out += Mp4Frame(sample, off,  sz,
          keyframes.forall(_.contains(sample + 1L)))
        off += sz
        sample += 1
        i += 1
      }
      chunk += 1
    }
    out.result()
  }

  /** Minimal MP4 writer for synthesis and tests: one video track, the
    * exact boxes the parser consumes (ftyp + mdat + moov/trak/mdia/hdlr/
    * minf/stbl/{stsz,stsc,stco,stss}), samples grouped `chunksOf` per
    * chunk. `keyframes1` are 1-based sample numbers; None omits stss
    * (= all sync).
    */
  def writeMp4(samples: Seq[Array[Byte]], keyframes1: Option[Seq[Int]],
               chunksOf: Int = 3): Array[Byte] = {
    def be(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(t: String, payload: Array[Byte]*): Array[Byte] = {
      val n = 8 + payload.map(_.length).sum
      be(n) ++ t.getBytes("ISO-8859-1") ++ payload.flatten
    }
    val ftyp = box("ftyp", "isom".getBytes, be(512), "isom".getBytes)
    val mdatPayload = samples.toArray.flatten
    val mdatOffset = ftyp.length // mdat box starts here; payload at +8
    val chunks = samples.grouped(chunksOf).toSeq
    val chunkOffsets = chunks.scanLeft(mdatOffset + 8L) {
      (off, ch) => off + ch.map(_.length).sum
    }.init
    val stsz = box("stsz", be(0), be(0), be(samples.length),
      samples.toArray.flatMap(s => be(s.length)))
    val stsc =
      if (chunks.isEmpty) box("stsc", be(0), be(0))
      else {
        val runs = Seq.newBuilder[Array[Byte]]
        runs += (be(1) ++ be(chunksOf) ++ be(1))
        if (chunks.last.length != chunksOf && chunks.length > 1)
          runs += (be(chunks.length) ++ be(chunks.last.length) ++ be(1))
        val rs = runs.result()
        box("stsc", be(0), be(rs.length), rs.toArray.flatten)
      }
    val stco = box("stco", be(0), be(chunkOffsets.length),
      chunkOffsets.toArray.flatMap(o => be(o.toInt)))
    val stss = keyframes1.map(ks =>
      box("stss", be(0), be(ks.length), ks.toArray.flatMap(be))).getOrElse(Array.empty[Byte])
    val stbl = box("stbl", stsz, stsc, stco, stss)
    val minf = box("minf", stbl)
    val hdlr = box("hdlr", be(0), be(0), "vide".getBytes("ISO-8859-1"),
      new Array[Byte](12))
    val mdia = box("mdia", hdlr, minf)
    val trak = box("trak", mdia)
    val moov = box("moov", trak)
    ftyp ++ box("mdat", mdatPayload) ++ moov
  }
}
