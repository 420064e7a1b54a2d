package graft.ops

/** Pure-JVM image container header parsing — REAL dimensions from bytes,
  * no codec dependency (the sandbox has none; full pixel decode stays
  * stubbed in [[Multimodal]]). Formats are parsed from their public
  * specifications:
  *   - PNG: 8-byte signature, then the IHDR chunk's big-endian
  *     width/height (W3C PNG spec §11.2.2);
  *   - JPEG: marker walk to the first SOFn frame header, whose payload is
  *     [precision, height, width] (ITU T.81 §B.2.2);
  *   - GIF: "GIF87a"/"GIF89a" signature, little-endian logical-screen
  *     width/height (GIF89a spec §18).
  */
object ImageHeaders {

  final case class ImageInfo(format: String, width: Int, height: Int)

  /** Detect + parse; None for anything that is not a recognizable image. */
  def parse(b: Array[Byte]): Option[ImageInfo] =
    png(b).orElse(jpeg(b)).orElse(gif(b))

  private def u16be(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def u16le(b: Array[Byte], o: Int): Int =
    ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)
  private def u32be(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  private def png(b: Array[Byte]): Option[ImageInfo] = {
    if (b.length < 24) return None
    if (!PngSig.indices.forall(i => (b(i) & 0xff) == PngSig(i))) return None
    // first chunk must be IHDR: length(4) "IHDR" width(4) height(4) ...
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return None
    val w = u32be(b, 16); val h = u32be(b, 20)
    if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue)
      Some(ImageInfo("png", w.toInt, h.toInt))
    else None
  }

  private def jpeg(b: Array[Byte]): Option[ImageInfo] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var pos = 2
    while (pos + 4 <= b.length) {
      if ((b(pos) & 0xff) != 0xff) return None // marker desync
      val marker = b(pos + 1) & 0xff
      if (marker == 0xff) { pos += 1 } // fill byte
      else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8)) {
        pos += 2 // standalone markers carry no length
      } else if (marker == 0xd9 || marker == 0xda) {
        return None // EOI / start-of-scan without a frame header
      } else {
        val len = u16be(b, pos + 2)
        if (len < 2 || pos + 2 + len > b.length) return None
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc // DHT/JPG/DAC are not frames
        if (isSof) {
          if (len < 7) return None
          val h = u16be(b, pos + 5); val w = u16be(b, pos + 7)
          return if (w > 0 && h > 0) Some(ImageInfo("jpeg", w, h)) else None
        }
        pos += 2 + len
      }
    }
    None
  }

  private def gif(b: Array[Byte]): Option[ImageInfo] = {
    if (b.length < 10) return None
    val sig = new String(b, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val w = u16le(b, 6); val h = u16le(b, 8)
    if (w > 0 && h > 0) Some(ImageInfo("gif", w, h)) else None
  }

  /** One frame of a GIF container: its image-descriptor geometry and the
    * size of its (still-compressed) pixel data.
    */
  final case class GifFrame(index: Int, left: Int, top: Int,
                            width: Int, height: Int, dataBytes: Int)

  /** Walks an animated GIF's block structure (GIF89a spec §§18-23) and
    * returns one entry per image-descriptor block — REAL frame boundaries
    * from the container, no pixel decode (LZW stays compressed).
    * `dataBytes` counts the compressed pixel DATA only (sub-block length
    * prefixes excluded). Malformed or truncated input — a partially
    * downloaded blob cut mid-frame — keeps every fully-parsed frame and
    * drops the torn tail (never throws; same drop-the-tail contract as
    * the pcap readers).
    */
  def gifFrames(b: Array[Byte]): Seq[GifFrame] = {
    if (gif(b).isEmpty) return Seq.empty
    val out = Seq.newBuilder[GifFrame]
    var pos = 6 + 7 // header + logical screen descriptor
    val packed = b(10) & 0xff
    if ((packed & 0x80) != 0) pos += 3 * (1 << ((packed & 7) + 1)) // global color table
    var idx = 0
    var done = false
    // a sub-block chain: length byte + data, 0 terminates.
    // Returns (next position, data bytes), or null on truncation.
    def subBlocks(start: Int): (Int, Int) = {
      var p = start
      var data = 0
      while (p < b.length && (b(p) & 0xff) != 0) {
        data += b(p) & 0xff
        p += 1 + (b(p) & 0xff)
      }
      if (p >= b.length) null else (p + 1, data)
    }
    while (!done && pos < b.length) {
      (b(pos) & 0xff) match {
        case 0x21 if pos + 2 < b.length => // extension: label + sub-blocks
          subBlocks(pos + 2) match {
            case null => done = true
            case (next, _) => pos = next
          }
        case 0x2c if pos + 10 < b.length => // image descriptor
          val left = u16le(b, pos + 1); val top = u16le(b, pos + 3)
          val w = u16le(b, pos + 5); val h = u16le(b, pos + 7)
          val ipacked = b(pos + 9) & 0xff
          var p = pos + 10
          if ((ipacked & 0x80) != 0) p += 3 * (1 << ((ipacked & 7) + 1))
          p += 1 // LZW minimum code size
          subBlocks(p) match {
            case null => done = true // torn frame: keep the ones before it
            case (next, data) =>
              out += GifFrame(idx, left, top, w, h, data)
              idx += 1
              pos = next
          }
        case _ => done = true // trailer (0x3b), unknown, or truncated header
      }
    }
    out.result()
  }
}
