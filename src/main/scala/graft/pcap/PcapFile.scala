package graft.pcap

import java.io.ByteArrayOutputStream

/** Classic libpcap file codec (the public tcpdump/libpcap format:
  * 24-byte global header + per-record 16-byte headers). Replaces the
  * reference's pcap4j `Pcaps/openOffline` (reference: pcap.clj:35-38
  * file-handle) with a zero-dependency reader usable inside executor tasks —
  * one file is one task; scale-out is many rotated capture files.
  *
  * Supports both byte orders and both timestamp resolutions
  * (magic 0xA1B2C3D4 = µs, 0xA1B23C4D = ns, and their byte-swapped forms).
  * Only link type 1 (Ethernet) is consumed downstream.
  */
object PcapFile {

  final val MagicMicros = 0xA1B2C3D4
  final val MagicNanos  = 0xA1B23C4D
  final val LinkEthernet = 1

  /** One captured record; `tsMicros` normalized to microseconds. */
  final case class PcapRecord(tsMicros: Long, origLen: Int, data: Array[Byte])

  final class FormatException(msg: String) extends RuntimeException(msg)

  /** Shared with [[Pcapng]] — one copy of the endian-sensitive read. */
  private[pcap] def readU32(b: Array[Byte], off: Int, le: Boolean): Long = {
    val (a0, a1, a2, a3) =
      if (le) (b(off), b(off + 1), b(off + 2), b(off + 3))
      else (b(off + 3), b(off + 2), b(off + 1), b(off))
    ((a3 & 0xffL) << 24) | ((a2 & 0xffL) << 16) | ((a1 & 0xffL) << 8) | (a0 & 0xffL)
  }
  private def u32(b: Array[Byte], off: Int, le: Boolean): Long = readU32(b, off, le)

  /** Lazily iterates records of one pcap file body. Truncated trailing
    * records are dropped (a live capture can be cut mid-record).
    */
  def records(bytes: Array[Byte]): Iterator[PcapRecord] = {
    if (bytes.length < 24) return Iterator.empty
    val magicBE = ((bytes(0) & 0xff) << 24) | ((bytes(1) & 0xff) << 16) |
      ((bytes(2) & 0xff) << 8) | (bytes(3) & 0xff)
    val (le, nanos) = magicBE match {
      case MagicMicros => (false, false)
      case MagicNanos  => (false, true)
      case 0xD4C3B2A1  => (true, false)
      case 0x4D3CB2A1  => (true, true)
      case other => throw new FormatException(f"bad pcap magic 0x$other%08X")
    }
    val linkType = u32(bytes, 20, le).toInt
    if (linkType != LinkEthernet) return Iterator.empty

    new Iterator[PcapRecord] {
      private var pos = 24
      private var nextRec: PcapRecord = advance()
      private def advance(): PcapRecord = {
        if (pos + 16 > bytes.length) return null
        val tsSec   = u32(bytes, pos, le)
        val tsFrac  = u32(bytes, pos + 4, le)
        val inclLen = u32(bytes, pos + 8, le).toInt
        val origLen = u32(bytes, pos + 12, le).toInt
        // compare in Long: a crafted inclLen near Int.MaxValue would wrap
        // `pos + 16 + inclLen` negative and bypass the truncation guard
        if (inclLen < 0 || pos.toLong + 16L + inclLen > bytes.length) return null
        val data = java.util.Arrays.copyOfRange(bytes, pos + 16, pos + 16 + inclLen)
        pos += 16 + inclLen
        val micros = tsSec * 1000000L + (if (nanos) tsFrac / 1000L else tsFrac)
        PcapRecord(micros, origLen, data)
      }
      def hasNext: Boolean = nextRec != null
      def next(): PcapRecord = {
        val r = nextRec; nextRec = advance(); r
      }
    }
  }

  def isGzip(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b

  private def isClassic(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && {
      val magicBE = ((bytes(0) & 0xff) << 24) | ((bytes(1) & 0xff) << 16) |
        ((bytes(2) & 0xff) << 8) | (bytes(3) & 0xff)
      magicBE == MagicMicros || magicBE == MagicNanos ||
        magicBE == 0xD4C3B2A1 || magicBE == 0x4D3CB2A1
    }

  /** Format/compression dispatch for a capture file: gunzip by MAGIC
    * (rotated captures are routinely compressed, whatever their name),
    * then choose classic pcap vs pcapng. A file that is neither — a
    * stray index/log in the capture directory, or a half-written gzip
    * picked up by the streaming source — yields NO records instead of
    * killing the job (`name` is kept for diagnostics only).
    */
  def recordsAuto(name: String, bytes: Array[Byte]): Iterator[PcapRecord] = {
    val inner =
      try {
        val raw = if (isGzip(bytes)) gunzip(bytes) else bytes
        if (Pcapng.isPcapng(raw)) Pcapng.records(raw)
        else if (isClassic(raw)) records(raw)
        else Iterator.empty
      } catch { case scala.util.control.NonFatal(_) => Iterator.empty }
    // the construction try only covers the FIRST advance; wrap so a
    // NonFatal from any later advance (a record deep inside a hostile
    // file) ends the iteration instead of failing the executor task
    new Iterator[PcapRecord] {
      private var nextRec: PcapRecord = fetch()
      private def fetch(): PcapRecord =
        try { if (inner.hasNext) inner.next() else null }
        catch { case scala.util.control.NonFatal(_) => null }
      def hasNext: Boolean = nextRec != null
      def next(): PcapRecord = { val r = nextRec; nextRec = fetch(); r }
    }
  }

  def gunzip(bytes: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try in.readAllBytes() finally in.close()
  }

  /** Writer for tests and the synthetic traffic generator: classic
    * little-endian microsecond pcap, Ethernet link type.
    */
  final class Writer {
    private val out = new ByteArrayOutputStream(1024)
    writeU32(MagicMicros); writeU16(2); writeU16(4) // magic, version 2.4
    writeU32(0); writeU32(0)                        // thiszone, sigfigs
    writeU32(65535); writeU32(LinkEthernet)         // snaplen, network

    private def writeU16(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >>> 8) & 0xff)
    }
    private def writeU32(v: Long): Unit = {
      var i = 0
      while (i < 4) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
    }

    def record(tsMicros: Long, frame: Array[Byte]): Writer = {
      writeU32(tsMicros / 1000000L)
      writeU32(tsMicros % 1000000L)
      writeU32(frame.length.toLong)
      writeU32(frame.length.toLong)
      out.write(frame, 0, frame.length)
      this
    }

    def toBytes: Array[Byte] = out.toByteArray
  }
}
