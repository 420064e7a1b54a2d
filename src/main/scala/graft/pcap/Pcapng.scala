package graft.pcap

import PcapFile.PcapRecord

/** pcapng (the modern capture format, wireshark/tcpdump default) reader —
  * the public block structure: Section Header (0x0A0D0D0A, byte-order
  * magic 0x1A2B3C4D), Interface Description (0x1, link type + if_tsresol
  * option), Enhanced Packet (0x6, 64-bit timestamp in interface
  * resolution), Simple Packet (0x3). Records normalize to the same
  * [[PcapFile.PcapRecord]] as classic pcap. Only Ethernet interfaces are
  * consumed downstream; unknown block types are skipped (per spec).
  */
object Pcapng {

  final val SectionHeader = 0x0A0D0D0A
  final val ByteOrderMagic = 0x1A2B3C4DL

  def isPcapng(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 &&
      ((bytes(0) & 0xff) == 0x0A && (bytes(1) & 0xff) == 0x0D &&
        (bytes(2) & 0xff) == 0x0D && (bytes(3) & 0xff) == 0x0A)

  private def u32(b: Array[Byte], off: Int, le: Boolean): Long = {
    val (a0, a1, a2, a3) =
      if (le) (b(off), b(off + 1), b(off + 2), b(off + 3))
      else (b(off + 3), b(off + 2), b(off + 1), b(off))
    ((a3 & 0xffL) << 24) | ((a2 & 0xffL) << 16) | ((a1 & 0xffL) << 8) | (a0 & 0xffL)
  }
  private def u16(b: Array[Byte], off: Int, le: Boolean): Int =
    if (le) ((b(off + 1) & 0xff) << 8) | (b(off) & 0xff)
    else ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  private final case class Iface(linkType: Int, tsDivToMicros: Long)

  /** Lazily iterates packet records; truncated/garbled tails end the
    * iteration (mirrors the classic reader's drop semantics).
    */
  def records(bytes: Array[Byte]): Iterator[PcapRecord] =
    new Iterator[PcapRecord] {
      private var pos = 0
      private var le = true
      private var ifaces = Vector.empty[Iface]
      private var nextRec: PcapRecord = advance()

      private def tsResolDivisor(body: Array[Byte], optOff: Int, end: Int): Long = {
        // walk options: code(2) len(2) value(padded to 4); if_tsresol = 9
        var o = optOff
        var resol = 6 // default 10^-6
        while (o + 4 <= end) {
          val code = u16(body, o, le)
          val len = u16(body, o + 2, le)
          if (code == 0) o = end
          else {
            if (code == 9 && len >= 1) {
              val v = body(o + 4) & 0xff
              if ((v & 0x80) == 0) resol = v // power-of-10 only; 2^-n unsupported -> default
            }
            o += 4 + ((len + 3) & ~3)
          }
        }
        // convert ticks of 10^-resol seconds to micros: divide by 10^(resol-6)
        if (resol >= 6) math.pow(10, resol - 6).toLong.max(1L) else 1L
      }

      private def advance(): PcapRecord = {
        while (pos + 12 <= bytes.length) {
          val rawType = u32(bytes, pos, le = true)
          val isShb = rawType == (SectionHeader & 0xFFFFFFFFL)
          if (isShb) {
            // byte order determined by the magic INSIDE the section header
            if (pos + 12 > bytes.length) return null
            le = u32(bytes, pos + 8, le = true) == ByteOrderMagic
            ifaces = Vector.empty
          }
          val blockType = u32(bytes, pos, le)
          val totalLen = u32(bytes, pos + 4, le).toInt
          if (totalLen < 12 || (totalLen & 3) != 0 ||
            pos.toLong + totalLen > bytes.length) return null
          val bodyStart = pos + 8
          val bodyEnd = pos + totalLen - 4
          blockType match {
            case 1 => // IDB
              if (bodyEnd - bodyStart >= 8) {
                val link = u16(bytes, bodyStart, le)
                val div = tsResolDivisor(bytes, bodyStart + 8, bodyEnd)
                ifaces :+= Iface(link, div)
              }
            case 6 => // EPB
              if (bodyEnd - bodyStart >= 20) {
                val ifId = u32(bytes, bodyStart, le).toInt
                val tsHigh = u32(bytes, bodyStart + 4, le)
                val tsLow = u32(bytes, bodyStart + 8, le)
                val capLen = u32(bytes, bodyStart + 12, le).toInt
                val origLen = u32(bytes, bodyStart + 16, le).toInt
                val iface = ifaces.lift(ifId)
                val ethernet = iface.forall(_.linkType == PcapFile.LinkEthernet)
                if (capLen >= 0 && bodyStart + 20 + capLen <= bodyEnd + 4 &&
                  bodyStart.toLong + 20 + capLen <= bytes.length && ethernet) {
                  val data = java.util.Arrays.copyOfRange(
                    bytes, bodyStart + 20, bodyStart + 20 + capLen)
                  val ticks = (tsHigh << 32) | tsLow
                  val micros = ticks / iface.map(_.tsDivToMicros).getOrElse(1L)
                  pos += totalLen
                  return PcapRecord(micros, origLen, data)
                }
              }
            case 3 => // SPB: no timestamp; captured = min(snaplen, origLen)
              if (bodyEnd - bodyStart >= 4 && ifaces.headOption.forall(_.linkType == PcapFile.LinkEthernet)) {
                val origLen = u32(bytes, bodyStart, le).toInt
                val capLen = math.min(origLen, bodyEnd - bodyStart - 4)
                if (capLen >= 0) {
                  val data = java.util.Arrays.copyOfRange(
                    bytes, bodyStart + 4, bodyStart + 4 + capLen)
                  pos += totalLen
                  return PcapRecord(0L, origLen, data)
                }
              }
            case _ => () // SHB handled above; skip everything else
          }
          pos += totalLen
        }
        null
      }

      def hasNext: Boolean = nextRec != null
      def next(): PcapRecord = { val r = nextRec; nextRec = advance(); r }
    }
}
