package graft.pcap

import PcapFile.PcapRecord

/** pcapng (the modern capture format, wireshark/tcpdump default) reader —
  * the public block structure: Section Header (0x0A0D0D0A, byte-order
  * magic 0x1A2B3C4D), Interface Description (0x1, link type + if_tsresol
  * option), Enhanced Packet (0x6, 64-bit timestamp in interface
  * resolution). Records normalize to the same [[PcapFile.PcapRecord]] as
  * classic pcap.
  *
  * Robustness contract (a passive pipeline must survive hostile files):
  * unknown block types are skipped per spec; an EPB referencing an
  * undefined interface or a non-Ethernet link is skipped; Simple Packet
  * Blocks are skipped too — they carry NO timestamp, and a fabricated
  * ts would corrupt per-connection reassembly ordering and expiry;
  * malformed lengths end the iteration (drop-the-tail, like the classic
  * reader).
  */
object Pcapng {

  final val SectionHeader = 0x0A0D0D0A
  final val ByteOrderMagic = 0x1A2B3C4DL

  def isPcapng(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 &&
      ((bytes(0) & 0xff) == 0x0A && (bytes(1) & 0xff) == 0x0D &&
        (bytes(2) & 0xff) == 0x0D && (bytes(3) & 0xff) == 0x0A)

  private def u16(b: Array[Byte], off: Int, le: Boolean): Int =
    if (le) ((b(off + 1) & 0xff) << 8) | (b(off) & 0xff)
    else ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  /** Ticks of one second for an if_tsresol value: MSB clear = 10^-n,
    * MSB set = 2^-n (both bounded to keep the arithmetic in Long).
    */
  private def ticksPerSecond(tsresol: Int): Long =
    if ((tsresol & 0x80) == 0) {
      val n = math.min(tsresol, 18)
      var t = 1L; var i = 0
      while (i < n) { t *= 10; i += 1 }
      t
    } else {
      val n = math.min(tsresol & 0x7f, 62)
      1L << n
    }

  /** Overflow-safe ticks → microseconds at `tps` ticks per second. */
  private def toMicros(ticks: Long, tps: Long): Long =
    (ticks / tps) * 1000000L + ((ticks % tps) * 1000000L) / tps

  private final case class Iface(linkType: Int, tps: Long)

  /** Lazily iterates packet records; truncated/garbled tails end the
    * iteration (mirrors the classic reader's drop semantics).
    */
  def records(bytes: Array[Byte]): Iterator[PcapRecord] =
    new Iterator[PcapRecord] {
      private var pos = 0
      private var le = true
      private var ifaces = Vector.empty[Iface]
      private var nextRec: PcapRecord = advance()

      private def tsResolOf(body: Array[Byte], optOff: Int, end: Int): Int = {
        // walk options: code(2) len(2) value(padded to 4); if_tsresol = 9
        var o = optOff
        var resol = 6 // default 10^-6
        while (o + 4 <= end) {
          val code = u16(body, o, le)
          val len = u16(body, o + 2, le)
          if (code == 0) o = end
          else {
            if (code == 9 && len >= 1 && o + 4 < end) resol = body(o + 4) & 0xff
            o += 4 + ((len + 3) & ~3)
          }
        }
        resol
      }

      private def advance(): PcapRecord = {
        while (pos + 12 <= bytes.length) {
          if (u32(bytes, pos, le = true) == (SectionHeader & 0xFFFFFFFFL)) {
            // byte order determined by the magic INSIDE the section header
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
                val tps = ticksPerSecond(tsResolOf(bytes, bodyStart + 8, bodyEnd))
                ifaces :+= Iface(link, tps)
              }
            case 6 => // EPB
              if (bodyEnd - bodyStart >= 20) {
                val ifId = u32(bytes, bodyStart, le).toInt
                val tsHigh = u32(bytes, bodyStart + 4, le)
                val tsLow = u32(bytes, bodyStart + 8, le)
                val capLen = u32(bytes, bodyStart + 12, le).toInt
                val origLen = u32(bytes, bodyStart + 16, le).toInt
                // must reference a defined, Ethernet interface (an EPB
                // before its IDB would otherwise be decoded under guessed
                // link type and resolution)
                ifaces.lift(ifId) match {
                  // compare in Long: a crafted capLen near Int.MaxValue
                  // would wrap `bodyStart + 20 + capLen` negative and slip
                  // past the bound (same hostile-file case the classic
                  // reader guards in PcapFile.records)
                  case Some(iface) if iface.linkType == PcapFile.LinkEthernet &&
                    capLen >= 0 && bodyStart.toLong + 20L + capLen <= bodyEnd =>
                    val data = java.util.Arrays.copyOfRange(
                      bytes, bodyStart + 20, bodyStart + 20 + capLen)
                    val ticks = (tsHigh << 32) | tsLow
                    pos += totalLen
                    return PcapRecord(toMicros(ticks, iface.tps), origLen, data)
                  case _ => ()
                }
              }
            case _ => () // SHB handled above; SPB (no timestamp) + rest skipped
          }
          pos += totalLen
        }
        null
      }

      def hasNext: Boolean = nextRec != null
      def next(): PcapRecord = { val r = nextRec; nextRec = advance(); r }
    }

  private def u32(b: Array[Byte], off: Int, le: Boolean): Long =
    PcapFile.readU32(b, off, le)
}
