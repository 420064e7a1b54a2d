package graft.pcap

import java.io.ByteArrayOutputStream

/** Fixed-offset Ethernet → IPv4 → TCP decode, the data a packet needs to
  * enter the inspector pipeline (reference: pcap.clj:40-55 packet->map via
  * pcap4j — src/dst addr:port + TCP payload; packets without all three are
  * dropped, matching the `when` guard there).
  */
object LinkDecode {

  /** Decoded data-carrying TCP segment. `seq` is the raw 32-bit TCP
    * sequence number (unsigned, in a Long) — carried so downstream
    * ordering/reassembly can detect same-millisecond reordering within one
    * direction of a connection.
    */
  final case class Segment(
      srcAddr: String, srcPort: Int,
      dstAddr: String, dstPort: Int,
      seq: Long,
      payload: Array[Byte])

  private def u16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  private def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  /** Returns None for non-IP, non-TCP, or empty-payload frames.
    * One 802.1Q VLAN tag (ethertype 0x8100) is skipped transparently —
    * datacenter captures are commonly tagged.
    *
    * Beyond the reference (pcap4j IpV4Packet only): IPv6 frames decode
    * too — fixed 40-byte header, TCP next-header. Packets carrying IPv6
    * extension headers are skipped (rare inside a datacenter; a passive
    * observer drops rather than misparses).
    */
  def decode(frame: Array[Byte]): Option[Segment] = {
    if (frame.length < 14 + 20 + 20) return None
    val tagged = u16(frame, 12) == 0x8100
    val (etherType, ip) =
      if (tagged) {
        if (frame.length < 18 + 20 + 20) return None
        (u16(frame, 16), 18)
      } else (u16(frame, 12), 14)
    etherType match {
      case 0x0800 => decode4(frame, ip)
      case 0x86DD => decode6(frame, ip)
      case _ => None
    }
  }

  private def decode4(frame: Array[Byte], ip: Int): Option[Segment] = {
    val verIhl = frame(ip) & 0xff
    if ((verIhl >>> 4) != 4) return None
    val ihl = (verIhl & 0xf) * 4
    if (ihl < 20 || frame.length < ip + ihl + 20) return None
    if ((frame(ip + 9) & 0xff) != 6) return None // TCP only
    val totalLen = u16(frame, ip + 2)
    val srcAddr = s"${frame(ip + 12) & 0xff}.${frame(ip + 13) & 0xff}.${frame(ip + 14) & 0xff}.${frame(ip + 15) & 0xff}"
    val dstAddr = s"${frame(ip + 16) & 0xff}.${frame(ip + 17) & 0xff}.${frame(ip + 18) & 0xff}.${frame(ip + 19) & 0xff}"
    tcpSegment(frame, ip + ihl, ip + totalLen, srcAddr, dstAddr)
  }

  private def v6Addr(b: Array[Byte], off: Int): String =
    (0 until 8).map(i => f"${u16(b, off + 2 * i)}%x").mkString(":")

  private def decode6(frame: Array[Byte], ip: Int): Option[Segment] = {
    if (frame.length < ip + 40 + 20) return None
    if (((frame(ip) & 0xff) >>> 4) != 6) return None
    val payloadLen = u16(frame, ip + 4)
    // next-header must be TCP directly; extension headers are skipped
    // (hop-by-hop 0, routing 43, fragment 44, ... — a fragment could not
    // be reassembled statelessly anyway)
    if ((frame(ip + 6) & 0xff) != 6) return None
    val srcAddr = v6Addr(frame, ip + 8)
    val dstAddr = v6Addr(frame, ip + 24)
    tcpSegment(frame, ip + 40, ip + 40 + payloadLen, srcAddr, dstAddr)
  }

  /** Common TCP tail: `end` = first byte past the IP payload (from the IP
    * length field — the frame may carry link padding).
    */
  private def tcpSegment(frame: Array[Byte], tcp: Int, end: Int,
                         srcAddr: String, dstAddr: String): Option[Segment] = {
    if (frame.length < tcp + 20) return None
    val srcPort = u16(frame, tcp)
    val dstPort = u16(frame, tcp + 2)
    val seq = u32(frame, tcp + 4)
    val dataOff = ((frame(tcp + 12) & 0xff) >>> 4) * 4
    if (dataOff < 20) return None
    val payloadStart = tcp + dataOff
    val payloadLen = math.min(end, frame.length) - payloadStart
    if (payloadLen <= 0) return None
    Some(Segment(srcAddr, srcPort, dstAddr, dstPort, seq,
      java.util.Arrays.copyOfRange(frame, payloadStart, payloadStart + payloadLen)))
  }

  /** Builds an Ethernet/IPv4/TCP frame around a payload (tests + the
    * synthetic traffic generator). Checksums are zero — the decoder does
    * not verify them, like a passive capture pipeline.
    */
  def encode(srcAddr: String, srcPort: Int, dstAddr: String, dstPort: Int,
             payload: Array[Byte], seq: Long = 0L): Array[Byte] = {
    val out = new ByteArrayOutputStream(64 + payload.length)
    def b(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { b(v >>> 8); b(v) }
    def addr(a: String): Unit = a.split('.').foreach(p => b(p.toInt))
    // ethernet
    (0 until 6).foreach(_ => b(0x02)); (0 until 6).foreach(_ => b(0x04))
    w16(0x0800)
    // ipv4, no options
    b(0x45); b(0)
    w16(20 + 20 + payload.length)
    w16(0); w16(0x4000) // id, DF
    b(64); b(6); w16(0) // ttl, proto TCP, checksum 0
    addr(srcAddr); addr(dstAddr)
    writeTcp(out, srcPort, dstPort, seq, payload)
    out.toByteArray
  }

  /** IPv6 variant; accepts full 8-group addresses and `::`-compressed
    * forms (expanded before encoding — the decoder's OUTPUT is always the
    * uncompressed 8-group form).
    */
  def encode6(srcAddr: String, srcPort: Int, dstAddr: String, dstPort: Int,
              payload: Array[Byte], seq: Long = 0L,
              nextHeader: Int = 6): Array[Byte] = {
    val out = new ByteArrayOutputStream(80 + payload.length)
    def b(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { b(v >>> 8); b(v) }
    def groups(a: String): Seq[Int] = {
      val expanded =
        if (a.contains("::")) {
          val Array(l, r) = (a + " ").split("::", 2).map(_.trim)
          val left = if (l.isEmpty) Seq.empty else l.split(':').toSeq
          val right = if (r.isEmpty) Seq.empty else r.split(':').toSeq
          left ++ Seq.fill(8 - left.size - right.size)("0") ++ right
        } else a.split(':').toSeq
      require(expanded.size == 8, s"bad IPv6 address: $a")
      expanded.map(Integer.parseInt(_, 16))
    }
    def addr(a: String): Unit = groups(a).foreach(w16)
    (0 until 6).foreach(_ => b(0x02)); (0 until 6).foreach(_ => b(0x04))
    w16(0x86DD)
    b(0x60); b(0); w16(0)                // version 6, class/flow 0
    w16(20 + payload.length)             // payload length (TCP hdr + data)
    b(nextHeader); b(64)                 // next header, hop limit
    addr(srcAddr); addr(dstAddr)
    writeTcp(out, srcPort, dstPort, seq, payload)
    out.toByteArray
  }

  private def writeTcp(out: ByteArrayOutputStream, srcPort: Int, dstPort: Int,
                       seq: Long, payload: Array[Byte]): Unit = {
    def b(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { b(v >>> 8); b(v) }
    def w32(v: Long): Unit = { b((v >>> 24).toInt); b((v >>> 16).toInt); b((v >>> 8).toInt); b(v.toInt) }
    w16(srcPort); w16(dstPort)
    w32(seq); w32(0L)
    b(0x50); b(0x18) // data offset 5 words; PSH|ACK
    w16(65535); w16(0); w16(0)
    out.write(payload, 0, payload.length)
  }
}
