package graft.inspector

import scala.collection.mutable
import scala.util.control.NonFatal

import graft.proto.{HbaseRpc, ProtoWire}

/** Full per-connection state machine: framing per direction, request ↔
  * response correlation with `elapsed`, scan lifecycle, record shaping
  * (the composition the reference runs per packet in core.clj:152-259 +
  * next-state, here per client connection so connections are the parallel
  * unit).
  *
  * Used sequentially inside one Spark task (batch: a sorted run of one
  * connection's segments inside `mapPartitions`; streaming: one group in
  * `flatMapGroupsWithState`). Not thread-safe by design.
  */
final class ConnTracker(client: String, port: Int) {

  private val inAsm  = new FrameAssembler
  private val outAsm = new FrameAssembler
  /** call-id -> (request info, request ts) — reference state `[addr port call-id]`. */
  private val pending = mutable.Map.empty[Int, (HbaseRpc.RpcInfo, Long)]
  private var scan = ScanState.empty

  def bufferedBytes: Long = inAsm.bufferedBytes.toLong + outAsm.bufferedBytes
  def pendingCalls: Int = pending.size

  /** Total correlation/scan-lifecycle entries held (the entry-count side
    * of the state cap; buffer bytes are the other side).
    */
  def stateEntries: Int = pending.size + scan.bufferedEntries

  /** Drop reassembly buffers (streaming per-key memory cap, the per-key
    * form of reference trim-state-by-memory, core.clj:322-347).
    */
  def resetBuffers(): Unit = { inAsm.reset(); outAsm.reset() }

  /** Externalized state for `flatMapGroupsWithState`. */
  def snapshot: ConnSnapshot = ConnSnapshot(
    inBuf = inAsm.buffered,
    outBuf = outAsm.buffered,
    pending = pending.toSeq.map { case (id, (info, ts)) => PendingEntry(id, ts, info) },
    pendingOpen = scan.pendingOpen.toSeq.map { case (id, e) =>
      OpenEntry(id, e.info.table, e.info.region, e.ts) },
    scanners = scan.scanners.toSeq.map { case (id, e) =>
      ScannerEntry(id, e.info.table, e.info.region, e.ts) })

  def restore(s: ConnSnapshot): Unit = {
    inAsm.restore(s.inBuf)
    outAsm.restore(s.outBuf)
    pending.clear()
    s.pending.foreach(e => pending(e.callId) = (e.info, e.ts))
    scan = ScanState.State(
      s.pendingOpen.map(e => e.callId ->
        ScanState.Entry(ScanState.RegionInfo(e.table, e.region), e.ts)).toMap,
      s.scanners.map(e => e.scannerId ->
        ScanState.Entry(ScanState.RegionInfo(e.table, e.region), e.ts)).toMap)
  }

  /** Expire ALL state objects older than `cutoffTs` — call-id correlation
    * AND scan-lifecycle entries (reference trim-state-expired,
    * core.clj:285-297; 120 s). Actively-used scanners survive: next-rows
    * refreshes their ts (core.clj:127); a leaked scanner (client crashed
    * without close-scanner) ages out instead of living as long as the
    * connection.
    */
  def expireBefore(cutoffTs: Long): Int = {
    val old = pending.filter { case (_, (_, ts)) => ts < cutoffTs }.keys.toSeq
    old.foreach(pending.remove)
    val before = scan.bufferedEntries
    scan = ScanState.expire(scan, cutoffTs)
    old.size + (before - scan.bufferedEntries)
  }

  /** Hard entry-count cap (the per-key form of reference
    * trim-state-by-memory, which drops entries when the global budget is
    * hit even if nothing is expired): drop OLDEST entries across all
    * three maps until at most `max` remain. Returns the number dropped.
    */
  def trimToEntries(max: Int): Int = {
    val excess = stateEntries - max
    if (excess <= 0) return 0
    // (ts, kind, key) oldest-first; kind disambiguates the map to remove from
    val all =
      pending.iterator.map { case (id, (_, ts)) => (ts, 0, id.toLong) } ++
        scan.pendingOpen.iterator.map { case (id, e) => (e.ts, 1, id.toLong) } ++
        scan.scanners.iterator.map { case (id, e) => (e.ts, 2, id) }
    all.toSeq.sortBy(t => (t._1, t._2, t._3)).take(excess).foreach {
      case (_, 0, id) => pending.remove(id.toInt)
      case (_, 1, id) => scan = scan.copy(pendingOpen = scan.pendingOpen - id.toInt)
      case (_, _, id) => scan = scan.copy(scanners = scan.scanners - id)
    }
    excess
  }

  /** Feed one segment; emit every completed, shaped record. A parse
    * failure discards the rest of this direction's stream — both the
    * remaining already-framed messages and any buffered partial bytes —
    * matching the reference's whole-buffer drop (core.clj:255-259); the
    * next segment re-syncs via the valid-length heuristic.
    */
  def push(seg: KeyedSegment): Seq[RecordInfo] = {
    val asm = if (seg.inbound) inAsm else outAsm
    val frames =
      try asm.push(seg.payload)
      catch { case NonFatal(_) => asm.reset(); Vector.empty }
    val out = Vector.newBuilder[RecordInfo]
    var failed = false
    frames.foreach { frame =>
      if (!failed) parseFrame(frame, seg) match {
        case Some(rec) => out += rec
        case None      => failed = true // parseFrame already reset the buffer
      }
    }
    out.result()
  }

  private def parseFrame(frame: Array[Byte], seg: KeyedSegment): Option[RecordInfo] =
    try {
      val reader = new ProtoWire.Reader(frame)
      val parsed = HbaseRpc.parseStream(seg.inbound, reader,
        id => pending.get(id).map(_._1))
      val elapsed =
        if (seg.inbound) None
        else pending.get(parsed.callId).map { case (_, reqTs) => seg.ts - reqTs }
      val (nextScan, info) = ScanState.step(scan, parsed, seg.inbound, seg.ts)
      scan = nextScan
      if (seg.inbound) pending(info.callId) = (info, seg.ts)
      else pending.remove(info.callId)
      Some(Shaping.shape(info, seg.ts, seg.inbound, client, port, seg.server,
        frame.length, elapsed))
    } catch {
      case NonFatal(_) =>
        // Reference behavior: a parse failure discards the client's byte
        // stream (core.clj:255-259); correlation/scan state survives.
        (if (seg.inbound) inAsm else outAsm).reset()
        None
    }
}
