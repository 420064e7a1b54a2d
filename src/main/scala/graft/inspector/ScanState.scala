package graft.inspector

import graft.proto.HbaseRpc.RpcInfo

/** Scan-lifecycle state machine, pure (reference: core.clj:102-139
  * process-scan-state). Per client connection:
  *
  *   1. open-scanner / small-scan REQUEST remembered by call-id;
  *   2. open-scanner RESPONSE maps the server-assigned scanner-id to that
  *      request's (table, region);
  *   3. next-rows (either direction) inherits (table, region) from the
  *      scanner-id entry;
  *   4. close-scanner REQUEST inherits and discards the entry;
  *   5. small-scan RESPONSE discards the pending-open entry (open+close in
  *      one round trip — no scanner-id is ever published).
  */
object ScanState {

  final case class RegionInfo(table: Option[String], region: Option[String])

  final case class State(
      pendingOpen: Map[Int, RegionInfo],
      scanners: Map[Long, RegionInfo]) {
    def bufferedEntries: Int = pendingOpen.size + scanners.size
  }

  val empty: State = State(Map.empty, Map.empty)

  /** One transition; returns the next state and the (possibly augmented)
    * record.
    */
  def step(st: State, info: RpcInfo, inbound: Boolean): (State, RpcInfo) =
    (info.method, inbound) match {
      case ("open-scanner" | "small-scan", true) =>
        (st.copy(pendingOpen = st.pendingOpen
          .updated(info.callId, RegionInfo(info.table, info.region))), info)

      case ("open-scanner", false) =>
        val next = (st.pendingOpen.get(info.callId), info.scanner) match {
          case (Some(ri), Some(id)) =>
            State(st.pendingOpen - info.callId, st.scanners.updated(id, ri))
          case _ => st.copy(pendingOpen = st.pendingOpen - info.callId)
        }
        (next, info)

      case ("next-rows", _) =>
        val ri = info.scanner.flatMap(st.scanners.get)
        (st, ri.fold(info)(r => info.copy(table = r.table, region = r.region)))

      case ("close-scanner", true) =>
        val ri = info.scanner.flatMap(st.scanners.get)
        val next = info.scanner.fold(st)(id => st.copy(scanners = st.scanners - id))
        (next, ri.fold(info)(r => info.copy(table = r.table, region = r.region)))

      case ("small-scan", false) =>
        (st.copy(pendingOpen = st.pendingOpen - info.callId), info)

      case _ => (st, info)
    }
}
