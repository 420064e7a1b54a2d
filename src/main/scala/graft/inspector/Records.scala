package graft.inspector

/** The inspector data model (reference: sink/db.clj:8-37 schema; SURVEY §3).
  *
  * `RecordInfo` is the shaped record `send!` emits: a request or response
  * with its transport context; multi children ride along as `actions`
  * (requests) / `results` (responses) and are exploded into their own
  * tables by [[Inspector]].
  */
final case class ChildRow(
    client: String,
    port: Int,
    call_id: Int,
    method: String,
    table: Option[String],
    region: Option[String],
    row: Option[String],
    cells: Option[Int],
    durability: Option[String],
    error: Option[String])

final case class RecordInfo(
    ts: Long, // epoch millis
    inbound: Boolean,
    client: String,
    port: Int,
    server: String,
    call_id: Int,
    method: String,
    size: Int,
    batch: Int,
    table: Option[String],
    region: Option[String],
    row: Option[String],
    stoprow: Option[String],
    cells: Int,
    durability: Option[String],
    error: Option[String],
    elapsed: Option[Long],
    actions: Seq[ChildRow],
    results: Seq[ChildRow])

/** Per-connection state externalized for streaming mode
  * (`flatMapGroupsWithState`): reassembly buffers per direction plus
  * correlation and scan-lifecycle entries.
  */
final case class PendingEntry(callId: Int, ts: Long, info: graft.proto.HbaseRpc.RpcInfo)
final case class OpenEntry(callId: Int, table: Option[String], region: Option[String])
final case class ScannerEntry(scannerId: Long, table: Option[String], region: Option[String])
final case class ConnSnapshot(
    inBuf: Array[Byte],
    outBuf: Array[Byte],
    pending: Seq[PendingEntry],
    pendingOpen: Seq[OpenEntry],
    scanners: Seq[ScannerEntry])

/** One data-carrying TCP segment, keyed by its client connection.
  * `order` is the capture sequence within one pcap file; ordering within a
  * connection is (ts, order).
  */
final case class KeyedSegment(
    client: String,
    port: Int,
    inbound: Boolean,
    server: String,
    ts: Long, // epoch millis
    order: Long,
    payload: Array[Byte])
