package graft.inspector

import graft.proto.HbaseRpc.{RpcAction, RpcInfo, RpcResult}

/** `send!` record shaping (reference: core.clj:261-283):
  *
  *   - `batch` = number of multi actions (0 for plain calls);
  *   - a single-action multi is merged into the parent record;
  *   - parent `cells` = parsed cells, else Σ action cells (0 when none);
  *   - with batch > 1, child rows (actions on the request side, results on
  *     the response side) inherit (client, port, call_id).
  */
object Shaping {

  /** Reference parity note (core.clj:267): a single-action multi merges
    * the first ACTION into the parent on BOTH directions, and batch==1
    * records carry no child rows — so a per-action exception on a
    * single-action multi RESPONSE is not surfaced (only a header-level
    * error is). The reference drops it identically; kept for parity.
    */
  private def mergeSingle(info: RpcInfo, a: RpcAction): RpcInfo =
    info.copy(
      method = a.method,
      table = a.table,
      region = a.region,
      row = a.row,
      // get-actions carry no cells/durability keys; the parent value
      // survives (Clojure merge only overwrites present keys)
      cells = a.cells.orElse(info.cells),
      durability = a.durability.orElse(info.durability))

  private def actionChild(client: String, port: Int, callId: Int)(a: RpcAction): ChildRow =
    ChildRow(client, port, callId, a.method, a.table, a.region, a.row,
      a.cells, a.durability, error = None)

  private def resultChild(client: String, port: Int, callId: Int)(r: RpcResult): ChildRow =
    ChildRow(client, port, callId, r.method, r.table, r.region, r.row,
      r.cells, r.durability, r.error)

  def shape(info: RpcInfo, ts: Long, inbound: Boolean, client: String,
            port: Int, server: String, size: Int, elapsed: Option[Long]): RecordInfo = {
    val batch = info.actions.size
    val merged = if (batch == 1) mergeSingle(info, info.actions.head) else info
    val cells = info.cells.getOrElse(info.actions.flatMap(_.cells).sum)
    val (actions, results) =
      if (batch > 1) {
        if (inbound) (info.actions.map(actionChild(client, port, info.callId)), Nil)
        else (Nil, info.results.map(resultChild(client, port, info.callId)))
      } else (Nil, Nil)
    RecordInfo(
      ts = ts, inbound = inbound, client = client, port = port, server = server,
      call_id = info.callId, method = merged.method, size = size, batch = batch,
      table = merged.table, region = merged.region, row = merged.row,
      stoprow = merged.stoprow, cells = cells, durability = merged.durability,
      error = info.error, elapsed = elapsed,
      actions = actions, results = results)
  }
}
