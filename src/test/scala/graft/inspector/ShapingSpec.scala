package graft.inspector

import org.scalatest.funsuite.AnyFunSuite

import graft.proto.HbaseRpc.{RpcAction, RpcInfo, RpcResult}

class ShapingSpec extends AnyFunSuite {

  private def shape(info: RpcInfo, inbound: Boolean = true) =
    Shaping.shape(info, ts = 1000L, inbound = inbound, client = "c", port = 1,
      server = "s", size = 64, elapsed = if (inbound) None else Some(5L))

  test("plain request: batch 0, cells default 0 when absent") {
    val r = shape(RpcInfo("open-scanner", 1, table = Some("t")))
    assert(r.batch === 0)
    assert(r.cells === 0) // reference: (or cells (reduce + ())) = 0
    assert(r.method === "open-scanner")
  }

  test("single-action multi merges the action into the parent") {
    val a = RpcAction("put", Some("t3"), Some("r3"), Some("solo"), Some(2), Some("use_default"))
    val r = shape(RpcInfo("multi", 7, table = Some("t3"), actions = Seq(a)))
    assert(r.method === "put") // merged
    assert(r.batch === 1)
    assert(r.row === Some("solo"))
    assert(r.cells === 2) // sum of action cells
    assert(r.actions.isEmpty && r.results.isEmpty) // no child rows at batch 1
  }

  test("single GET action keeps parent cells/durability (absent keys do not overwrite)") {
    val a = RpcAction("get", Some("t"), Some("r"), Some("g"), None, None)
    val r = shape(RpcInfo("multi", 8, cells = Some(9), durability = Some("sync_wal"),
      actions = Seq(a)))
    assert(r.method === "get")
    assert(r.cells === 9)
    assert(r.durability === Some("sync_wal"))
  }

  test("multi request: children inherit (client, port, call_id); parent cells = sum") {
    val actions = Seq(
      RpcAction("get", Some("t1"), Some("r1"), Some("g1"), None, None),
      RpcAction("put", Some("t1"), Some("r1"), Some("p1"), Some(2), Some("use_default")),
      RpcAction("delete", Some("t2"), Some("r2"), Some("d1"), Some(1), Some("use_default")))
    val r = shape(RpcInfo("multi", 6, table = Some("t1"), actions = actions))
    assert(r.batch === 3)
    assert(r.method === "multi") // not merged
    assert(r.cells === 3)
    assert(r.actions.size === 3)
    assert(r.actions.forall(c => c.client == "c" && c.port == 1 && c.call_id == 6))
    assert(r.results.isEmpty)
  }

  test("multi response: results become children, response-side cells win") {
    val actions = Seq(
      RpcAction("put", Some("t1"), None, Some("p1"), Some(2), None),
      RpcAction("get", Some("t1"), None, Some("g1"), None, None))
    val results = Seq(
      RpcResult("put", Some("t1"), None, Some("p1"), Some(1), None, None),
      RpcResult("get", Some("t1"), None, Some("g1"), None, None, Some("org.foo.Err")))
    val r = shape(RpcInfo("multi", 6, cells = Some(1), actions = actions,
      results = results), inbound = false)
    assert(r.batch === 2)
    assert(r.cells === 1)
    assert(r.results.size === 2)
    assert(r.results(1).error === Some("org.foo.Err"))
    assert(r.actions.isEmpty)
    assert(r.elapsed === Some(5L))
  }
}
