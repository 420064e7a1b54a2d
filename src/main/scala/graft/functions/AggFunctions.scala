package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Size-capped distinct-collect aggregate: gathers at most `cap + 1`
  * distinct longs per group, then stops accepting. Groups whose true
  * cardinality is ≤ cap get their EXACT sorted distinct set (no partial
  * path can stop early below cap+1 elements); larger groups come out with
  * cap+1 elements — enough for a downstream `size(ids) <= cap` filter to
  * disqualify them, which is the only question the caller asks.
  *
  * Why it exists (q33): `collect_set` + filter materializes the FULL
  * posting list on one reducer before the df-cap can drop it — a
  * ubiquitous 3-gram over billions of documents is an OOM. The
  * alternative two-pass form (count-aggregate → semi-join back → collect)
  * is memory-safe but doubles the gram pipeline and adds an exchange
  * (measured ~1.7× q33 wall time). A bounded aggregation buffer is the
  * right fix and is not expressible with builtin functions — this is the
  * custom-`Expression` tier of the operator preference order.
  */
case class CappedCollectSetLong(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedCollectSetLong.LongBag] {
  import CappedCollectSetLong.LongBag

  require(cap > 0, "cap must be positive")

  // buffer = primitive array + linear-scan dedup: no boxing, and at
  // cap+1 <= a few dozen elements a scan beats any hash structure
  override def createAggregationBuffer(): LongBag = new LongBag(cap)

  override def update(buf: LongBag, input: InternalRow): LongBag = {
    if (buf.n <= cap) {
      val v = child.eval(input)
      if (v != null) buf.add(v.asInstanceOf[Long])
    }
    buf
  }

  override def merge(b1: LongBag, b2: LongBag): LongBag = {
    var i = 0
    while (i < b2.n && b1.n <= cap) { b1.add(b2.arr(i)); i += 1 }
    b1
  }

  override def eval(buf: LongBag): Any = {
    val arr = java.util.Arrays.copyOf(buf.arr, buf.n)
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }

  override def serialize(buf: LongBag): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + buf.n * 8)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.n)
    var i = 0
    while (i < buf.n) { out.writeLong(buf.arr(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): LongBag = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new LongBag(cap)
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollectSetLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedCollectSetLong =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "capped_collect_set_long"
}

object CappedCollectSetLong {

  /** Distinct-long accumulator bounded at cap+1 elements. */
  final class LongBag(cap: Int) {
    var arr: Array[Long] = new Array[Long](math.min(cap + 1, 8))
    var n: Int = 0
    def add(v: Long): Unit = {
      var i = 0
      while (i < n) { if (arr(i) == v) return; i += 1 }
      if (n == arr.length)
        arr = java.util.Arrays.copyOf(arr, math.min(arr.length * 2, cap + 1).max(n + 1))
      arr(n) = v
      n += 1
    }
  }

  /** Sorted distinct values of `c` per group, truthful up to `cap`
    * elements, cap+1 elements for over-cap groups (filter them out with
    * `size(...) <= cap`).
    */
  def apply(c: Column, cap: Int): Column =
    Bridge.column(
      new CappedCollectSetLong(Bridge.expression(c), cap).toAggregateExpression())

  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  /** SQL registry entry (`SELECT capped_collect_set_long(v, 50) ...`);
    * the cap argument must be a foldable integer literal.
    */
  private[functions] val sqlFunctions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("capped_collect_set_long"),
      new ExpressionInfo(classOf[CappedCollectSetLong].getName, "capped_collect_set_long"),
      (e: Seq[Expression]) =>
        new CappedCollectSetLong(e(0),
          e(1).eval().asInstanceOf[Number].intValue())))
}
