package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, CreateNamedStruct, EqualTo, Expression, GreaterThan, If, IsNotNull, IsNull, LessThan, Literal, Or}
import org.apache.spark.sql.catalyst.expressions.aggregate.{DeclarativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

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

/** Shared argument validation for the capped-aggregate SQL builders: a
  * missing, non-foldable, or NULL cap must fail with an actionable
  * message at registration, not a raw IndexOutOfBounds/NPE from eval().
  */
private[functions] object AggSqlArgs {
  def foldableCap(e: Seq[Expression], fn: String): Int = {
    require(e.length == 2, s"$fn(col, cap) takes exactly 2 arguments, got ${e.length}")
    require(e(1).foldable, s"$fn: the cap argument must be a literal")
    val cap = e(1).eval()
    require(cap != null && cap.isInstanceOf[Number],
      s"$fn: the cap argument must be a non-null integer literal")
    cap.asInstanceOf[Number].intValue()
  }
}

/** Misra–Gries heavy-hitters sketch over a string column: a bounded map
  * of at most `cap` counters per group.
  *
  * Contract (the classic mergeable-summaries result): every reported
  * count is an UNDERCOUNT by at most n/(cap+1) for a group of n items;
  * any item with true frequency above n/(cap+1) is guaranteed to survive;
  * and when a group's distinct cardinality is ≤ cap the counts are EXACT
  * (no eviction ever fires — the property the driver-gate oracle relies
  * on). Partial merge sums counters then subtracts the (cap+1)-th largest
  * value, which preserves the bound.
  *
  * Why it exists (q61): exact per-token vocabulary counting shuffles the
  * whole (group, token) space — fine at q48's scale, but at 100 TB the
  * token space itself is the problem. This keeps a fixed-size buffer per
  * group and ships only `cap` counters per partial aggregate across the
  * exchange, turning top-k vocabulary into a bounded-memory, single-pass
  * aggregation.
  */
case class MisraGriesTopK(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.HashMap[UTF8String, Long]] {

  require(cap > 0, "cap must be positive")

  private type Buf = scala.collection.mutable.HashMap[UTF8String, Long]

  override def createAggregationBuffer(): Buf = new Buf

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[UTF8String]
      buf.get(k) match {
        case Some(c) => buf.update(k, c + 1)
        case None if buf.size < cap => buf.update(k.clone(), 1L)
        case None => // full: absorb the miss by decrementing every counter
          val dead = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
          buf.foreach { case (t, c) =>
            if (c == 1L) dead += t else buf.update(t, c - 1)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    b2.foreach { case (t, c) => b1.update(t, b1.getOrElse(t, 0L) + c) }
    if (b1.size > cap) {
      val vals = b1.values.toArray
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - (cap + 1)) // (cap+1)-th largest
      val dead = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
      b1.foreach { case (t, c) =>
        if (c <= cut) dead += t else b1.update(t, c - cut)
      }
      dead.foreach(b1.remove)
    }
    b1
  }

  override def eval(buf: Buf): Any = {
    val keys = new Array[Any](buf.size)
    val vals = new Array[Any](buf.size)
    var i = 0
    buf.foreach { case (t, c) => keys(i) = t; vals(i) = c; i += 1 }
    new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      new GenericArrayData(keys), new GenericArrayData(vals))
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val b = t.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Buf
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "misra_gries_topk"
}

object MisraGriesTopK {

  /** Bounded heavy-hitters counter map of `c` per group (see class doc
    * for the exactness/undercount contract).
    */
  def apply(c: Column, cap: Int): Column =
    Bridge.column(
      new MisraGriesTopK(Bridge.expression(c), cap).toAggregateExpression())

  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  /** SQL registry entry (`SELECT misra_gries_topk(t, 256) ...`); the cap
    * argument must be a non-null foldable integer literal.
    */
  private[functions] val sqlFunctions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("misra_gries_topk"),
      new ExpressionInfo(classOf[MisraGriesTopK].getName, "misra_gries_topk"),
      (e: Seq[Expression]) =>
        new MisraGriesTopK(e(0), AggSqlArgs.foldableCap(e, "misra_gries_topk"))))
}

/** Hash-aggregable argmax over a (long metric, long id) pair: per group,
  * the row with the LARGEST `c` wins, ties to the SMALLEST `id`; result
  * is `struct(c, id)`. Why not `max(struct(c, -id))`: a struct-typed agg
  * buffer is not hash-aggregable, so Spark plans SortAggregate — a
  * per-partition sort of the ENTIRE input on the group key before even
  * the partial agg, pure overhead at corpus scale. Two nullable long
  * buffer slots keep the whole chain in whole-stage-codegen
  * HashAggregate. NULL inputs are ignored; an all-NULL group is NULL.
  */
case class ArgMaxTieMin(c: Expression, id: Expression)
  extends DeclarativeAggregate
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  // buffer expressions are built AFTER analyzer type coercion has run, so
  // without declared input types a non-long argument dies in codegen with
  // an error naming internal buffer attributes; this coerces like any
  // builtin aggregate (int widens, string errors cleanly)
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  private lazy val bc = AttributeReference("amax_c", LongType)()
  private lazy val bid = AttributeReference("amax_id", LongType)()
  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(bc, bid)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal.create(null, LongType), Literal.create(null, LongType))
  override lazy val updateExpressions: Seq[Expression] = {
    // bid is non-null whenever bc is (they only ever set together), so
    // the tie comparison never sees a null bid
    val take = And(And(IsNotNull(c), IsNotNull(id)),
      Or(IsNull(bc), Or(GreaterThan(c, bc),
        And(EqualTo(c, bc), LessThan(id, bid)))))
    Seq(If(take, c, bc), If(take, id, bid))
  }
  override lazy val mergeExpressions: Seq[Expression] = {
    val take = And(IsNotNull(bc.right),
      Or(IsNull(bc.left), Or(GreaterThan(bc.right, bc.left),
        And(EqualTo(bc.right, bc.left), LessThan(bid.right, bid.left)))))
    Seq(If(take, bc.right, bc.left), If(take, bid.right, bid.left))
  }
  override lazy val evaluateExpression: Expression = {
    val s = CreateNamedStruct(Seq(Literal("c"), bc, Literal("id"), bid))
    // an untouched buffer must surface as a NULL struct, not struct(null, null)
    If(IsNull(bc), Literal.create(null, s.dataType), s)
  }
  override def dataType: DataType = evaluateExpression.dataType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(c, id)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(c = newChildren(0), id = newChildren(1))
  override def prettyName: String = "arg_max_tie_min"
}

object ArgMaxTieMin {

  /** `struct(c, id)` of the row with max `c`, ties to min `id` (see
    * class doc — hash-aggregable alternative to `max(struct(c, -id))`).
    */
  def apply(c: Column, id: Column): Column =
    Bridge.column(new ArgMaxTieMin(
      Bridge.expression(c), Bridge.expression(id)).toAggregateExpression())

  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  /** SQL registry entry (`SELECT arg_max_tie_min(n_chars, doc_id) ...`). */
  private[functions] val sqlFunctions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("arg_max_tie_min"),
      new ExpressionInfo(classOf[ArgMaxTieMin].getName, "arg_max_tie_min"),
      (e: Seq[Expression]) => new ArgMaxTieMin(e(0), e(1))))
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
          AggSqlArgs.foldableCap(e, "capped_collect_set_long"))))
}
