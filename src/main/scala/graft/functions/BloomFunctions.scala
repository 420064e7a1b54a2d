package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Bloom filter over 64-bit keys: a distributed-build, broadcast-probe
  * membership sketch with NO false negatives.
  *
  * Why it exists (q68): q49's decontamination broadcasts the EXACT
  * benchmark gram set — the right plan while that set fits the broadcast
  * budget. At a few hundred million grams (a large eval-suite union, or
  * cross-corpus dedup against a reference snapshot) the exact set is
  * gigabytes, but a bloom at ~10 bits/key is 2 orders of magnitude
  * smaller and never misses a true member; the handful of false positives
  * are removed by an exact confirm join over the (tiny) survivor set, so
  * downstream semantics stay EXACTLY q49's.
  *
  * Build is a [[TypedImperativeAggregate]]: each task ORs keys into a
  * fixed bit array, partials merge by OR — one pass, any parallelism, a
  * single bounded row (numBits/8 bytes) out. Probe is a codegen'd unary
  * expression over a plan-embedded bit array (rides the task binary —
  * broadcast once per stage, like [[LshBucket]]'s weight matrix).
  *
  * Hashing: keys are already xxhash64-mixed longs; probe positions use
  * the standard double-hashing construction (Kirsch–Mitzenmacher,
  * "Less Hashing, Same Performance"): position_i = h1 + i·h2 mod m with
  * h2 forced odd, h1/h2 from one 64-bit finalizer-mix of the key.
  */
object BloomLong {

  /** Serialized layout: [numHashes: int][numWords: int][words: long...]. */
  def serialize(words: Array[Long], numHashes: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + words.length * 8)
    bb.putInt(numHashes)
    bb.putInt(words.length)
    var i = 0
    while (i < words.length) { bb.putLong(words(i)); i += 1 }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): (Array[Long], Int) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val n = bb.getInt
    require(k > 0 && n > 0 && bytes.length == 8 + n * 8,
      s"malformed bloom bytes: k=$k words=$n len=${bytes.length}")
    val words = new Array[Long](n)
    var i = 0
    while (i < n) { words(i) = bb.getLong; i += 1 }
    (words, k)
  }

  /** splitmix64 finalizer: decorrelates h1/h2 from the raw key. */
  private def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  def add(words: Array[Long], v: Long, k: Int): Unit = {
    // Long arithmetic: words.length * 64 in Int wraps past 2^31 bits —
    // exactly the multi-hundred-million-gram sizes the filter exists for
    val m = words.length.toLong * 64
    val h1 = mix(v)
    val h2 = mix(h1) | 1L
    var i = 0
    while (i < k) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, m)
      words((bit >>> 6).toInt) |= 1L << (bit & 63)
      i += 1
    }
  }

  def mightContain(words: Array[Long], v: Long, k: Int): Boolean = {
    val m = words.length.toLong * 64
    val h1 = mix(v)
    val h2 = mix(h1) | 1L
    var i = 0
    while (i < k) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, m)
      if ((words((bit >>> 6).toInt) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** Aggregate: bloom bits (binary, [[BloomLong]] layout) of a long column.
  * `numBits` is rounded up to a multiple of 64; size it at ~10–14 bits
  * per expected distinct key (fpp ~1%–0.1%) — overshooting only wastes
  * space, undershooting only raises the confirm-join's survivor count,
  * never correctness.
  */
case class BloomLongAggregate(
    child: Expression,
    numBits: Long,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits > 0 && numBits <= (1L << 33),
    s"numBits must be in (0, 2^33], got $numBits") // ≤ 1 GiB of bits
  require(numHashes > 0 && numHashes <= 16,
    s"numHashes must be in [1, 16], got $numHashes")

  private def numWords: Int = ((numBits + 63) / 64).toInt

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numWords)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomLong.add(buf, v.asInstanceOf[Long], numHashes)
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = BloomLong.serialize(buf, numHashes)

  override def serialize(buf: Array[Long]): Array[Byte] =
    BloomLong.serialize(buf, numHashes)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomLong.deserialize(bytes)._1

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): BloomLongAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomLongAggregate =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "bloom_long_agg"
}

/** Probe: true iff `child` (long) might be in the plan-embedded bloom.
  * The bit array is an expression FIELD, not a per-row input — it ships
  * once with the task binary and probes run inside whole-stage codegen
  * (a binary-typed column operand would copy the full byte array out of
  * the row on EVERY probe).
  */
case class BloomMightContain(child: Expression, words: Array[Long], k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(input: Any): Any =
    BloomLong.mightContain(words, input.asInstanceOf[Long], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wordsRef = ctx.addReferenceObj("bloomWords", words, "long[]")
    defineCodeGen(ctx, ev, v =>
      s"${classOf[BloomMightContain].getName.stripSuffix("$")}$$.MODULE$$" +
        s".probe($wordsRef, $v, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {
  /** Shared by interpreted eval and generated code. */
  def probe(words: Array[Long], v: Long, k: Int): Boolean =
    BloomLong.mightContain(words, v, k)
}

object BloomFunctions {

  /** Distributed bloom build over a long column → one binary cell. */
  def bloomAgg(c: Column, numBits: Long, numHashes: Int = 5): Column =
    Bridge.column(
      new BloomLongAggregate(Bridge.expression(c), numBits, numHashes)
        .toAggregateExpression())

  /** Membership probe against serialized bloom bytes (from [[bloomAgg]]). */
  def mightContain(bloomBytes: Array[Byte], c: Column): Column = {
    val (words, k) = BloomLong.deserialize(bloomBytes)
    Bridge.column(BloomMightContain(Bridge.expression(c), words, k))
  }
}
