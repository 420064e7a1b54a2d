package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native Catalyst expressions for the vector hot path.
  *
  * The builtin higher-order functions (`aggregate`/`zip_with`) used for the
  * first cosine implementation are CodegenFallback: every row pays lambda
  * interpretation and boxed Float allocation, and the expression blocks
  * whole-stage codegen for its whole projection. These expressions generate
  * a tight primitive loop instead — the per-row cost on a 100 TB corpus is
  * the dot product itself, nothing else.
  *
  * Element nulls are not expected (embeddings are dense float vectors);
  * mismatched lengths use the common prefix.
  */
abstract class VectorBinaryExpression extends BinaryExpression with ExpectsInputTypes {
  // inferred Seq[ArrayType] <: Seq[AbstractDataType]; the latter is
  // private[sql] in Spark 4 and cannot be named here
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
}

/** cosine(a, b) = a·b / (|a| |b|), one fused loop. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getFloat($i);
         |  double $yi = $b.getFloat($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** dot(a, b), same fused-loop shape. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ((double) $a.getFloat($i)) * $b.getFloat($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH bucket of a float vector: bit p of the result is
  * the sign of the vector's dot product with pseudo-random ±1 weights
  * derived from xxhash64(p, dim, seed) — one fused codegen loop over
  * nbits × dims (the Column-API form needed nbits interpreted
  * `aggregate` passes per row). `seed` selects an independent hyperplane
  * family — banded multi-signature blocking (q34) uses one family per
  * band so a near-dup missed by one family is caught by another.
  */
case class LshBucket(child: Expression, nbits: Int, seed: Long = 42L)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "lsh_bucket"

  override def nullSafeEval(input: Any): Any =
    LshBucket.bucket(input.asInstanceOf[ArrayData], nbits, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => {
      s"${classOf[LshBucket].getName.stripSuffix("$")}$$.MODULE$$.bucket($v, $nbits, ${seed}L)"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshBucket {
  import org.apache.spark.sql.catalyst.expressions.XXH64

  /** ±1 weight for (plane, dim) under a seed: parity of bit 1 of
    * xxhash64(dim, xxhash64(plane, seed)) — hash-derived, no RNG at plan
    * time, so the bucketing is deterministic across runs and executors.
    */
  def weight(plane: Int, dim: Int, seed: Long): Double = {
    val h = XXH64.hashLong(dim.toLong, XXH64.hashLong(plane.toLong, seed))
    if ((h & 2L) != 0) 1.0 else -1.0
  }

  /** Weights are row-independent; memoize the nbits×dims matrix once per
    * executor so the per-row cost really is just the multiply-adds (the
    * two chained XXH64 calls per cell would otherwise dominate).
    */
  private val weightCache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int, Int), Array[Double]]()

  private def weights(nbits: Int, dims: Int, seed: Long): Array[Double] =
    weightCache.computeIfAbsent((seed, nbits, dims), { case (sd, nb, d) =>
      val w = new Array[Double](nb * d)
      var p = 0
      while (p < nb) {
        var i = 0
        while (i < d) { w(p * d + i) = weight(p, i, sd); i += 1 }
        p += 1
      }
      w
    })

  /** Shared by interpreted eval and generated code. */
  def bucket(v: ArrayData, nbits: Int, seed: Long): Long = {
    val dims = v.numElements()
    val w = weights(nbits, dims, seed)
    var b = 0L
    var p = 0
    while (p < nbits) {
      var proj = 0.0
      var i = 0
      val base = p * dims
      while (i < dims) { proj += v.getFloat(i) * w(base + i); i += 1 }
      if (proj > 0) b |= 1L << p
      p += 1
    }
    b
  }
}

/** int8 scalar quantization stats of a float vector, one fused pass:
  * `struct(scale, sum_q, n_nonzero, mse)` where `scale = max|v| / 127`,
  * `q_i = clamp(floor(v_i/scale + 0.5), ±127)` (all-zero vector → q = 0),
  * and `mse` is the mean squared reconstruction error `(v_i − q_i·scale)²`.
  *
  * The quantized vector itself never materializes — a pipeline that wants
  * the bytes applies the same per-element formula in a projection; this
  * expression is the CALIBRATION/QA half (how lossy is int8 on this
  * corpus), which only needs the stats. The mse accumulation is a
  * sequential left fold so the DuckDB oracle (`list_reduce` over the same
  * element order) reproduces it bit for bit; all arithmetic is in double
  * (float inputs promote exactly on both engines).
  */
case class QuantizeStats(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = QuantizeStats.schema
  override def prettyName: String = "quantize_stats"

  override def nullSafeEval(input: Any): Any =
    QuantizeStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"${classOf[QuantizeStats].getName.stripSuffix("$")}$$.MODULE$$.compute($v)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantizeStats {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.types.{LongType, StructField, StructType}

  val schema: StructType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("sum_q", LongType, nullable = false),
    StructField("n_nonzero", LongType, nullable = false),
    StructField("mse", DoubleType, nullable = false)))

  private def elem(v: ArrayData, i: Int): Double =
    if (v.isNullAt(i)) 0.0 else v.getFloat(i).toDouble

  /** Shared by interpreted eval and generated code. NULL elements read as
    * 0.0 EXPLICITLY (the isNullAt guard — getFloat on a null slot is
    * undefined for UnsafeArrayData); the DuckDB oracle applies the same
    * `coalesce(x, 0)` so a sparse-null embedding cannot diverge.
    */
  def compute(v: ArrayData): InternalRow = {
    val n = v.numElements()
    var maxabs = 0.0
    var i = 0
    while (i < n) {
      val ax = math.abs(elem(v, i))
      if (ax > maxabs) maxabs = ax
      i += 1
    }
    val scale = maxabs / 127.0
    var sumq = 0L; var nnz = 0L; var mse = 0.0
    i = 0
    while (i < n) {
      val x = elem(v, i)
      var q = 0L
      if (scale != 0.0) {
        var r = math.floor(x / scale + 0.5)
        if (r > 127.0) r = 127.0
        if (r < -127.0) r = -127.0
        q = r.toLong
      }
      sumq += q
      if (q != 0L) nnz += 1
      val e = x - q * scale
      mse += e * e
      i += 1
    }
    new GenericInternalRow(Array[Any](
      scale, sumq, nnz, if (n > 0) mse / n else 0.0))
  }
}

/** L2 distance from a float vector to a CONSTANT double-precision point
  * (q87's kernel): the point rides inside the expression (a codegen
  * reference object), so the per-row cost is one primitive loop — no
  * array-literal column, no HOF lambda interpretation. Accumulation is a
  * left fold from 0.0 in index order over `(v_i - p_i)²` in double;
  * DuckDB's `list_reduce` over the same zipped list folds identically
  * (its init-free fold starts at element 1, and 0.0 + x ≡ x), and IEEE
  * sqrt is correctly rounded on both engines — so the oracle's doubles
  * are bit-identical.
  */
case class DistToPoint(child: Expression, point: Seq[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dist_to_point"

  @transient private lazy val pointArr: Array[Double] = point.toArray

  override def nullSafeEval(input: Any): Any =
    DistToPoint.dist(input.asInstanceOf[ArrayData], pointArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("point", pointArr, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val diff = ctx.freshName("diff")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $ref.length);
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $diff = ((double) $v.getFloat($i)) - $ref[$i];
         |  $acc += $diff * $diff;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DistToPoint {
  def dist(v: ArrayData, p: Array[Double]): Double = {
    val n = math.min(v.numElements(), p.length)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = v.getFloat(i).toDouble - p(i)
      acc += d * d
      i += 1
    }
    math.sqrt(acc)
  }
}

/** Count of positionally-equal elements of two `array<long>` signatures
  * (q31's est-Jaccard kernel): ONE fused loop over the packed minhash
  * signature arrays in the pair-emission projection. The unpacked form —
  * 16 `when(a_mI === b_mI, 1)` scalar comparisons over 32 projected
  * columns — cost 13-17 s by itself at the official 10× gate corpus
  * (r15 verdict stage-split; equally slow with codegen off), while q66's
  * single-array + fused-cosine shape got FASTER under the same pairsOnce
  * rewrite. Same remedy here: the signature rides the exchange as one
  * array value and the comparison is this primitive loop.
  * Mismatched lengths compare the common prefix; a NULL element never
  * matches anything (including another NULL) — without the guard a null
  * slot reads back as 0 and two nulls silently count as a match,
  * inflating est_jaccard (r16 advice). Codegen emits the null check only
  * when the input schema admits element nulls, so a containsNull=false
  * caller keeps the tight branch-free loop.
  */
case class LongArrayMatches(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "long_array_matches"

  private def elementsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val checkNulls = elementsNullable
    var m = 0
    var i = 0
    while (i < n) {
      if (!(checkNulls && (x.isNullAt(i) || y.isNullAt(i))) &&
        x.getLong(i) == y.getLong(i)) m += 1
      i += 1
    }
    m
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val nullGuard =
        if (elementsNullable) s"!$a.isNullAt($i) && !$b.isNullAt($i) && " else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $m = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($nullGuard$a.getLong($i) == $b.getLong($i)) $m++;
         |}
         |${ev.value} = $m;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  def cosine(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))

  def longArrayMatches(a: Column, b: Column): Column =
    Bridge.column(LongArrayMatches(Bridge.expression(a), Bridge.expression(b)))

  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  def lshBucket(vec: Column, nbits: Int, seed: Long = 42L): Column =
    Bridge.column(LshBucket(Bridge.expression(vec), nbits, seed))

  def distToPoint(vec: Column, point: Seq[Double]): Column =
    Bridge.column(DistToPoint(Bridge.expression(vec), point))

  def quantizeStats(vec: Column): Column =
    Bridge.column(QuantizeStats(Bridge.expression(vec)))

  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  private[functions] val sqlFunctions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (e: Seq[Expression]) => CosineSimilarity(e(0), e(1))),
    (FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (e: Seq[Expression]) => DotProduct(e(0), e(1))),
    (FunctionIdentifier("quantize_stats"),
      new ExpressionInfo(classOf[QuantizeStats].getName, "quantize_stats"),
      (e: Seq[Expression]) => QuantizeStats(e(0))))

  /** Every graft SQL function (vector + text + aggregate registries). */
  private[functions] def allSqlFunctions =
    sqlFunctions ++ TextFunctions.sqlFunctions ++
      HtmlFunctions.sqlFunctions ++
      CappedCollectSetLong.sqlFunctions ++ MisraGriesTopK.sqlFunctions ++
      ArgMaxTieMin.sqlFunctions

  /** Make the functions available to `spark.sql` on a live session. */
  def register(spark: SparkSession): Unit =
    allSqlFunctions.foreach { case (id, info, b) =>
      Bridge.registerFunction(spark, id, info, b)
    }
}

/** SQL-surface wiring at session construction:
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", classOf[GraftExtensions].getName)
  * }}}
  * after which `SELECT cosine_similarity(a, b)` parses anywhere SQL does.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    VectorFunctions.allSqlFunctions.foreach(ext.injectFunction)
}
