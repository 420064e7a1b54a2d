package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document repetition statistics in ONE map-side pass (q44's kernel).
  *
  * The relational form (explode tokens + explode grams → two groupBy
  * aggregations) is semantically clean but shuffles every (doc_id, token)
  * and (doc_id, gram) row — at 100 TB that exchange carries the whole
  * tokenized corpus twice, for numbers that are a pure per-row function of
  * the document. This expression computes them inside the scan's
  * whole-stage-codegen projection instead: zero shuffles, O(tokens) work
  * and O(distinct tokens + distinct grams) transient memory per row.
  *
  * Tokenization contract matches `split(trim(text), "\\s+")` (Spark's
  * split = Java regex split with limit -1) and 3-grams match
  * [[graft.ops.Dedup.gramsOf]] (space-joined, order kept, duplicates
  * kept); the q44 DuckDB oracle pins both.
  */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = RepetitionStats.schema
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"${classOf[RepetitionStats].getName.stripSuffix("$")}$$.MODULE$$.compute($v)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionStats {

  /** (n_toks, top, ng, nu): token count, max single-token count, total
    * 3-grams, distinct 3-grams.
    */
  val schema: StructType = StructType(Seq(
    StructField("n_toks", LongType, nullable = false),
    StructField("top", LongType, nullable = false),
    StructField("ng", LongType, nullable = false),
    StructField("nu", LongType, nullable = false)))

  /** Shared by interpreted eval and generated code. SQL `trim` strips
    * SPACES only (UTF8String.trim matches it); Java's String.trim strips
    * every char <= U+0020 and would silently diverge from the oracle on
    * docs edged with tabs/newlines.
    */
  def compute(text: UTF8String): InternalRow = {
    val toks = text.trim().toString.split("\\s+", -1)
    val counts = new java.util.HashMap[String, Int](toks.length * 2)
    var top = 0
    var i = 0
    while (i < toks.length) {
      val c = counts.merge(toks(i), 1, (a, b) => a + b)
      if (c > top) top = c
      i += 1
    }
    val ng = math.max(0, toks.length - 2)
    val grams = new java.util.HashSet[String](ng * 2)
    i = 0
    while (i + 2 < toks.length) {
      grams.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
      i += 1
    }
    new GenericInternalRow(Array[Any](
      toks.length.toLong, top.toLong, ng.toLong, grams.size.toLong))
  }

  def apply(text: Column): Column = Bridge.column(RepetitionStats(Bridge.expression(text)))
}

/** SQL registrations for the text expressions (concatenated into the
  * session/extension registry by [[VectorFunctions.register]] and
  * [[GraftExtensions]]).
  */
object TextFunctions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  private[functions] val sqlFunctions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("repetition_stats"),
      new ExpressionInfo(classOf[RepetitionStats].getName, "repetition_stats"),
      (e: Seq[Expression]) => RepetitionStats(e(0))))
}
