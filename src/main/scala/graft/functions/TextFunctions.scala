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

/** Per-document line-filter statistics in one map-side pass (q55's
  * kernel — the C4-style boilerplate heuristic: short lines and lines
  * without terminal punctuation are navigation chrome / menu debris, not
  * prose). Per line (split on `\n`, trimmed of spaces/tabs/CR): KEPT ⇔
  * ≥ 20 codepoints AND ends with `.`, `!` or `?`.
  *
  * Same zero-shuffle argument as [[RepetitionStats]]: these are pure
  * per-row functions; the relational form would explode every line of the
  * corpus through an exchange. Trim/length semantics are pinned to the
  * DuckDB oracle: trim set = space/tab/CR explicitly (NOT Java's
  * `String.trim`, which strips all of U+0000..U+0020), length counted in
  * codepoints (DuckDB `len`; NOT UTF-16 units).
  */
case class LineStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LineStats.schema
  override def prettyName: String = "line_stats"

  override def nullSafeEval(input: Any): Any =
    LineStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"${classOf[LineStats].getName.stripSuffix("$")}$$.MODULE$$.compute($v)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LineStats {

  /** (n_lines, n_kept, kept_chars): total lines, lines passing the filter,
    * summed codepoint length of the passing (trimmed) lines.
    */
  val schema: StructType = StructType(Seq(
    StructField("n_lines", LongType, nullable = false),
    StructField("n_kept", LongType, nullable = false),
    StructField("kept_chars", LongType, nullable = false)))

  private def isTrim(c: Char): Boolean = c == ' ' || c == '\t' || c == '\r'

  /** Shared by interpreted eval and generated code. */
  def compute(text: UTF8String): InternalRow = {
    val lines = text.toString.split("\n", -1)
    var nKept = 0L
    var keptChars = 0L
    var li = 0
    while (li < lines.length) {
      val raw = lines(li)
      var a = 0
      var b = raw.length
      while (a < b && isTrim(raw.charAt(a))) a += 1
      while (b > a && isTrim(raw.charAt(b - 1))) b -= 1
      val n = raw.codePointCount(a, b)
      if (n >= 20) {
        val last = raw.charAt(b - 1)
        if (last == '.' || last == '!' || last == '?') {
          nKept += 1
          keptChars += n
        }
      }
      li += 1
    }
    new GenericInternalRow(Array[Any](lines.length.toLong, nKept, keptChars))
  }

  def apply(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    Bridge.column(LineStats(Bridge.expression(text)))
}

/** 64-bit hashes of ALL word n-grams of a token array, in order,
  * duplicates kept; empty array for docs under n tokens (the
  * [[graft.ops.Dedup.gramsN]] window contract, hashed).
  *
  * Why it exists: every gram pipeline (Jaccard dedup, decontamination,
  * duplicated-span analysis) used to build the gram STRING
  * (`concat_ws(" ", slice(...))` — up to n tokens of byte copying per
  * position) only to `xxhash64` it one projection later. The hash is all
  * that ever leaves the row, so this expression computes it directly:
  * one XXH64 per token, then an O(tokens) polynomial rolling combine —
  * no gram string, no slice, no per-position re-concatenation. The hash
  * family differs from `xxhash64(gram-string)` but that only RENAMES
  * grams (the q33 oracle argument): df-caps, distinct sets,
  * intersections and counts are identical, and the DuckDB oracles
  * compute over gram strings independently.
  *
  * Collisions: token hashes are XXH64 (seed 42, Spark's xxhash64 seed);
  * the window combine is an order-sensitive degree-(n-1) polynomial in
  * an odd prime over Z/2^64 — two windows collide with ~2^-64
  * probability, the same class as the xxhash64-rename argument.
  */
case class HashedGrams(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n > 0, s"n must be positive, got $n")

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_grams"

  override def nullSafeEval(input: Any): Any =
    HashedGrams.compute(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = ${classOf[HashedGrams].getName.stripSuffix("$")}$$.MODULE$$" +
        s".compute($v, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedGrams {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  /** Odd multiplier for the rolling polynomial (splitmix64's constant). */
  private val P = 0x9E3779B97F4A7C15L

  /** Shared by interpreted eval and generated code. */
  def compute(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    if (len < n) return new GenericArrayData(Array.emptyLongArray)
    // one XXH64 per token (Spark's xxhash64 seed), reused by every window
    val th = new Array[Long](len)
    var i = 0
    while (i < len) {
      val t = toks.getUTF8String(i)
      th(i) = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes(), 42L)
      i += 1
    }
    // pN = P^(n-1): the weight the outgoing token carries in the window
    var pN = 1L
    i = 1
    while (i < n) { pN *= P; i += 1 }
    val out = new Array[Long](len - n + 1)
    var h = 0L
    i = 0
    while (i < n) { h = h * P + th(i); i += 1 }
    out(0) = h
    i = 1
    while (i <= len - n) {
      h = (h - th(i - 1) * pN) * P + th(i + n - 1)
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Multi-width form of [[HashedGrams]] for width-sweep screens (q108):
  * hashes each token ONCE and rolls every requested width over the shared
  * token-hash array, emitting the per-width DISTINCT gram set as (w, g)
  * structs. Calling [[HashedGrams]] once per width re-hashes every token
  * of the document per width — for a 3-width sweep that triples the
  * dominant per-row CPU; this is the single-pass spelling. Gram values
  * are identical to [[HashedGrams]]'s (same rolling polynomial), so the
  * gram space stays shared with the single-width screens.
  */
case class HashedGramsTagged(child: Expression, ns: Seq[Int])
    extends UnaryExpression with ExpectsInputTypes {

  require(ns.nonEmpty && ns.forall(_ > 0), s"widths must be positive: $ns")

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = HashedGramsTagged.schema
  override def prettyName: String = "hashed_grams_tagged"

  override def nullSafeEval(input: Any): Any =
    HashedGramsTagged.compute(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      ns.toArray)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val nsRef = ctx.addReferenceObj("widths", ns.toArray, "int[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = ${classOf[HashedGramsTagged].getName.stripSuffix("$")}$$.MODULE$$" +
        s".compute($v, $nsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedGramsTagged {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  val schema: DataType = ArrayType(StructType(Seq(
    StructField("w", IntegerType, nullable = false),
    StructField("g", LongType, nullable = false))), containsNull = false)

  private val P = 0x9E3779B97F4A7C15L

  /** Shared by interpreted eval and generated code. */
  def compute(toks: ArrayData, ns: Array[Int]): ArrayData = {
    val len = toks.numElements()
    val th = new Array[Long](len)
    var i = 0
    while (i < len) {
      val t = toks.getUTF8String(i)
      th(i) = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes(), 42L)
      i += 1
    }
    val rows = scala.collection.mutable.ArrayBuffer.empty[Any]
    var wi = 0
    while (wi < ns.length) {
      val n = ns(wi)
      if (len >= n) {
        // per-width distinct (the gramArray = array_distinct contract);
        // capacity sized to the window count like HashedGrams' output
        val seen = new java.util.HashSet[java.lang.Long]((len - n + 1) * 2)
        var pN = 1L
        i = 1
        while (i < n) { pN *= P; i += 1 }
        var h = 0L
        i = 0
        while (i < n) { h = h * P + th(i); i += 1 }
        if (seen.add(h)) rows += new GenericInternalRow(Array[Any](n, h))
        i = 1
        while (i <= len - n) {
          h = (h - th(i - 1) * pN) * P + th(i + n - 1)
          if (seen.add(h)) rows += new GenericInternalRow(Array[Any](n, h))
          i += 1
        }
      }
      wi += 1
    }
    new GenericArrayData(rows.toArray)
  }
}

/** Strip every `w`-token window starting at one of `positions` (0-based
  * token indexes, any order) from a token array; returns
  * `struct(n_tok, n_kept, text_clean)` with the kept tokens re-joined by
  * single spaces. The apply step of duplicated-span removal (q70): q69's
  * machinery marks which window starts are cross-doc duplicates, this
  * expression cuts them out of the document map-side.
  *
  * One fused pass (sort positions + two-pointer coverage sweep —
  * O(n log n) in the dup-position count, O(tokens) in the doc) inside
  * whole-stage codegen; the HOF `filter(exists(...))` form would be
  * CodegenFallback AND O(tokens x positions).
  */
case class StripSpans(left: Expression, right: Expression, w: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {

  require(w > 0, s"w must be positive, got $w")

  override def inputTypes = Seq(ArrayType(StringType), ArrayType(LongType))
  override def dataType: DataType = StripSpans.schema
  override def prettyName: String = "strip_spans"

  override def nullSafeEval(toks: Any, pos: Any): Any =
    StripSpans.compute(toks.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      pos.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, p) =>
      s"${ev.value} = ${classOf[StripSpans].getName.stripSuffix("$")}$$.MODULE$$" +
        s".compute($t, $p, $w);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object StripSpans {
  import org.apache.spark.sql.catalyst.util.ArrayData

  val schema: StructType = StructType(Seq(
    StructField("n_tok", LongType, nullable = false),
    StructField("n_kept", LongType, nullable = false),
    StructField("text_clean", StringType, nullable = false)))

  /** Shared by interpreted eval and generated code. */
  def compute(toks: ArrayData, pos: ArrayData, w: Int): InternalRow = {
    val n = toks.numElements()
    val np = pos.numElements()
    val ps = new Array[Long](np)
    var i = 0
    while (i < np) { ps(i) = pos.getLong(i); i += 1 }
    java.util.Arrays.sort(ps)
    val sb = new java.lang.StringBuilder
    var kept = 0L
    var cover = Long.MinValue // strip token t while t < cover
    var j = 0
    i = 0
    while (i < n) {
      while (j < np && ps(j) <= i) {
        val end = ps(j) + w
        if (end > cover) cover = end
        j += 1
      }
      if (i >= cover) {
        if (kept > 0) sb.append(' ')
        sb.append(toks.getUTF8String(i).toString)
        kept += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      n.toLong, kept, UTF8String.fromString(sb.toString)))
  }
}

/** q53/q92's text normalization in ONE map-side byte pass: ascii
  * lowercase, strip every char outside [a-z0-9 space tab LF CR], collapse
  * whitespace runs to single spaces, trim. Byte-identical to the
  * translate + two-regexp_replace + trim composition it replaces (the
  * [[graft.ops.Curation.normText]] contract, pinned by the q53/q92 DuckDB
  * oracles): ASCII decisions are byte decisions in UTF-8 — multibyte
  * codepoints are all ≥ 0x80 bytes, which the strip removes exactly like
  * the regex removed the codepoint — and the output is pure ASCII. The
  * regex form ran two NFA passes plus a translate over every document;
  * this is a single linear scan inside whole-stage codegen.
  */
case class NormText(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "norm_text"

  override def nullSafeEval(input: Any): Any =
    NormText.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"${classOf[NormText].getName.stripSuffix("$")}$$.MODULE$$.compute($v)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormText {
  /** Shared by interpreted eval and generated code. Emits a pending
    * single space only between two kept characters — leading/trailing
    * whitespace and runs collapse exactly like
    * `trim(regexp_replace(regexp_replace(translate(...)), ...))` did.
    */
  def compute(text: UTF8String): UTF8String = {
    val n = text.numBytes()
    val out = new Array[Byte](n)
    var o = 0
    var pendingSpace = false
    var i = 0
    while (i < n) {
      var b = text.getByte(i)
      if (b >= 'A' && b <= 'Z') b = (b + 32).toByte
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        if (pendingSpace && o > 0) { out(o) = ' '; o += 1 }
        pendingSpace = false
        out(o) = b
        o += 1
      } else if (b == ' ' || b == '\t' || b == '\n' || b == '\r') {
        pendingSpace = true
      } // anything else (incl. every UTF-8 continuation byte) is stripped
      i += 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, o))
  }

  def apply(text: Column): Column = Bridge.column(NormText(Bridge.expression(text)))
}

/** q32's 64-bit SimHash in ONE map-side pass over the token array:
  * distinct tokens (string identity, matching `array_distinct`), one
  * XXH64 per token (Spark's xxhash64 seed 42 — the same hash the explode
  * form computed), ±1 votes per bit, bit set iff votes > 0. Replaces the
  * explode + 64-sum-aggregate form: the signature is a pure per-row
  * function, so the tokenized corpus never leaves its input partition
  * (the [[RepetitionStats]] argument) and the 64 per-token vote updates
  * run in a primitive array loop instead of a 64-column aggregate buffer.
  */
case class SimhashBits(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_bits"

  override def nullSafeEval(input: Any): Any =
    SimhashBits.compute(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = ${classOf[SimhashBits].getName.stripSuffix("$")}$$.MODULE$$" +
        s".compute($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashBits {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.sql.catalyst.util.ArrayData

  /** Shared by interpreted eval and generated code. */
  def compute(toks: ArrayData): Long = {
    val n = toks.numElements()
    val votes = new Array[Int](64)
    val seen = new java.util.HashSet[UTF8String](n * 2)
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      // NULL elements are skipped instead of NPE-ing (r21 advice:
      // inputTypes admits containsNull=true arrays, so a future caller
      // could pass one — Dedup.tokens, the only caller today, is split()
      // output and never produces a null element, so results are
      // unchanged)
      if (t != null && seen.add(t)) {
        val h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes(), 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sh = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sh |= (1L << j)
      j += 1
    }
    sh
  }

  def apply(tokens: Column): Column =
    Bridge.column(SimhashBits(Bridge.expression(tokens)))
}

/** q31's minhash signature in ONE map-side pass over the hashed-gram
  * array: distinct gram hashes (matching `array_distinct` on the raw
  * 64-bit values), h ↦ pmod(h, p), and the k permutation minima
  * min((h·aᵢ) mod p) — value-for-value the explode + k-min-aggregate
  * form (h, aᵢ < p = 2³¹−1, so products stay under 2⁶², the same
  * no-overflow argument as the aggregate spelling). An empty gram array
  * (doc under n tokens) returns the all-p sentinel signature — the row
  * equivalent of the aggregate form having no row (the
  * [[graft.ops.Dedup.SigSentinel]] contract).
  */
case class MinhashSig(child: Expression, perms: Seq[Long], p: Long)
    extends UnaryExpression with ExpectsInputTypes {

  require(perms.nonEmpty && p > 0, s"need perms and a positive modulus")

  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  // hoisted once per expression instance: nullSafeEval runs per ROW on
  // interpreted/fallback paths, and perms.toArray there allocated a fresh
  // array per document (r21 advice; the codegen path already hoists via
  // addReferenceObj)
  @transient private lazy val permsArr: Array[Long] = perms.toArray

  override def nullSafeEval(input: Any): Any =
    MinhashSig.compute(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      permsArr, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val permsRef = ctx.addReferenceObj("perms", perms.toArray, "long[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = ${classOf[MinhashSig].getName.stripSuffix("$")}$$.MODULE$$" +
        s".compute($v, $permsRef, ${p}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashSig {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  /** Shared by interpreted eval and generated code. */
  def compute(gs: ArrayData, perms: Array[Long], p: Long): ArrayData = {
    val k = perms.length
    val m = new Array[Long](k)
    java.util.Arrays.fill(m, p)
    val n = gs.numElements()
    val seen = new java.util.HashSet[java.lang.Long](n * 2)
    var i = 0
    while (i < n) {
      val g = gs.getLong(i)
      if (seen.add(g)) {
        var hm = g % p
        if (hm < 0) hm += p
        var j = 0
        while (j < k) {
          val v = (hm * perms(j)) % p
          if (v < m(j)) m(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(m)
  }

  def apply(gramHashes: Column, perms: Seq[Long], p: Long): Column =
    Bridge.column(MinhashSig(Bridge.expression(gramHashes), perms, p))
}

/** SQL registrations for the text expressions (concatenated into the
  * session/extension registry by [[VectorFunctions.register]] and
  * [[GraftExtensions]]).
  */
object TextFunctions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  def stripSpans(tokens: Column, positions: Column, w: Int): Column =
    Bridge.column(StripSpans(
      Bridge.expression(tokens), Bridge.expression(positions), w))

  def hashedGrams(tokens: Column, n: Int): Column =
    Bridge.column(HashedGrams(Bridge.expression(tokens), n))

  def hashedGramsTagged(tokens: Column, ns: Seq[Int]): Column =
    Bridge.column(HashedGramsTagged(Bridge.expression(tokens), ns))

  private[functions] val sqlFunctions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("repetition_stats"),
      new ExpressionInfo(classOf[RepetitionStats].getName, "repetition_stats"),
      (e: Seq[Expression]) => RepetitionStats(e(0))),
    (FunctionIdentifier("line_stats"),
      new ExpressionInfo(classOf[LineStats].getName, "line_stats"),
      (e: Seq[Expression]) => LineStats(e(0))),
    (FunctionIdentifier("strip_spans"),
      new ExpressionInfo(classOf[StripSpans].getName, "strip_spans"),
      (e: Seq[Expression]) => {
        require(e.length == 3 && e(2).foldable && e(2).eval() != null,
          "strip_spans(tokens, positions, w) needs a non-null literal w")
        StripSpans(e(0), e(1), e(2).eval().asInstanceOf[Number].intValue())
      }))
}
