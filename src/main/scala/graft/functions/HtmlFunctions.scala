package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HTML → text extraction in ONE map-side pass (q74's kernel) — the step
  * between a WARC crawl read and every text-quality operator downstream.
  *
  * A relational form does not exist (this is inherently a character walk),
  * and a Scala UDF would box every row and block whole-stage codegen; a
  * native expression keeps the crawl→text projection inside the scan
  * stage: zero shuffles, O(len) work, no per-row allocation beyond the
  * output builder.
  *
  * Extraction contract (HTML5-lexer-shaped, hostile-input total):
  *   - tags are dropped; quoted attribute values may contain `>` and are
  *     honored (`<a title="a>b">` is ONE tag);
  *   - `<script>`/`<style>` are raw-text elements: content skipped to the
  *     matching case-insensitive close tag (unclosed → rest of document
  *     skipped, the browser behavior);
  *   - `<!-- comments -->` (unclosed → rest skipped) and `<!doctype>` /
  *     `<? pi >` bogus-comments are dropped;
  *   - closing a BLOCK element (p/div/li/h1..h6/tr/…/body/html) or any
  *     `<br>`/`<hr>` emits `\n`; inline elements (a/b/span/…) emit
  *     nothing — "closing a block ends a line";
  *   - entities: the named core set (amp/lt/gt/quot/apos/nbsp) and
  *     numeric `&#NN;`/`&#xHH;` (astral-plane safe, surrogate/overflow
  *     rejected) are decoded; anything else stays literal;
  *   - a `<` that opens no tag construct is literal text.
  */
case class HtmlToText(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "html_to_text"

  override def nullSafeEval(input: Any): Any =
    HtmlToText.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"${classOf[HtmlToText].getName.stripSuffix("$")}$$.MODULE$$.compute($v)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HtmlToText {

  /** Elements whose CLOSE tag ends a line. */
  private val BlockTags: Set[String] = Set(
    "p", "div", "li", "ul", "ol", "dl", "dt", "dd",
    "h1", "h2", "h3", "h4", "h5", "h6",
    "table", "thead", "tbody", "tfoot", "tr",
    "blockquote", "pre", "section", "article", "header", "footer",
    "main", "nav", "aside", "figure", "figcaption", "form", "fieldset",
    "address", "details", "summary", "head", "body", "html")

  private val NamedEntities: Map[String, Char] = Map(
    "amp" -> '&', "lt" -> '<', "gt" -> '>',
    "quot" -> '"', "apos" -> '\'', "nbsp" -> '\u00a0')

  def compute(input: UTF8String): UTF8String =
    UTF8String.fromString(toText(input.toString))

  private def isLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  /** Case-insensitive ASCII indexOf for the raw-text close-tag scan. */
  private def indexOfIgnoreCase(s: String, target: String, from: Int): Int = {
    val n = s.length
    val m = target.length
    var i = math.max(from, 0)
    while (i + m <= n) {
      var j = 0
      while (j < m && Character.toLowerCase(s.charAt(i + j)) == target.charAt(j)) j += 1
      if (j == m) return i
      i += 1
    }
    -1
  }

  /** First REAL close tag of a raw-text element at/after `from`: the name
    * match must be followed by `>`, `/`, whitespace, or EOF — HTML5 does
    * not close `<style>` at `</stylesheet>`.
    */
  private def findRawClose(html: String, name: String, from: Int): Int = {
    val target = "</" + name
    var idx = indexOfIgnoreCase(html, target, from)
    while (idx >= 0) {
      val after = idx + target.length
      if (after >= html.length) return idx // truncated at EOF
      val c = html.charAt(after)
      if (c == '>' || c == '/' || Character.isWhitespace(c)) return idx
      idx = indexOfIgnoreCase(html, target, idx + 1)
    }
    -1
  }

  /** Decode the entity starting at `s(i) == '&'` into `out`; returns the
    * index after what was consumed (just the `&` when it decodes nothing).
    */
  private def appendEntity(s: String, i: Int, out: java.lang.StringBuilder): Int = {
    val semi = s.indexOf(';', i + 1)
    if (semi < 0 || semi - i > 12) { out.append('&'); return i + 1 }
    val body = s.substring(i + 1, semi)
    if (body.startsWith("#")) {
      val num = body.substring(1)
      // digit-class check before parseInt: Java's parseInt accepts a
      // leading +/- sign, which would decode "&#+5;" — an invalid
      // character reference browsers keep literal
      // ASCII classes only (Character.digit / parseInt also accept
      // unicode digit blocks, which are not valid in a char reference)
      val hex = num.length > 1 && (num.charAt(0) == 'x' || num.charAt(0) == 'X') &&
        num.substring(1).forall(ch => (ch >= '0' && ch <= '9') ||
          (ch >= 'a' && ch <= 'f') || (ch >= 'A' && ch <= 'F'))
      val dec = num.nonEmpty && num.forall(ch => ch >= '0' && ch <= '9')
      val cp =
        try {
          if (hex) Integer.parseInt(num.substring(1), 16)
          else if (dec) Integer.parseInt(num)
          else -1
        } catch { case _: NumberFormatException => -1 } // overflow digits
      val valid = cp >= 0 && cp <= 0x10ffff && !(cp >= 0xd800 && cp <= 0xdfff)
      if (valid) { out.appendCodePoint(cp); semi + 1 }
      else { out.append('&'); i + 1 }
    } else NamedEntities.get(body) match {
      case Some(ch) => out.append(ch); semi + 1
      case None => out.append('&'); i + 1
    }
  }

  def toText(html: String): String = {
    val n = html.length
    val out = new java.lang.StringBuilder(math.min(n, 1 << 16))
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n && (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
          val e = html.indexOf('>', i + 2)
          i = if (e < 0) n else e + 1
        } else if (i + 1 < n && (isLetter(html.charAt(i + 1)) ||
            (html.charAt(i + 1) == '/' && i + 2 < n && isLetter(html.charAt(i + 2))))) {
          val closing = html.charAt(i + 1) == '/'
          var j = i + (if (closing) 2 else 1)
          val nameStart = j
          while (j < n && (isLetter(html.charAt(j)) ||
              (html.charAt(j) >= '0' && html.charAt(j) <= '9'))) j += 1
          val name = html.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
          // quotes delimit a value only right after '=' (whitespace
          // allowed between) — HTML5's before-attribute-value state. A
          // stray apostrophe in an unquoted value (<p class=don't>) is
          // just a value character, NOT an unterminated quote that would
          // swallow the rest of the document.
          var quote: Char = 0
          var end = -1
          var afterEq = false
          while (j < n && end < 0) {
            val ch = html.charAt(j)
            if (quote != 0) { if (ch == quote) quote = 0 }
            else if ((ch == '"' || ch == '\'') && afterEq) { quote = ch; afterEq = false }
            else if (ch == '>') end = j
            else if (ch == '=') afterEq = true
            else if (!Character.isWhitespace(ch)) afterEq = false
            j += 1
          }
          if (end < 0) i = n // unterminated tag: rest is markup, drop it
          else {
            i = end + 1
            if (!closing && (name == "script" || name == "style")) {
              val close = findRawClose(html, name, i)
              if (close < 0) i = n
              else {
                val gt = html.indexOf('>', close)
                i = if (gt < 0) n else gt + 1
              }
            } else if (name == "br" || name == "hr") out.append('\n')
            else if (closing && BlockTags.contains(name)) out.append('\n')
          }
        } else { out.append('<'); i += 1 }
      } else if (c == '&') {
        i = appendEntity(html, i, out)
      } else { out.append(c); i += 1 }
    }
    out.toString
  }
}

object HtmlFunctions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  def htmlToText(html: Column): Column =
    Bridge.column(HtmlToText(Bridge.expression(html)))

  private[functions] val sqlFunctions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("html_to_text"),
      new ExpressionInfo(classOf[HtmlToText].getName, "html_to_text"),
      (e: Seq[Expression]) => HtmlToText(e(0))))
}
