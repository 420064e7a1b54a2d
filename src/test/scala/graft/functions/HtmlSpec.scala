package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Html

/** Clean-room second implementation of the HtmlToText extraction contract
  * (HtmlFunctions.scala scaladoc) for differential fuzzing. Structured
  * differently on purpose: `regionMatches` case-insensitive scans instead
  * of per-char lowering, regex classification for entities, BigInt for
  * numeric overflow. Only the CONTRACT is shared.
  */
private object NaiveRef {

  private val blocks = Set(
    "p", "div", "li", "ul", "ol", "dl", "dt", "dd",
    "h1", "h2", "h3", "h4", "h5", "h6",
    "table", "thead", "tbody", "tfoot", "tr",
    "blockquote", "pre", "section", "article", "header", "footer",
    "main", "nav", "aside", "figure", "figcaption", "form", "fieldset",
    "address", "details", "summary", "head", "body", "html")

  private val named = Map("amp" -> "&", "lt" -> "<", "gt" -> ">",
    "quot" -> "\"", "apos" -> "'", "nbsp" -> " ")

  private val Hex = "[xX]([0-9a-fA-F]+)".r
  private val Dec = "([0-9]+)".r

  private def letter(c: Char) = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  private def alnum(c: Char) = letter(c) || (c >= '0' && c <= '9')

  /** Decoded entity text + chars consumed, or None (literal '&'). */
  private def entity(s: String, at: Int): Option[(String, Int)] = {
    val semi = s.indexOf(';', at + 1)
    if (semi < 0 || semi - at > 12) return None
    val body = s.substring(at + 1, semi)
    val decoded: Option[String] =
      if (body.startsWith("#")) {
        val cp: Option[BigInt] = body.substring(1) match {
          case Hex(h) => Some(BigInt(h, 16))
          case Dec(d) => Some(BigInt(d))
          case _ => None
        }
        cp.filter(v => v <= 0x10ffff && !(v >= 0xd800 && v <= 0xdfff))
          .map(v => new String(Character.toChars(v.toInt)))
      } else named.get(body)
    decoded.map(_ -> (semi + 1 - at))
  }

  /** End of the raw-text run opened by `name`: index just past the close
    * tag's '>', or the end of the document.
    */
  private def rawEnd(s: String, name: String, from: Int): Int = {
    val tgt = "</" + name
    var i = from
    while (i + tgt.length <= s.length) {
      if (s.regionMatches(true, i, tgt, 0, tgt.length)) {
        val a = i + tgt.length
        if (a >= s.length) return s.length
        val c = s.charAt(a)
        if (c == '>' || c == '/' || Character.isWhitespace(c)) {
          val gt = s.indexOf('>', i)
          return if (gt < 0) s.length else gt + 1
        }
      }
      i += 1
    }
    s.length
  }

  /** (name, closing, index past '>'), or None when the tag never closes. */
  private def tag(s: String, at: Int): Option[(String, Boolean, Int)] = {
    val closing = s.charAt(at + 1) == '/'
    var i = at + (if (closing) 2 else 1)
    val start = i
    while (i < s.length && alnum(s.charAt(i))) i += 1
    val name = s.substring(start, i).toLowerCase(java.util.Locale.ROOT)
    // attribute walk: a quote delimits a value only in the
    // before-attribute-value position (just after '=', whitespace ok)
    var expectValue = false
    var inQuote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQuote != 0) { if (c == inQuote) inQuote = 0 }
      else if (c == '>') return Some((name, closing, i + 1))
      else if ((c == '"' || c == '\'') && expectValue) { inQuote = c; expectValue = false }
      else if (c == '=') expectValue = true
      else if (!Character.isWhitespace(c)) expectValue = false
      i += 1
    }
    None
  }

  def extract(s: String): String = {
    val out = new StringBuilder
    val n = s.length
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<' && s.regionMatches(i, "<!--", 0, 4)) {
        val e = s.indexOf("-->", i + 4)
        i = if (e < 0) n else e + 3
      } else if (c == '<' && i + 1 < n &&
          (s.charAt(i + 1) == '!' || s.charAt(i + 1) == '?')) {
        val e = s.indexOf('>', i + 2)
        i = if (e < 0) n else e + 1
      } else if (c == '<' && i + 1 < n && (letter(s.charAt(i + 1)) ||
          (s.charAt(i + 1) == '/' && i + 2 < n && letter(s.charAt(i + 2))))) {
        tag(s, i) match {
          case None => i = n
          case Some((name, closing, next)) =>
            i = next
            if (!closing && (name == "script" || name == "style"))
              i = rawEnd(s, name, next)
            else if (name == "br" || name == "hr") out.append('\n')
            else if (closing && blocks(name)) out.append('\n')
        }
      } else if (c == '<') { out.append('<'); i += 1 }
      else if (c == '&') {
        entity(s, i) match {
          case Some((txt, used)) => out.append(txt); i += used
          case None => out.append('&'); i += 1
        }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }
}

class HtmlSpec extends SparkSpec {
  import HtmlToText.toText

  test("tags stripped, text kept; inline elements emit no separator") {
    assert(toText("<b>bold</b> and <span class=\"x\">span</span>") ===
      "bold and span")
    assert(toText("no markup at all") === "no markup at all")
    assert(toText("") === "")
  }

  test("block closes and br/hr end lines") {
    assert(toText("<p>a</p><p>b</p>") === "a\nb\n")
    assert(toText("a<br>b<br/>c<hr>d") === "a\nb\nc\nd")
    assert(toText("<div><ul><li>x</li><li>y</li></ul></div>") === "x\ny\n\n\n")
    assert(toText("<h1>Title</h1>body") === "Title\nbody")
  }

  test("quoted attribute values may contain > and both quote kinds") {
    assert(toText("<a href=\"u?a>b\" title='c>d'>link</a>") === "link")
    assert(toText("<img alt=\"x>y\">after") === "after")
    // unquoted attributes still terminate at >
    assert(toText("<a href=u>t</a>") === "t")
    // quotes open a value only right after '=' (whitespace allowed): a
    // stray apostrophe in an unquoted value must NOT swallow the document
    assert(toText("<p class=don't>hello</p> world") === "hello\n world")
    assert(toText("<a data-x=a'b href=u>t</a>") === "t")
    assert(toText("<a href = 'u>v'>t</a>") === "t") // spaced = still quotes
  }

  test("script/style raw-text skipped, case-insensitive close, unclosed drops rest") {
    assert(toText("a<script>if(i<2){s=\"</div><p>\"}</script>b") === "ab")
    assert(toText("a<STYLE>p{x:1}/*<p>no</p>*/</StYlE>b") === "ab")
    assert(toText("a<script src=\"x.js\"></script>b") === "ab")
    assert(toText("a<script>never closed <p>gone</p>") === "a")
    // a </script> inside a double-quoted JS string still closes per the
    // HTML5 lexer (browsers do NOT parse JS strings) — pin that behavior
    assert(toText("a<script>s=\"</script>\"visible") === "a\"visible")
    // </stylesheet> does NOT close <style> (close-tag name must end at
    // >, /, or whitespace) — the style element stays open to EOF here
    assert(toText("<style>a{}</stylesheet><p>leaked</p>") === "")
    // but a real close followed by whitespace-then-attrs still closes
    assert(toText("a<style>x</style >b") === "ab")
  }

  test("comments, doctype, and processing instructions dropped") {
    assert(toText("a<!-- <p>gone</p> -->b") === "ab")
    assert(toText("a<!-- unclosed <p>gone") === "a")
    assert(toText("<!doctype html><p>x</p>") === "x\n")
    assert(toText("a<?php echo '>' ?>b") === "a' ?>b") // PI ends at FIRST >
    assert(toText("a<!>b") === "ab")
  }

  test("entities: named, decimal, hex, astral; invalid stays literal") {
    assert(toText("&amp;&lt;&gt;&quot;&apos;") === "&<>\"'")
    assert(toText("&nbsp;") === " ")
    assert(toText("&#65;&#x42;&#x1F600;") === "AB😀")
    assert(toText("&foo; &unknown;") === "&foo; &unknown;")
    assert(toText("&#xD800; &#x110000; &#; &#xZZ;") ===
      "&#xD800; &#x110000; &#; &#xZZ;")
    assert(toText("tail &") === "tail &")
    assert(toText("a &b") === "a &b") // no semicolon within range
  }

  test("literal < that opens nothing stays text") {
    assert(toText("1 < 2 and 3 <4") === "1 < 2 and 3 <4")
    assert(toText("end <") === "end <")
    assert(toText("<3 hearts") === "<3 hearts")
    // unterminated real tag: markup to EOF is dropped
    assert(toText("a<div class=\"x") === "a")
  }

  test("expression: null in, null out; codegen and interpreted agree") {
    import spark.implicits._
    val rnd = new Random(11)
    val docs = (0 until 64).map { i =>
      val junk = Seq("<p>", "</p>", "&amp;", "<script>x</script>", "1<2",
        "<!-- c -->", "&#65;", "<b class=\"q>z\">t</b>")
      (i.toLong, Seq.fill(6)(junk(rnd.nextInt(junk.length))).mkString(s" d$i "))
    } :+ (999L, null.asInstanceOf[String])
    val df = docs.toDF("id", "html")
    val got = df.select($"id", Html.extract($"html").as("t")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1)))
      .toMap
    docs.foreach { case (id, html) =>
      val expect = if (html == null) null else toText(html)
      assert(got(id) === expect, s"id=$id")
    }
  }

  test("fuzz: total on random garbage, and never emits markup on random pages") {
    val rnd = new Random(1234)
    val bits = Seq("<", ">", "&", "\"", "'", "<!--", "-->", "</", "/>",
      "<script>", "</script>", "<p", "p>", "&#", ";", "x", " ", "\n")
    (0 until 500).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(40))(bits(rnd.nextInt(bits.length))).mkString
      toText(s) // must not throw
    }
    (0 until 200).foreach { _ =>
      val words = Seq.fill(rnd.nextInt(8))("w" + rnd.nextInt(100))
      val html = "<html><body>" +
        words.map(w => s"<p>$w</p>").mkString("<!-- x -->") + "</body></html>"
      val t = toText(html)
      assert(!t.contains('<') && !t.contains('>'))
      words.foreach(w => assert(t.contains(w)))
    }
  }

  test("differential fuzz: lexer agrees with an independent naive extractor") {
    // NaiveRef re-implements the documented extraction contract with a
    // deliberately different structure (regionMatches scanning, regex
    // entity classification, BigInt overflow handling) — two independent
    // readings of the same contract; a disagreement on any soup is a bug
    // in one of them.
    val rnd = new Random(20260813)
    val frags = Vector(
      "text", "a b", "<", ">", "&", ";", "=", "'", "\"", " ", "\n", "\t",
      "&amp;", "&AMP;", "&nbsp;", "&nope;", "&averylongentity;", "&;",
      "&#65;", "&#x41;", "&#x1F600;", "&#xD800;", "&#x110000;", "&#;",
      "&#x;", "&#xzz;", "&#+5;", "&#-5;", "&#99999999999;", "&#x" ,
      "<p>", "</p>", "<P >", "</DIV>", "<li>", "</h2>", "</table>",
      "<span>", "</span>", "<br>", "<hr/>", "</br>", "<div/>",
      "<div class=\"a>b\">", "<a title='c>d'>", "<p class=don't>",
      "<a href = 'u>v'>", "<a data-x=a'b href=u>", "<unclosed",
      "<script>", "var x = '<p>';", "</script>", "</script >",
      "</scriptx>", "<style>", "p { }", "</style>", "<SCRIPT>",
      "<!-- c -->", "<!--", "-->", "<!doctype html>", "<? pi >",
      "<![CDATA[x]]>", "<!>", "</3>", "<3 hearts", "İ", "𝒳", " ")
    (0 until 600).foreach { seed =>
      val s = Seq.fill(rnd.nextInt(24))(frags(rnd.nextInt(frags.length)))
        .mkString
      val got = toText(s)
      val expect = NaiveRef.extract(s)
      assert(got === expect,
        s"seed $seed disagreement on:\n$s\nlexer: $got\nnaive: $expect")
    }
  }

  test("q74 e2e: escape→page→extract is the identity plus 4 newlines") {
    import spark.implicits._
    val texts = Seq(
      "plain text",
      "a & b < c > d \"quoted\" 'single'",
      "line\nbreaks\tand tabs",
      "unicode é中文🙂",
      "looks like <script>alert(1)</script> but is text",
      "")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t, t.length.toLong) }
      .toDF("doc_id", "text", "n_chars")
    val rows = Html.queries("q74_html_extract")(spark, "/root/testdata/sf0.001")
    assert(rows.columns.toSeq === Seq("doc_id", "n_chars_out", "text_hash"))
    // on the synthetic frame: run the same pipeline shape directly
    val got = df.select($"doc_id",
      Html.extract(concat(
        lit("<html><head><style>p{}</style></head><body><p>"),
        regexp_replace(regexp_replace(regexp_replace($"text", "&", "&amp;"),
          "<", "&lt;"), ">", "&gt;"),
        lit("</p></body></html>"))).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) === "\n" + t + "\n\n\n", s"doc $i")
    }
  }
}
