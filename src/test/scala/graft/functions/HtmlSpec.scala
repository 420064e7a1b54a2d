package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Html

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
