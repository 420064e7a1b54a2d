package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.HtmlFunctions

/** HTML text extraction (q74) — the crawl-side bridge: WARC payloads are
  * HTML, every downstream operator (dedup, quality, LM scoring) wants
  * text. The kernel is the codegen'd [[graft.functions.HtmlToText]]
  * expression; this module is the pipeline shape + the driver contract.
  *
  * Scale posture: a pure scan-stage projection — no shuffle, no UDF
  * boxing, whole-stage codegen end to end. At 100 TB the extraction cost
  * is one pass over the bytes you were already reading.
  */
object Html {

  /** Extracted text column (see [[graft.functions.HtmlToText]] contract). */
  def extract(html: Column): Column = HtmlFunctions.htmlToText(html)

  /** Minimal HTML-escape for synthesizing test pages from raw text. */
  private def escaped(text: Column): Column =
    regexp_replace(
      regexp_replace(regexp_replace(text, "&", "&amp;"), "<", "&lt;"),
      ">", "&gt;")

  /** The synthesized page: doc text inside a body with the hostile bits a
    * real crawl page has (style with fake markup in a comment, script with
    * comparisons and markup-in-string). Tag-strip identity: extraction
    * returns `\n` + text + `\n\n\n` (</head>, then </p></body></html>).
    */
  private def page(text: Column): Column =
    concat(
      lit("<html><head><meta charset=\"utf-8\">" +
        "<style>p{color:#aaa}/*<p>junk</p>*/</style>" +
        "<script>var i=1; if(i<2){document.write(\"<p>js junk</p>\")}</script>" +
        "</head><body><p>"),
      escaped(text),
      lit("</p></body></html>"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Escape → wrap in a full page (script/style/comment junk included) →
    // extract back. Hash-match against text straight from parquet (plus
    // the constant block separators) proves tag stripping, raw-text
    // skipping, attribute handling, and entity decode are all identities
    // where they must be — on content, not markup.
    "q74_html_extract" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).filter(col("text").isNotNull)
      val extracted = extract(page(col("text")))
      docs.select(
        col("doc_id"),
        length(extracted).cast("long").as("n_chars_out"),
        TextAnalysis.md5Prefix(extracted).as("text_hash"))
    }))

  def oracles: Map[String, String] = Map(
    // The page template contributes exactly 4 newline separators around
    // the payload; everything else is markup and must vanish.
    "q74_html_extract" ->
      """SELECT doc_id,
        |  CAST(length(text) + 4 AS BIGINT) AS n_chars_out,
        |  ('0x' || substring(
        |     md5(chr(10) || text || chr(10) || chr(10) || chr(10)), 1, 8)
        |   )::BIGINT AS text_hash
        |FROM documents WHERE text IS NOT NULL""".stripMargin)
}
