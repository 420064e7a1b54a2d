package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UrlsSpec extends SparkSpec {

  private def norm(urls: (String, String)*): Unit = {
    import spark.implicits._
    val got = urls.map(_._1).toDF("url")
      .select(col("url"), Urls.normalize(col("url")).as("n"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    urls.foreach { case (in, expect) =>
      assert(got(in) === expect, s"input: $in")
    }
  }

  test("scheme/host case folding and www strip") {
    norm(
      "HTTP://WWW.Site.Example.COM/a" -> "http://site.example.com/a",
      "https://Example.com/A/B" -> "https://example.com/A/B", // path case kept
      "http://wwwx.example.com/" -> "http://wwwx.example.com/") // not a www. prefix
  }

  test("default ports dropped, custom ports kept, empty path becomes /") {
    norm(
      "http://example.com:80/a" -> "http://example.com/a",
      "https://example.com:443/a" -> "https://example.com/a",
      "http://example.com:8443/a" -> "http://example.com:8443/a",
      "https://example.com:80/a" -> "https://example.com:80/a", // 80 is NOT https default
      "http://example.com" -> "http://example.com/",
      "HTTP://WWW.Example.COM:80" -> "http://example.com/")
  }

  test("tracking params removed, survivor order preserved, fragment dropped") {
    norm(
      "http://e.com/p?utm_source=x&id=1&utm_campaign=y&b=2" -> "http://e.com/p?id=1&b=2",
      "http://e.com/p?gclid=abc&fbclid=def" -> "http://e.com/p",
      "http://e.com/p?b=2&a=1" -> "http://e.com/p?b=2&a=1", // never re-sorted
      "http://e.com/p?id=5#frag" -> "http://e.com/p?id=5",
      "http://e.com/p#frag" -> "http://e.com/p",
      // utm must match as a PREFIX of a param, not anywhere in it
      "http://e.com/p?xutm_source=1" -> "http://e.com/p?xutm_source=1",
      // bare (value-less) click-ids are tracking params too
      "http://e.com/p?fbclid&id=1&gclid" -> "http://e.com/p?id=1")
  }

  test("unparseable input and NULL stay NULL; non-http schemes pass through") {
    import spark.implicits._
    val rows = Seq[String]("not a url at all", null, "ftp://files.example.com/f")
      .toDF("url").select(Urls.normalize(col("url"))).collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).isNullAt(0))
    assert(rows(2).getString(0) === "ftp://files.example.com/f")
  }

  test("canonicalization is idempotent") {
    import spark.implicits._
    val messy = Seq(
      "HTTP://WWW.Site.com:80/a?utm_source=x&id=1#top",
      "https://A.B.com:8443/x/?fbclid=1&q=2",
      "http://example.com")
    val once = messy.toDF("url").select(Urls.normalize(col("url")).as("n"))
    val twice = once.select(Urls.normalize(col("n")).as("n2"),  col("n"))
      .collect()
    twice.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("composition: spellings of the same page collapse under q30-style dedup") {
    import spark.implicits._
    val df = Seq(
      (1L, "HTTP://WWW.site.com:80/page?utm_source=a&id=7"),
      (2L, "http://site.com/page?id=7"),
      (3L, "http://site.com/other"))
      .toDF("doc_id", "url")
      .select(col("doc_id"), Urls.normalize(col("url")).as("u"))
      .groupBy(col("u")).agg(min(col("doc_id")).as("keep"))
    val kept = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.size === 2)
    assert(kept("http://site.com/page?id=7") === 1L)
  }

  test("q90 hostProfile: hand-checked groups, spellings collapse, NULL text") {
    import spark.implicits._
    // a.com appears under three spellings of TWO pages; b.com has one doc
    // with NULL text (counts toward n_docs, not toward token/char sums)
    val docs = Seq(
      ("HTTP://WWW.A.com:80/p?utm_source=x&id=1", "one two", Some(7L)),
      ("http://a.com/p?id=1", "three", Some(5L)),
      ("https://a.com/q", "four five six", Some(13L)),
      ("http://b.com/", null, None))
      .toDF("url", "text", "n_chars")
    val got = Urls.hostProfile(docs, col("url"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) null else r.getLong(3),
          if (r.isNullAt(4)) null else r.getDouble(4))).toMap
    assert(got.keySet === Set("a.com", "b.com"))
    // a.com: 3 docs, 2 distinct canonical urls (the first two collapse),
    // 2+1+3 tokens, avg chars (7+5+13)/3 rounded to 6dp
    assert(got("a.com") === ((3L, 2L, 6L,
      BigDecimal(25.0 / 3).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)))
    // b.com: the NULL-text doc counts as a doc/page but contributes no
    // tokens or chars — both sums stay NULL, like the oracle's
    assert(got("b.com") === ((1L, 1L, null, null)))
  }
}
