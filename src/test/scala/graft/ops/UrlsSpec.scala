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
}
