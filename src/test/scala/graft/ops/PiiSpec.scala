package graft.ops

import graft.SparkSpec

class PiiSpec extends SparkSpec {

  private def run(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    Pii.detect(rows.toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5), r.getLong(6)))
  }

  test("counts each PII category on planted docs") {
    val out = run(Seq(
      (1L, "contact john.doe@example.com or jane_smith+tag@sub.example.org today"),
      (2L, "call 555-123-4567 or 555-987-6543 after noon"),
      (3L, "server at 10.0.0.1 and 192.168.254.254 responded"),
      (4L, "account 123456789 and card 98765432109876 on file"),
      (5L, "no personal information in this sentence at all")))
    assert(out(0)._2 == 2 && out(0)._7 == 2)
    assert(out(1)._3 == 2 && out(1)._7 == 2)
    assert(out(2)._4 == 2 && out(2)._7 == 2)
    assert(out(3)._5 == 2 && out(3)._7 == 2)
    assert(out(4)._7 == 0)
  }

  test("redaction replaces every match with its typed placeholder") {
    val out = run(Seq(
      (1L, "mail a@b.io, ip 10.0.0.1, tel 555-123-4567, id 123456789")))
    assert(out(0)._6 == "mail <EMAIL>, ip <IP>, tel <PHONE>, id <ID>")
  }

  test("clean text passes through unchanged; NULL text is excluded") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "hello plain world"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Pii.detect(df).collect()
    assert(out.length == 1)
    assert(out(0).getString(5) == "hello plain world")
  }

  test("property: fuzzed PII concatenations match an independent reference fold") {
    // Adversarial overlap surface: PII atoms glued together with empty or
    // noisy separators (digit runs abutting phones, ids inside emails,
    // ip-like prefixes of long digit runs). The reference is a separately
    // written fold over the same pattern list — it pins the SQL wiring
    // (counts over ORIGINAL text, email→ipv4→phone→id redaction order,
    // non-overlapping leftmost matching) rather than trusting the query.
    val atoms = Vector(
      "a@b.io", "john.doe@example.com", "123456789@example.com",
      "555-123-4567", "555-987-6543", "10.0.0.1", "192.168.254.254",
      "123456789", "98765432109876", "12345678", "999", "4567",
      "word", "x", "@", ".", "-", "example.org")
    val seps = Vector("", " ", "", ",", " and ", "")
    val rnd = new scala.util.Random(0xC0FFEE)
    val docs = (0 until 300).map { i =>
      val n = 1 + rnd.nextInt(8)
      val parts = Seq.fill(n)(atoms(rnd.nextInt(atoms.length)))
      (i.toLong, parts.reduceLeft((a, b) => a + seps(rnd.nextInt(seps.length)) + b))
    }
    def ref(text: String) = {
      def cnt(p: String) = p.r.findAllMatchIn(text).length.toLong
      val red = Seq(Pii.Email -> "<EMAIL>", Pii.Ipv4 -> "<IP>",
        Pii.Phone -> "<PHONE>", Pii.LongId -> "<ID>")
        .foldLeft(text) { case (t, (p, r)) => t.replaceAll(p, r) }
      (cnt(Pii.Email), cnt(Pii.Phone), cnt(Pii.Ipv4), cnt(Pii.LongId), red)
    }
    val out = run(docs)
    assert(out.length == docs.length)
    out.foreach { case (id, ne, np, ni, nl, red, tot) =>
      val (re, rp, ri, rl, rr) = ref(docs(id.toInt)._2)
      assert((ne, np, ni, nl) == (re, rp, ri, rl),
        s"doc $id counts: got (${ne},${np},${ni},${nl}) want (${re},${rp},${ri},${rl}) for '${docs(id.toInt)._2}'")
      assert(red == rr, s"doc $id redaction: got '$red' want '$rr'")
      assert(tot == ne + np + ni + nl)
    }
  }

  test("q103 piiProfile: per-source incidence, density, and null guards") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      // A: one clean doc (4 tokens), one doc with 2 PII hits (4 tokens)
      (1L, "clean text no pii", "A"),
      (2L, "mail a@b.io ip 10.0.0.1", "A"),
      // B: all clean
      (3L, "nothing here", "B"),
      (4L, null.asInstanceOf[String], "A"),  // null text: dropped
      (5L, "a@b.io", null.asInstanceOf[String]))  // null source: dropped
      .toDF("doc_id", "text", "source")
    val r = Pii.piiProfile(docs).collect()
      .map(w => w.getString(0) -> ((w.getLong(1), w.getLong(2), w.getLong(3),
        w.getLong(4), w.getLong(5), w.getLong(6), w.getLong(7), w.getLong(8),
        w.getDouble(9), w.getDouble(10)))).toMap
    assert(r === Map(
      // A: 2 docs, 1 with pii; 1 email + 1 ipv4; 8 tokens; rate 0.5;
      // 2 hits per 8 tokens = 250 per ktok
      "A" -> ((2L, 1L, 1L, 0L, 1L, 0L, 2L, 8L, 0.5, 250.0)),
      "B" -> ((1L, 0L, 0L, 0L, 0L, 0L, 0L, 2L, 0.0, 0.0))))
  }

  test("counts are over the original text even where redactions nest") {
    // the ip is ALSO three digit runs but under 9 digits: no longid match;
    // an id inside an email is protected by the email redaction running first
    val out = run(Seq((1L, "reach 123456789@example.com or 1.2.3.4")))
    assert(out(0)._2 == 1)     // email
    assert(out(0)._4 == 1)     // ipv4
    assert(out(0)._5 == 1)     // the digit run inside the email address
    assert(out(0)._6 == "reach <EMAIL> or <IP>")
  }
}
