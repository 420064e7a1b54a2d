package graft.ops

import graft.SparkSpec

/** BM25 ranked retrieval (q72): differential check against a plain-Scala
  * BM25 reference on a hand-sized corpus, plus the contract edges (live-doc
  * exclusion, top-k cut, term validation).
  */
class SearchSpec extends SparkSpec {

  private val k1 = 1.2
  private val b  = 0.75

  /** Plain-Scala Okapi BM25 with the Lucene IDF — the independent
    * reference implementation the Spark plan must reproduce.
    */
  private def refBm25(corpus: Seq[(Long, String)], terms: Seq[String])
      : Map[Long, (Long, Long, Double)] = {
    val toks = corpus.map { case (id, t) => id -> t.trim.split("\\s+").toSeq }
    val n = toks.size
    val avgdl = toks.map(_._2.size).sum.toDouble / n
    val dfs = terms.map { t => t -> toks.count(_._2.contains(t)) }.toMap
    toks.flatMap { case (id, ts) =>
      val dl = ts.size.toLong
      val hits = terms.flatMap { t =>
        val tf = ts.count(_ == t)
        if (tf == 0 || dfs(t) == 0) None
        else {
          val idf = math.log(1 + (n - dfs(t) + 0.5) / (dfs(t) + 0.5))
          Some(idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl)))
        }
      }
      if (hits.isEmpty) None
      else Some(id -> ((dl, hits.size.toLong,
        BigDecimal(hits.sum).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)))
    }.toMap
  }

  private val corpus = Seq[(Long, String)](
    1L -> "spark spark hash",
    2L -> "window join",
    3L -> "spark window window window",
    4L -> "filter scan merge",
    5L -> "hash hash hash spark window merge join scan")

  test("q72: scores, dl, n_terms match the plain-Scala BM25 reference") {
    val dir = docsDir(corpus)
    val got = Search.bm25(graft.Tables.documents(spark, dir),
        Search.QueryTerms, k = 20)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getInt(4))))
      .toMap
    val want = refBm25(corpus, Search.QueryTerms)
    assert(got.keySet === want.keySet) // d4 (no query terms) absent
    want.foreach { case (id, (dl, nTerms, score)) =>
      val (gDl, gN, gScore, _) = got(id)
      assert(gDl === dl, s"doc $id dl")
      assert(gN === nTerms, s"doc $id n_terms")
      assert(math.abs(gScore - score) < 1e-9, s"doc $id score: $gScore vs $score")
    }
    // ranks are 1..n in (score desc, doc_id asc) order
    val ranked = got.toSeq.sortBy { case (_, (_, _, _, r)) => r }
    assert(ranked.map(_._2._4) === (1 to ranked.size))
    val scoresInRankOrder = ranked.map(_._2._3)
    assert(scoresInRankOrder === scoresInRankOrder.sorted.reverse)
  }

  test("q72: top-k cut keeps the k best-ranked docs") {
    val dir = docsDir(corpus)
    val all = Search.bm25(graft.Tables.documents(spark, dir),
      Search.QueryTerms, k = 20).collect().sortBy(_.getInt(4))
    val top2 = Search.bm25(graft.Tables.documents(spark, dir),
      Search.QueryTerms, k = 2).collect().sortBy(_.getInt(4))
    assert(top2.length === 2)
    assert(top2.map(_.getLong(0)).toSeq === all.take(2).map(_.getLong(0)).toSeq)
  }

  test("q72: NULL and whitespace-only docs are excluded from N and avgdl") {
    val base = docsDir(corpus)
    val noisy = docsDir(corpus ++ Seq(90L -> null.asInstanceOf[String],
      91L -> " \t\n ", 92L -> ""))
    val clean = Search.bm25(graft.Tables.documents(spark, base),
      Search.QueryTerms).collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val got = Search.bm25(graft.Tables.documents(spark, noisy),
      Search.QueryTerms).collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got === clean) // identical scores ⇒ identical N/avgdl
  }

  test("q72: empty or whitespace-bearing query terms are rejected") {
    val dir = docsDir(corpus)
    val docs = graft.Tables.documents(spark, dir)
    intercept[IllegalArgumentException](Search.bm25(docs, Seq.empty))
    intercept[IllegalArgumentException](Search.bm25(docs, Seq("a b")))
    intercept[IllegalArgumentException](Search.bm25(docs, Seq("")))
  }
}
