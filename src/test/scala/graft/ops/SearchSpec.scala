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

  test("q119: hand-counted Dice ppm, min-support cut, empty-token hygiene") {
    // hand counts: "a b a b a b" → bigrams (a,b)×3 (b,a)×2; "new york"×3
    // docs → (new,york)×3; unigrams a=3 b=3 new=3 york=3. With
    // minCount=3: (b,a) is cut, (a,b) and (new,york) survive with
    // dice = ⌊2e6·3/(3+3)⌋ = 1_000_000. The tab/newline-edged doc
    // contributes its pair ONCE (empty tokens never form bigrams).
    val dir = docsDir(Seq(
      1L -> "a b a b a b",
      2L -> "new york",
      3L -> "\tnew   york\n",
      4L -> " new york ",
      5L -> null.asInstanceOf[String]))
    val got = Search.collocations(graft.Tables.documents(spark, dir))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got.keySet === Set(("a", "b"), ("new", "york")))
    assert(got(("a", "b")) === ((3L, 3L, 3L, 1000000L)))
    assert(got(("new", "york")) === ((3L, 3L, 3L, 1000000L)))
  }

  test("q119: top-k cut rides a total order (dice, support, w1, w2)") {
    // six distinct pairs, all support 3, all dice 1e6 — the cut at k=3
    // must be decided by (w1, w2) alone and reproduce exactly
    val pairs = Seq("p q", "r s", "t u", "v w", "x y", "z zz")
    val dir = docsDir(pairs.zipWithIndex.flatMap { case (p, i) =>
      (0 until 3).map(j => (i * 10L + j) -> p)
    })
    val docs = graft.Tables.documents(spark, dir)
    val top3 = Search.collocations(docs, k = 3).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(top3.toSet === Set(("p", "q"), ("r", "s"), ("t", "u")))
    // and the plan's cut is a TakeOrderedAndProject, never a global sort
    val plan = Search.collocations(docs, k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q119 driver query matches a naive local derivation at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("text").collect().flatMap(r => Option(r.getString(0)))
    val toks = docs.map(_.trim.split("\\s+").filter(_.nonEmpty).toSeq)
    val uni = toks.flatten.groupBy(identity).map { case (w, o) => w -> o.size.toLong }
    val pair = toks.filter(_.length >= 2)
      .flatMap(t => t.zip(t.tail))
      .groupBy(identity).map { case (p, o) => p -> o.size.toLong }
      .filter(_._2 >= 3L)
    val scored = pair.toSeq.map { case ((w1, w2), c) =>
      (w1, w2, c, uni(w1), uni(w2), 2000000L * c / (uni(w1) + uni(w2)))
    }
    val expect = scored
      .sortBy { case (w1, w2, c, _, _, d) => (-d, -c, w1, w2) }.take(100)
    val got = graft.SparkEntry.queries("q119_colloc_dice")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq === expect)
  }
}
