package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Bigram language-model quality scoring — the perplexity-proxy filter a
  * curation pipeline runs to rank documents by fluency against an
  * in-domain reference (the CCNet-style "score with a small LM trained on
  * trusted text, keep the head" recipe, here with an add-one-smoothed
  * bigram model instead of a learned one).
  *
  * Model: P(w2|w1) = (c2("w1 w2") + 1) / (c1(w1) + V) with c2/c1 counts
  * over the reference slice and V = its distinct-token vocabulary size.
  * A document's score is the mean log-probability over its adjacent
  * bigrams (higher = more reference-like). Docs with fewer than 2 tokens
  * have no bigram and are excluded, like q44's contract.
  *
  * Scale posture (100 TB): the model is two count aggregations over the
  * REFERENCE slice only (vocab-scale outputs); scoring is one pass over
  * the corpus — explode bigrams, join the two count tables on token keys
  * (vocab-scale sides, broadcast when small; AQE decides — no forced
  * hint), partial-agg the per-doc mean. V is a single driver-side scalar
  * (bounded plan-time action, the mixSample/q47 precedent).
  */
object Lm {

  /** Hashed (w1, bigram) key pairs of a token array, aligned by position:
    * struct array of (history-token hash, bigram hash) per adjacent pair;
    * empty for docs with fewer than 2 tokens. Both sides come from the
    * fused [[graft.functions.HashedGrams]] rolling pass (1-grams ARE the
    * token hashes) zipped by the codegen-capable `arrays_zip` — round 7:
    * the old form built every "w1 w2" STRING inside an interpreted
    * `zip_with` (HOFs are CodegenFallback) and joined on string keys.
    * Hashes only rename tokens/bigrams: the counts, the smoothed
    * probabilities, and the oracle (which recomputes over strings in
    * DuckDB) are unchanged.
    */
  private def bigramKeys(toks: Column): Column = {
    import graft.functions.TextFunctions.hashedGrams
    arrays_zip(
      slice(hashedGrams(toks, 1), lit(1), greatest(size(toks) - 1, lit(0))),
      hashedGrams(toks, 2))
  }

  /** (unigram counts, bigram counts, vocabulary size) of the reference.
    * Tables are keyed by 64-bit token/bigram hashes (`w1`, `bg`).
    */
  def bigramModel(train: DataFrame): (DataFrame, DataFrame, Long) = {
    import graft.functions.TextFunctions.hashedGrams
    val toks = train.select(explode(hashedGrams(Dedup.tokens, 1)).as("w1"))
    // materialized: consumed twice (the V count here, the score join later)
    val uni = Materialize(toks.groupBy(col("w1")).agg(count(lit(1)).as("c1")))
    // materialized like uni: the streaming form calls score() per
    // micro-batch against one model — bi's reference-scale scan+shuffle
    // must not replay every trigger
    val bi = Materialize(
      train.select(explode(hashedGrams(Dedup.tokens, 2)).as("bg"))
        .groupBy(col("bg")).agg(count(lit(1)).as("c2")))
    val v = uni.count()
    require(v > 0,
      "Lm.bigramModel: the reference slice has an empty vocabulary " +
        "(V = 0 would make every smoothed probability divide by zero)")
    (uni, bi, v)
  }

  /** Mean bigram log-probability per doc against a [[bigramModel]].
    * Output: (doc_id, n_bigrams, lm_score), docs with ≥ 2 tokens only.
    */
  def score(docs: DataFrame, uni: DataFrame, bi: DataFrame, v: Long): DataFrame =
    docs
      .select(col("doc_id"), explode(bigramKeys(Dedup.tokens)).as("b"))
      .select(col("doc_id"), col("b.0").as("w1"), col("b.1").as("bg"))
      .join(bi, Seq("bg"), "left")
      .join(uni, Seq("w1"), "left")
      .select(col("doc_id"),
        log((coalesce(col("c2"), lit(0L)) + lit(1.0)) /
          (coalesce(col("c1"), lit(0L)) + lit(v.toDouble))).as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), avg(col("lp")).as("lm_score"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Driver form: the doc_id % 10 == 0 slice is the trusted reference
    // (the library API takes any (doc_id, text) frame); every doc with
    // ≥ 2 tokens is scored, including the reference docs themselves.
    "q63_lm_score" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val (uni, bi, v) = bigramModel(docs.filter(col("doc_id") % 10 === 0))
      score(docs, uni, bi, v)
    }))

  def oracles: Map[String, String] = Map(
    // Same tokenizer (space-only trim + \s+), same add-one arithmetic;
    // ln() differences across engines are ~1 ulp, far inside the gate's
    // 6-dp rounding.
    "q63_lm_score" ->
      raw"""WITH toks AS (
           |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
           |),
           |train_uni AS (
           |  SELECT u.tok AS w1, count(*) AS c1
           |  FROM (SELECT unnest(t) AS tok FROM toks WHERE doc_id % 10 = 0) u
           |  GROUP BY u.tok
           |),
           |vsize AS (SELECT count(*) AS v FROM train_uni),
           |train_bi AS (
           |  SELECT t[i] || ' ' || t[i+1] AS bg, count(*) AS c2
           |  FROM toks, UNNEST(range(1, len(t))) AS r(i)
           |  WHERE doc_id % 10 = 0 AND len(t) >= 2
           |  GROUP BY 1
           |),
           |doc_bi AS (
           |  SELECT doc_id, t[i] AS w1, t[i] || ' ' || t[i+1] AS bg
           |  FROM toks, UNNEST(range(1, len(t))) AS r(i)
           |  WHERE len(t) >= 2
           |)
           |SELECT d.doc_id, count(*) AS n_bigrams,
           |  avg(ln((coalesce(b.c2, 0) + 1.0) /
           |         (coalesce(u.c1, 0) + (SELECT v FROM vsize)))) AS lm_score
           |FROM doc_bi d
           |LEFT JOIN train_bi b USING (bg)
           |LEFT JOIN train_uni u USING (w1)
           |GROUP BY d.doc_id""".stripMargin
  )
}
