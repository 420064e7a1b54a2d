package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus search operators: retrieval over the document corpus. The
  * training-data companion to q65's keyword extraction — a pipeline that
  * curates a corpus also needs to QUERY it (benchmark-leak triage, topic
  * audits, "show me the docs that score high for X"), and at 100 TB that
  * query must be an aggregation-shaped scan, not an index the driver holds.
  *
  * Reference context: hbase-packet-inspector exposes its captured tables
  * through ad-hoc SQL (reference README.md "Queries" — `SELECT ... WHERE`
  * over `requests`/`responses`); this module is the ranked-retrieval form
  * of that surface for the document corpus.
  */
object Search {

  /** BM25 ranked retrieval: score every document against a bag-of-words
    * query and keep the global top `k`. Okapi BM25 with the Lucene IDF
    * (`ln(1 + (N − df + ½)/(df + ½))` — always positive, so a term in
    * more than half the corpus can't push a score negative):
    *
    *   score(D) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *
    * Scale shape:
    *   - the query-term filter lands directly under the explode (map-side
    *     `isin` against the tiny literal set), so only (matching-doc ×
    *     matching-term) rows ever reach a shuffle — the corpus never does;
    *   - `dl` rides the explode as a constant-per-doc column, so no
    *     corpus-scale doc-length join is needed afterwards;
    *   - `df` (≤ |terms| rows) and the 1-row (N, Σdl) stats frame are
    *     broadcast;
    *   - the global top-k is `orderBy().limit()` — Spark plans
    *     TakeOrderedAndProject (per-partition heaps + tiny driver merge),
    *     never a global sort; the rank is then minted window-free over the
    *     ≤ k survivors in one explicitly-sorted partition.
    *
    * Cross-engine float parity: every arithmetic step mirrors the oracle
    * SQL textually (same literals, same association), inputs are exact
    * integers, and both engines rank by the 6-dp-ROUNDED score with a
    * doc_id tiebreak, so a 1-ulp Σ-order divergence can't flip the cut
    * (q63/q65 discipline).
    */
  def bm25(docs: DataFrame, terms: Seq[String], k: Int = 20,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.forall(t => t.nonEmpty && !t.exists(_.isWhitespace)),
      s"query terms must be non-empty, whitespace-free tokens: $terms")
    // q65's live-doc contract: NULL and whitespace-only docs excluded
    // (explicit space/tab/LF/CR set — trim() alone strips only spaces)
    val live = docs.filter(col("text").isNotNull &&
      length(trim(col("text"), " \t\n\r")) > 0)
    // N and avgdl in ONE 1-row broadcast frame — no driver action, no
    // plan-time count; sum/count kept separate so the division happens
    // once, identically, on both engines (avg() could aggregate
    // differently than sum/count)
    val stats = live.agg(
      count(lit(1)).as("n_docs"),
      sum(size(Dedup.tokens).cast("long")).as("sum_dl"))
    // dl = RAW token-array length (incl. empty tokens from leading
    // non-space whitespace; both engines' split agrees) — it's a length
    // normalizer, and the oracle uses len() of the same array
    val tf = live
      .select(col("doc_id"), Dedup.tokens.as("t"))
      .select(col("doc_id"), size(col("t")).cast("long").as("dl"),
        explode(col("t")).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val dfc = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val nD = col("n_docs").cast("double")
    val idf = log(lit(1) + (nD - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val denom = col("tf") + lit(k1) *
      (lit(1) - lit(b) + lit(b) * col("dl") / (col("sum_dl").cast("double") / col("n_docs")))
    val scored = tf
      .join(broadcast(dfc), Seq("tok"))
      .crossJoin(broadcast(stats))
      .groupBy(col("doc_id"))
      .agg(max(col("dl")).as("dl"), count(lit(1)).as("n_terms"),
        round(sum(idf * (col("tf") * lit(k1 + 1)) / denom), 6).as("score"))
    val top = scored.orderBy(col("score").desc, col("doc_id").asc).limit(k)
    // rank over the ALREADY-limited top-k (≤ k rows by construction — the
    // corpus-scale work happened in the TakeOrderedAndProject above).
    // NOT a window: an unpartitioned rank window makes WindowExec log a
    // `No Partition Defined` warning per execution, dozens of which landed
    // directly above the bench's JSON line in the driver's 2000-char
    // stdout tail (round-8 verdict) — and a constant partition key is no
    // fix, because Spark 4's EliminateWindowPartitions optimizer rule
    // strips foldable partition specs right back to the warning case.
    // Instead: one explicitly-sorted partition of ≤ k rows, where
    // monotonically_increasing_id IS the 0-based row number (single
    // partition ⇒ ids are the dense in-partition counter).
    top.coalesce(1)
      .sortWithinPartitions(col("score").desc, col("doc_id").asc)
      .withColumn("rank", (monotonically_increasing_id() + 1).cast("int"))
      .select(col("doc_id"), col("dl"), col("n_terms"), col("score"),
        col("rank"))
  }

  /** The driver query's pinned bag-of-words — terms present in the
    * synthetic corpus vocabulary with distinct document frequencies.
    */
  private[ops] val QueryTerms = Seq("spark", "window", "hash")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // BM25 top-20 for a 3-term query — see [[bm25]].
    "q72_bm25" -> ((s, dir) => bm25(Tables.documents(s, dir), QueryTerms))
  )

  def oracles: Map[String, String] = Map(
    // Same tokenizer (trim + \s+ split), same raw-array dl, same literals
    // and association in every float step; both engines rank by the
    // rounded score (doc_id tiebreak) before the top-20 cut.
    "q72_bm25" ->
      raw"""WITH live AS (
           |  SELECT doc_id, text FROM documents
           |  WHERE text IS NOT NULL
           |    AND length(trim(text, ' ' || chr(9) || chr(10) || chr(13))) > 0),
           |toks AS (
           |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
           |  FROM live),
           |stats AS (
           |  SELECT count(*) AS n_docs, sum(CAST(len(t) AS BIGINT)) AS sum_dl
           |  FROM toks),
           |tf AS (
           |  SELECT doc_id, tok, count(*) AS tf, max(dl) AS dl
           |  FROM (
           |    SELECT doc_id, CAST(len(t) AS BIGINT) AS dl, unnest(t) AS tok
           |    FROM toks)
           |  WHERE tok IN ('spark', 'window', 'hash')
           |  GROUP BY doc_id, tok),
           |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
           |scored AS (
           |  SELECT doc_id, max(dl) AS dl, count(*) AS n_terms,
           |    round(sum(
           |      ln(1 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5)) *
           |      (tf * (1.2 + 1)) /
           |      (tf + 1.2 * (1 - 0.75 + 0.75 * dl /
           |        (CAST(sum_dl AS DOUBLE) / n_docs)))), 6) AS score
           |  FROM tf JOIN df USING (tok), stats
           |  GROUP BY doc_id)
           |SELECT doc_id, dl, n_terms, score, rank FROM (
           |  SELECT *, row_number() OVER (ORDER BY score DESC, doc_id ASC)
           |    AS rank
           |  FROM scored)
           |WHERE rank <= 20""".stripMargin
  )
}
