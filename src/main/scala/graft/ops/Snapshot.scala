package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus snapshot diff (q80) — dataset versioning: between crawl v1 and
  * crawl v2, which documents were added, removed, or changed? Every
  * retraining decision ("what moved since the last run?") and every
  * incremental pipeline (recompute only the changed partition) starts
  * from this diff.
  *
  * Scale posture: one full-outer join on the id — at corpus scale that is
  * a sort-merge join with both sides shuffled ONCE on doc_id and nothing
  * else moving; content equality rides 64-bit xxhash64 fingerprints (the
  * q30 identity), so document bodies never cross the exchange — each side
  * projects (id, hash) inside its scan before shuffling. Unchanged rows
  * are dropped as early as the join emits them.
  */
object Snapshot {

  /** Diff rows (id, status ∈ added|removed|changed) between two corpus
    * versions; unchanged documents are not emitted. NULL text hashes as
    * NULL (guarded below — bare xxhash64 would hash NULL to its seed,
    * making NULL indistinguishable from a seed-colliding text): two NULLs
    * compare equal via `<=>`, NULL vs text is a change.
    */
  def diff(a: DataFrame, b: DataFrame, idCol: String = "doc_id",
      contentCol: String = "text"): DataFrame = {
    def h(c: String) =
      when(col(c).isNull, lit(null)).otherwise(xxhash64(col(c)))
    val av = a.select(col(idCol).as("id"),
      h(contentCol).as("ha"), lit(1).as("in_a"))
    val bv = b.select(col(idCol).as("id"),
      h(contentCol).as("hb"), lit(1).as("in_b"))
    av.join(bv, Seq("id"), "full_outer")
      .withColumn("status",
        when(col("in_b").isNull, lit("removed"))
          .when(col("in_a").isNull, lit("added"))
          .when(col("ha") <=> col("hb"), lit(null)) // unchanged
          .otherwise(lit("changed")))
      .filter(col("status").isNotNull)
      .select(col("id").as("doc_id"), col("status"))
  }

  /** Token-distribution drift between two corpus snapshots (q86) — the
    * retraining tripwire q80's id-level diff cannot see: ids may be
    * stable while the LANGUAGE shifts (a source changes template, a
    * scraper breaks, spam floods in). Laplace-smoothed unigram
    * distributions over the union vocabulary; token t's contribution to
    * KL(A‖B) is p_a·ln(p_a/p_b), reported per-million (nats·1e6) with
    * the top-`k` |contribution| tokens returned — the "what changed"
    * list, not just a scalar.
    *
    * Scale posture: one (token) partial-agg shuffle builds the per-token
    * counts; the totals ride a 1-row broadcast (the q65/q72 shape, no
    * driver action); top-k is TakeOrderedAndProject (per-partition heaps
    * + driver merge of k rows), never a global sort. Ordering ties break
    * on the ROUNDED contribution then token, so the cut is deterministic
    * and engine-independent.
    */
  def tokenDrift(a: DataFrame, b: DataFrame, k: Int = 50): DataFrame = {
    def toks(df: DataFrame, inA: Boolean) = df
      .filter(col("text").isNotNull)
      .select(lit(inA).as("in_a"),
        explode(TextAnalysis.words).as("tok"))
      .filter(col("tok") =!= "")
    val counts = toks(a, inA = true).unionByName(toks(b, inA = false))
      .groupBy(col("tok")).agg(
        sum(when(col("in_a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("in_a"), 1L).otherwise(0L)).as("n_b"))
    val totals = counts.agg(
      sum(col("n_a")).as("ta"), sum(col("n_b")).as("tb"),
      count(lit(1)).as("v"))
    val pA = (col("n_a") + 1).cast("double") / (col("ta") + col("v")).cast("double")
    val pB = (col("n_b") + 1).cast("double") / (col("tb") + col("v")).cast("double")
    counts.crossJoin(broadcast(totals))
      .withColumn("p_a_ppm", round(pA * 1e6, 6))
      .withColumn("p_b_ppm", round(pB * 1e6, 6))
      .withColumn("contrib_ppm", round(pA * log(pA / pB) * 1e6, 6))
      .orderBy(abs(col("contrib_ppm")).desc, col("tok").asc)
      .limit(k)
      .select(col("tok"), col("n_a"), col("n_b"),
        col("p_a_ppm"), col("p_b_ppm"), col("contrib_ppm"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Snapshot B is DERIVED from the corpus deterministically (drop
    // doc_id%7=0, edit text of doc_id%5=0, add fresh ids for doc_id%11=0)
    // and diffed against A with the REAL full-outer machinery; the oracle
    // reproduces the expected statuses straight from the modular rules —
    // so join classification, null-safe hash equality, and the NULL-text
    // contract (editing NULL text via concat stays NULL = unchanged) are
    // each pinned without a join on the oracle side.
    "q80_snapshot_diff" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val base = docs.select(col("doc_id"), col("text"))
      val survived = base.filter(col("doc_id") % 7 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")))
      // fresh ids offset far past any real doc_id (2^40 — corpus ids grow
      // with sf; a small constant offset would collide at large scale and
      // break both the join semantics and the oracle agreement)
      val added = base.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + (1L << 40)).as("doc_id"), col("text"))
      diff(base, survived.unionByName(added))
    }),

    // Drift between the deterministic even/odd doc_id halves — two
    // "snapshots" both engines can reconstruct exactly.
    "q86_token_drift" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      tokenDrift(docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 =!= 0))
    }))

  def oracles: Map[String, String] = Map(
    "q80_snapshot_diff" ->
      """SELECT doc_id, 'removed' AS status FROM documents WHERE doc_id % 7 = 0
        |UNION ALL
        |SELECT doc_id + 1099511627776, 'added' FROM documents WHERE doc_id % 11 = 0
        |UNION ALL
        |SELECT doc_id, 'changed' FROM documents
        |WHERE doc_id % 7 <> 0 AND doc_id % 5 = 0 AND text IS NOT NULL""".stripMargin,

    // Same smoothing arithmetic on identical integer inputs → identical
    // IEEE doubles; ln agrees to the 6-dp rounding (the q63 precedent);
    // the order key is the ROUNDED contribution + token, so the top-50
    // cut is the same set on both engines.
    "q86_token_drift" ->
      raw"""WITH toks AS (
           |  SELECT doc_id % 2 = 0 AS in_a,
           |    unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
           |  FROM documents WHERE text IS NOT NULL),
           |counts AS (
           |  SELECT tok,
           |    CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           |    CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b
           |  FROM toks WHERE tok <> '' GROUP BY tok),
           |tot AS (
           |  SELECT sum(n_a) AS ta, sum(n_b) AS tb, count(*) AS v FROM counts)
           |SELECT tok, n_a, n_b,
           |  round((n_a + 1) / CAST(ta + v AS DOUBLE) * 1e6, 6) AS p_a_ppm,
           |  round((n_b + 1) / CAST(tb + v AS DOUBLE) * 1e6, 6) AS p_b_ppm,
           |  round((n_a + 1) / CAST(ta + v AS DOUBLE)
           |    * ln(((n_a + 1) / CAST(ta + v AS DOUBLE))
           |         / ((n_b + 1) / CAST(tb + v AS DOUBLE))) * 1e6, 6)
           |    AS contrib_ppm
           |FROM counts, tot
           |ORDER BY abs(contrib_ppm) DESC, tok ASC
           |LIMIT 50""".stripMargin)
}
