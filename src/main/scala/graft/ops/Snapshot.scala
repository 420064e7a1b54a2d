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
    }))

  def oracles: Map[String, String] = Map(
    "q80_snapshot_diff" ->
      """SELECT doc_id, 'removed' AS status FROM documents WHERE doc_id % 7 = 0
        |UNION ALL
        |SELECT doc_id + 1099511627776, 'added' FROM documents WHERE doc_id % 11 = 0
        |UNION ALL
        |SELECT doc_id, 'changed' FROM documents
        |WHERE doc_id % 7 <> 0 AND doc_id % 5 = 0 AND text IS NOT NULL""".stripMargin)
}
