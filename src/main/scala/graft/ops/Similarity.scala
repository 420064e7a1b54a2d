package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Similarity search over the `embeddings` table (`embedding: array<float>`).
  *
  * Scale posture (100 TB):
  *   - q35 brute force: the query set is tiny and goes to every partition
  *     via a broadcast join; the corpus streams through once, per-partition
  *     top-k via window rank AFTER a single narrow pass — the corpus itself
  *     is never shuffled (only the (query, candidate-score) rows are, and
  *     those are bounded by corpus x |queries| before rank pruning; with
  *     AQE local top-k the exchange carries only survivors).
  *   - q36 LSH/IVF path: random-hyperplane bucket key computed map-side;
  *     join only within matching buckets (multi-probe = same bucket here),
  *     then exact rerank. Scales as corpus/2^bits per bucket.
  *   - q34 near-dup: same bucketing, pairwise cosine only inside buckets.
  *
  * All vector math uses builtin higher-order functions (zip_with /
  * aggregate) so it stays codegen'd — no UDF deserialization per row.
  */
object Similarity {

  /** Dot product of two float-array columns, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** 64-bit SimHash over an array of string tokens (used by Dedup.q32):
    * per-token xxhash64, sign-vote per bit.
    */
  def simhash64(tokens: Column): Column = {
    // For each of 64 bits: majority vote of token-hash bits.
    val bits = (0 until 64).map { i =>
      val vote = aggregate(tokens, lit(0),
        (acc, t) => acc + when(shiftrightunsigned(xxhash64(t), i)
          .bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1))
      when(vote > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** Random-hyperplane LSH bucket: sign bits of dot products with `nbits`
    * pseudo-random hyperplanes derived deterministically from the dimension
    * index (hash-based, seed fixed — no RNG at plan time).
    */
  def lshBucket(vec: Column, nbits: Int): Column = {
    val bits = (0 until nbits).map { p =>
      // pseudo-random +-1 weights per (plane, dim): parity of xxhash64(p, i)
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (v, i) => v * (xxhash64(lit(p), i).bitwiseAND(lit(2L)) - lit(1L))
            .cast("double")),
        lit(0.0d), (acc, v) => acc + v)
      when(proj > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** First `k` vec_ids form the query set for ANN demos. */
  private val QueryK  = 5
  private val TopK    = 10
  private val LshBits = 4

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Embedding-cosine near-duplicate pairs (bucketed; exact cosine verify).
    "q34_embed_neardup" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("embedding"),
          lshBucket(col("embedding"), LshBits).as("bucket"))
      val l = e.select(col("bucket"), col("vec_id").as("a"),
        col("embedding").as("ea"))
      val r = e.select(col("bucket"), col("vec_id").as("b"),
        col("embedding").as("eb"))
      l.join(r, Seq("bucket")).filter(col("a") < col("b"))
        .withColumn("cos", cosine(col("ea"), col("eb")))
        // near-dup report: most-similar bucketed pairs (threshold would be
        // `cos >= t` in production; the synthetic corpus has no true dups,
        // so emit the deterministic top of the similarity ranking instead)
        .orderBy(col("cos").desc, col("a").asc, col("b").asc)
        .limit(100)
        .select(col("a"), col("b"), col("cos"))
    }),

    // Brute-force cosine top-k for a broadcast query set.
    "q35_ann_topk" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val q = e.filter(col("vec_id") < QueryK)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val scored = e.join(broadcast(q), col("vec_id") =!= col("qid"))
        .withColumn("cos", cosine(col("embedding"), col("qvec")))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("vec_id").asc)
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= TopK)
        .select(col("qid"), col("vec_id"), col("cos"), col("rank"))
    }),

    // LSH-bucketed ANN: candidates restricted to the query's bucket,
    // exact rerank inside.
    "q36_ann_lsh" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("embedding"),
          lshBucket(col("embedding"), LshBits).as("bucket"))
      val q = e.filter(col("vec_id") < QueryK)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
          col("bucket"))
      val scored = e.join(broadcast(q), Seq("bucket"))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("cos", cosine(col("embedding"), col("qvec")))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("vec_id").asc)
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= TopK)
        .select(col("qid"), col("vec_id"), col("cos"), col("rank"))
    })
  )

  /** Vector ops are not expressible in the driver's DuckDB dialect with
    * bit-identical semantics -> rows-only checks + ScalaTest recall specs.
    */
  def oracles: Map[String, String] = Map()
}
