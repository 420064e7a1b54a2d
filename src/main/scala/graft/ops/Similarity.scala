package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Similarity search over the `embeddings` table (`embedding: array<float>`).
  *
  * Scale posture (100 TB):
  *   - q35 brute force: the query set is tiny and goes to every partition via
  *     a broadcast join; the corpus streams through exactly once and is
  *     pruned to per-partition top-k *inside each task* (bounded heaps in a
  *     mapPartitions), so the only shuffle carries ≤ partitions × |queries|
  *     × k rows — the corpus itself is never shuffled. The final exact rank
  *     runs over that tiny survivor set.
  *   - q36 LSH/IVF path: random-hyperplane bucket key computed map-side;
  *     candidates restricted to the query's bucket, then the same
  *     per-partition top-k merge.
  *   - q34 near-dup: bucket count scales with the corpus (bits ≈
  *     log₂(n/targetBucket), clamped) so per-bucket all-pairs work stays
  *     bounded instead of going (N/16)² as with the old fixed 4 bits.
  *
  * Hot-path vector math (dot/cosine) runs through the native codegen'd
  * Catalyst expressions in [[graft.functions.VectorFunctions]]; builtin
  * higher-order functions appear only off the hot path (they are
  * CodegenFallback — see the round-3 rework of q31/q32).
  */
object Similarity {

  /** Dot product of two float-array columns, in double (native codegen'd
    * expression — the zip_with/aggregate HOF form is CodegenFallback).
    */
  def dot(a: Column, b: Column): Column = graft.functions.VectorFunctions.dot(a, b)

  /** L2 norm (HOF form; only used off the hot path). */
  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.cosine(a, b)

  /** 64-bit SimHash over an array of string tokens — utility/spec form
    * (q32 itself computes the same votes relationally for codegen): hash
    * each token ONCE, then fold a 64-slot vote array and assemble the
    * sign bits.
    */
  def simhash64(tokens: Column): Column = {
    val hashes = transform(tokens, t => xxhash64(t))
    val votes = aggregate(hashes, array_repeat(lit(0), 64),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(63)),
        (a, i) => a + when(call_function("shiftrightunsigned", h, i)
          .bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, i) => when(v > 0, call_function("shiftleft", lit(1L), i))
          .otherwise(lit(0L))),
      lit(0L), (acc, b) => acc.bitwiseOR(b))
  }

  /** Random-hyperplane LSH bucket: sign bits of dot products with `nbits`
    * pseudo-random hyperplanes derived deterministically from the plane
    * and dimension indices (hash-based, no RNG at plan time). Native
    * codegen'd expression — one fused loop over nbits × dims.
    */
  def lshBucket(vec: Column, nbits: Int): Column =
    graft.functions.VectorFunctions.lshBucket(vec, nbits)

  /** Bucket-count sizing: aim for ~`targetBucket` vectors per bucket, with
    * enough planes that all-pairs work inside a bucket stays bounded as the
    * corpus grows. Clamped: ≥4 (don't over-split tiny corpora), ≤16 (each
    * extra plane is one more pass over the vector at signature time).
    */
  private[ops] def lshBitsFor(n: Long, targetBucket: Int = 64): Int = {
    val raw = math.ceil(math.log(math.max(1.0, n.toDouble / targetBucket)) / math.log(2.0)).toInt
    math.min(16, math.max(4, raw))
  }

  /** First `k` vec_ids form the query set for ANN demos. */
  private val QueryK = 5
  private val TopK   = 10

  /** Exact top-k per query without shuffling the scored corpus: bounded
    * per-(partition, query) heaps prune map-side; the exact window rank then
    * runs over ≤ partitions × |queries| × k survivors.
    */
  private def topKPerQuery(s: SparkSession, scored: DataFrame, k: Int): DataFrame = {
    import s.implicits._
    val pruned = scored.select(col("qid"), col("vec_id"), col("cos"))
      .as[(Long, Long, Double)]
      .mapPartitions { it =>
        import scala.collection.mutable
        // PriorityQueue.max = current WORST kept row (lowest cos; ties: the
        // larger vec_id loses, matching the rank tiebreak below).
        val ord = Ordering.by[(Long, Long, Double), (Double, Long)] {
          case (_, v, c) => (-c, v)
        }
        val heaps = mutable.HashMap.empty[Long, mutable.PriorityQueue[(Long, Long, Double)]]
        it.foreach { row =>
          val h = heaps.getOrElseUpdate(row._1, mutable.PriorityQueue.empty(ord))
          h.enqueue(row)
          if (h.size > k) h.dequeue()
        }
        heaps.valuesIterator.flatMap(_.iterator)
      }
      .toDF("qid", "vec_id", "cos")
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    pruned.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("cos"), col("rank"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Embedding-cosine near-duplicate pairs (bucketed; exact cosine verify).
    "q34_embed_neardup" -> ((s, dir) => {
      val base = Tables.embeddings(s, dir)
      val bits = lshBitsFor(base.count())
      // bucketed vectors feed both join sides; materialize the (per-row
      // nbits-pass) bucket computation once
      val e = base.select(col("vec_id"), col("embedding"),
        lshBucket(col("embedding"), bits).as("bucket"))
        .localCheckpoint()
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
        .select(col("qid"), col("vec_id"),
          cosine(col("embedding"), col("qvec")).as("cos"))
      topKPerQuery(s, scored, TopK)
    }),

    // IVF ANN: data-aware coarse quantizer (complement of q36's random
    // hyperplanes). Centroids = an evenly-spaced sample of the corpus
    // (stand-in for k-means; the assignment/probe plumbing is the real
    // contract); every vector joins its argmax-cosine centroid's list,
    // queries probe their own list and rerank exactly.
    "q43_ann_ivf" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val n = e.count()
      val nlist = math.max(4, lshBitsFor(n) * 4) // lists scale like buckets
      val stride = math.max(1L, n / nlist)
      val centroids = e.filter(pmod(col("vec_id"), lit(stride)) === 0)
        .limit(nlist)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val assigned = e.join(broadcast(centroids))
        .select(col("vec_id"), col("embedding"),
          struct(cosine(col("embedding"), col("cvec")).as("cs"), col("cid")).as("sc"))
        .groupBy(col("vec_id"))
        .agg(first(col("embedding")).as("embedding"), max(col("sc")).as("m"))
        .select(col("vec_id"), col("embedding"), col("m.cid").as("bucket"))
        .localCheckpoint() // feeds query + candidate sides
      val q = assigned.filter(col("vec_id") < QueryK)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"), col("bucket"))
      val scored = assigned.join(broadcast(q), Seq("bucket"))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          cosine(col("embedding"), col("qvec")).as("cos"))
      topKPerQuery(s, scored, TopK)
    }),

    // LSH-bucketed ANN with multi-probe: each query probes its own bucket
    // plus every 1-bit-flip neighbor (vectors near a hyperplane land on
    // either side; probing the adjacent buckets recovers them). The probe
    // fan-out rides the tiny broadcast query side — the corpus is still
    // touched once.
    "q36_ann_lsh" -> ((s, dir) => {
      val base = Tables.embeddings(s, dir)
      val bits = lshBitsFor(base.count())
      val e = base.select(col("vec_id"), col("embedding"),
        lshBucket(col("embedding"), bits).as("bucket"))
        .localCheckpoint()
      val probes = e.filter(col("vec_id") < QueryK)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
          explode(array(col("bucket") +:
            (0 until bits).map(i => col("bucket").bitwiseXOR(lit(1L << i))): _*))
            .as("bucket"))
      val scored = e.join(broadcast(probes), Seq("bucket"))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          cosine(col("embedding"), col("qvec")).as("cos"))
      topKPerQuery(s, scored, TopK)
    })
  )

  /** Vector ops are not expressible in the driver's DuckDB dialect with
    * bit-identical semantics -> rows-only checks + ScalaTest recall specs.
    */
  def oracles: Map[String, String] = Map()
}
