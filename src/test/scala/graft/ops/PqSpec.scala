package graft.ops

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class PqSpec extends SparkSpec {

  private def vecsDf(vs: Seq[(Long, Array[Float])]): DataFrame = {
    import spark.implicits._
    vs.toDF("vec_id", "embedding")
  }

  /** 4 fixed patterns per subspace; every subvector is one of them. */
  private def gridVectors(n: Int, m: Int, subDim: Int): Seq[(Long, Array[Float])] = {
    val patterns = Array.tabulate(4, subDim)((p, j) => (p * 10 + j).toFloat)
    (0 until n).map { i =>
      val v = new Array[Float](m * subDim)
      (0 until m).foreach { s =>
        val p = patterns((i + s) % 4)
        System.arraycopy(p, 0, v, s * subDim, subDim)
      }
      (i.toLong, v)
    }
  }

  test("grid data reconstructs exactly: mse 0, equal subvectors share codes") {
    val df = vecsDf(gridVectors(200, m = 4, subDim = 4))
    val model = Pq.fit(df, m = 4, k = 4)
    val rows = Pq.encode(spark, df, model).collect()
    assert(rows.length === 200)
    rows.foreach(r => assert(r.getAs[Double]("recon_mse") === 0.0,
      s"vec ${r.getLong(0)}"))
    // vectors i and i+4 have identical subvector patterns -> same code
    val byId = rows.map(r => r.getLong(0) -> r.getAs[Long]("pq_code")).toMap
    (0 until 196).foreach(i => assert(byId(i.toLong) === byId(i.toLong + 4)))
    // and consecutive vectors differ (patterns rotate)
    assert(byId(0L) !== byId(1L))
  }

  test("fit + encode is deterministic") {
    val rnd = new Random(5)
    val vs = (0 until 300).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = vecsDf(vs)
    val a = Pq.encode(spark, df, Pq.fit(df, 8, 16)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val b = Pq.encode(spark, df, Pq.fit(df, 8, 16)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(a.toSeq === b.toSeq)
  }

  test("packed code fields equal the per-subspace argmin against the codebooks") {
    val rnd = new Random(9)
    val vs = (0 until 100).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat())))
    val df = vecsDf(vs)
    val model = Pq.fit(df, 8, 16)
    val mask = (1L << model.bits) - 1
    val codes = Pq.encode(spark, df, model).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byId = vs.toMap
    codes.foreach { case (id, code) =>
      val v = byId(id)
      (0 until model.m).foreach { sub =>
        val got = ((code >>> (sub * model.bits)) & mask).toInt
        val want = model.codebooks(sub).zipWithIndex.minBy { case (c, ci) =>
          (KMeansL2.sqDist(v, sub * model.subDim, c), ci)
        }._2
        assert(got === want, s"vec $id subspace $sub")
      }
    }
  }

  test("hand-pinned fit arithmetic: KMeansL2 seed walk + Lloyd round, PQ codebooks/encode/ADC (tools/r20/hand_kmeans.py)") {
    // Every literal below was hand-derived OUTSIDE this codebase by
    // walking the documented algorithm in tools/r20/hand_kmeans.py on
    // exact-in-float32 grids (all inputs and all centroid means are
    // dyadic rationals, so equality is bit-exact) — the q31/q32
    // hand-evidence class applied to the q77/q84 (and q43/q66/q131)
    // fit legs, which were previously restatement-only.
    // 1. farthest-point seeding + ONE Lloyd round: seeds walk to (9,9)
    //    (min-dists 0/2/128/162), clusters split {(0,0),(1,1)} /
    //    {(8,8),(9,9)} -> means (0.5,0.5), (8.5,8.5)
    val grid = Array(Array(0f, 0f), Array(1f, 1f), Array(8f, 8f), Array(9f, 9f))
    assert(KMeansL2.fit(grid, 2, iters = 1).map(_.toSeq).toSeq ===
      Seq(Seq(0.5f, 0.5f), Seq(8.5f, 8.5f)))
    // stable at Pq.fit's iters=8 (assignment is already converged)
    assert(KMeansL2.fit(grid, 2, iters = 8).map(_.toSeq).toSeq ===
      Seq(Seq(0.5f, 0.5f), Seq(8.5f, 8.5f)))
    // 2. the 2-subspace PQ grid: per-subspace codebooks from the same
    //    hand walk; encode = per-subspace argmin packed little-end-first
    val vs = Seq(
      0L -> Array(0f, 0f, 10f, 10f), 1L -> Array(1f, 1f, 11f, 11f),
      2L -> Array(8f, 8f, 2f, 2f), 3L -> Array(9f, 9f, 3f, 3f))
    val cb0 = KMeansL2.fit(vs.map(_._2.slice(0, 2)).toArray, 2, iters = 8)
    val cb1 = KMeansL2.fit(vs.map(_._2.slice(2, 4)).toArray, 2, iters = 8)
    assert(cb0.map(_.toSeq).toSeq === Seq(Seq(0.5f, 0.5f), Seq(8.5f, 8.5f)))
    assert(cb1.map(_.toSeq).toSeq === Seq(Seq(10.5f, 10.5f), Seq(2.5f, 2.5f)))
    val model = Pq.Model(m = 2, k = 2, subDim = 2, codebooks = Array(cb0, cb1))
    assert(model.bits === 1)
    val enc = Pq.encode(spark, vecsDf(vs), model).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // v0/v1 pick centroid 0 in both subspaces (0.5 vs 144.5 / 112.5),
    // v2/v3 centroid 1 -> code 0b11 = 3; every residual is 2·0.25 per
    // subspace -> errSum 1.0 over d=4 -> recon_mse 0.25 exactly
    assert(enc === Map(0L -> ((0L, 0.25)), 1L -> ((0L, 0.25)),
      2L -> ((3L, 0.25)), 3L -> ((3L, 0.25))))
    // 3. ADC: query (0,0,10,10) LUTs are [0.5,144.5] / [0.5,112.5] ->
    //    code-0 rows read 1.0, code-3 rows 144.5+112.5 = 257.0
    val adc = Pq.adcTopK(spark, Pq.encode(spark, vecsDf(vs), model), model,
      queries = Array(9L -> Array(0f, 0f, 10f, 10f)), topK = 4)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("adc_dist"))
      .toMap
    assert(adc === Map(0L -> 1.0, 1L -> 1.0, 2L -> 257.0, 3L -> 257.0))
  }

  test("more centroids never hurt: mean mse at k=16 <= k=2") {
    val rnd = new Random(21)
    val vs = (0 until 400).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = vecsDf(vs)
    def meanMse(k: Int): Double = {
      val rows = Pq.encode(spark, df, Pq.fit(df, 8, k)).collect()
      rows.map(_.getAs[Double]("recon_mse")).sum / rows.length
    }
    assert(meanMse(16) <= meanMse(2))
  }

  test("ADC top-k finds most of the exact L2 neighbors") {
    val rnd = new Random(33)
    // clustered corpus: 30 centers × 10 points — a query's exact top-10
    // IS its cluster (inter-center distance >> noise), so recall measures
    // PQ fidelity rather than tie-breaking among near-duplicates
    val centers = Array.fill(30)(Array.fill(64)(rnd.nextFloat() * 4 - 2))
    val vs = (0 until 300).map { i =>
      val c = centers(i % 30)
      (i.toLong, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.2f))
    }
    val df = vecsDf(vs)
    val model = Pq.fit(df, 8, 16)
    val codes = Pq.encode(spark, df, model)
    val queries = vs.take(5).map { case (id, v) => (id + 1000L, v) }.toArray
    val got = Pq.adcTopK(spark, codes, model, queries, topK = 10).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val byId = vs.toMap
    var hit = 0; var total = 0
    queries.foreach { case (qid, qv) =>
      val exact = vs.map { case (id, v) =>
        (id, KMeansL2.sqDist(v, 0, qv)) }
        .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
      hit += (exact & got(qid)).size
      total += 10
    }
    assert(hit.toDouble / total >= 0.6, s"ADC recall@10 = ${hit.toDouble / total}")
    // ranks are 1..10 per query, adc_dist ascending
    val one = Pq.adcTopK(spark, codes, model, queries.take(1), topK = 10)
      .orderBy(col("rank")).collect()
    assert(one.map(_.getLong(2)).toSeq === (1L to 10L))
    assert(one.map(_.getDouble(3)).toSeq.sliding(2).forall(p => p(0) <= p(1)))
  }

  test("IVF-PQ composed search: recall holds while pruning most of the corpus") {
    val rnd = new Random(41)
    // same cluster shape as the ADC test: 30 centers × 10 points
    val centers = Array.fill(30)(Array.fill(64)(rnd.nextFloat() * 4 - 2))
    val vs = (0 until 300).map { i =>
      val c = centers(i % 30)
      (i.toLong, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.2f))
    }
    val df = vecsDf(vs)
    val got = Pq.ivfPqTopK(spark, df, nlist = 8, nprobe = 2, topK = 10)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    // queries are vec_id < 5 (the q43 query set)
    assert(got.keySet === (0L until 5L).toSet)
    var hit = 0
    val byId = vs.toMap
    (0L until 5L).foreach { qid =>
      val qv = byId(qid)
      val exact = vs.map { case (id, v) => (id, KMeansL2.sqDist(v, 0, qv)) }
        .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
      hit += (exact & got(qid)).size
    }
    assert(hit.toDouble / 50 >= 0.6, s"IVF-PQ recall@10 = ${hit / 50.0}")
    // every query returns exactly topK ranked rows
    got.values.foreach(s => assert(s.size === 10))
  }

  test("NULL embeddings are excluded; empty input fails fast") {
    import spark.implicits._
    val df = Seq((1L, Array.fill(64)(0.5f)), (2L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding")
    val model = Pq.fit(df, 8, 16)
    assert(Pq.encode(spark, df, model).count() === 1)
    val allNull = Seq((1L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding")
    val err = intercept[IllegalArgumentException](Pq.fit(allNull, 8, 16))
    assert(err.getMessage.contains("no non-null"))
    intercept[IllegalArgumentException](Pq.fit(df, 7, 16)) // 64 % 7 != 0
    // a stray wrong-width vector fails with its id, not an executor AIOOBE
    val mixed = Seq((1L, Array.fill(64)(0.5f)), (7L, Array.fill(63)(0.5f)))
      .toDF("vec_id", "embedding")
    val e2 = intercept[org.apache.spark.SparkException](
      Pq.encode(spark, mixed, model).collect())
    assert(e2.getCause != null &&
      e2.getCause.getMessage.contains("vec 7 has dim 63"))
  }

  test("q77 driver query: one row per embedding, codes span multiple values") {
    val rows = graft.SparkEntry.queries("q77_pq")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length === 500)
    val codes = rows.map(_.getAs[Long]("pq_code")).distinct
    assert(codes.length > 50, s"only ${codes.length} distinct codes")
    assert(rows.forall(_.getAs[Double]("recon_mse") >= 0.0))
  }
}
