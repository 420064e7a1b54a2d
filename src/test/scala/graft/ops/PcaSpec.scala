package graft.ops

import graft.SparkSpec

class PcaSpec extends SparkSpec {

  test("jacobiEigen: exact eigenpairs of a hand-computed symmetric matrix") {
    // [[2,1],[1,2]] has eigenvalues 3 (along [1,1]) and 1 (along [1,-1])
    val (vals, vecs) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = vals.sorted
    assert(math.abs(sorted(0) - 1.0) < 1e-12 && math.abs(sorted(1) - 3.0) < 1e-12)
    val big = vals.indexOf(vals.max)
    val v = Array(vecs(0)(big), vecs(1)(big))
    assert(math.abs(math.abs(v(0)) - math.abs(v(1))) < 1e-12) // ∝ [1,1]
  }

  // deterministic planted-structure corpus: strong v1 direction, weaker v2,
  // tiny isotropic noise
  private val d = 16
  private def planted: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(7)
    val v1 = Array.tabulate(d)(i => if (i == 3) 1.0 else 0.0)
    val v2 = Array.tabulate(d)(i => if (i == 9) 1.0 else 0.0)
    (0 until 200).map { n =>
      val a = rnd.nextGaussian() * 3.0
      val b = rnd.nextGaussian() * 1.0
      val e = Array.tabulate(d)(i =>
        (a * v1(i) + b * v2(i) + rnd.nextGaussian() * 0.01 + 0.5 * v1(i)).toFloat)
      (n.toLong, e)
    }
  }

  test("fit recovers the planted dominant directions; components orthonormal") {
    val s = spark
    import s.implicits._
    val embs = planted.toDF("vec_id", "embedding")
    val m = Pca.fit(embs, k = 4)
    // eigenvalues descending, top two ≈ planted variances (9, 1)
    assert(m.eigenvalues.sliding(2).forall(w => w(0) >= w(1)))
    assert(math.abs(m.eigenvalues(0) - 9.0) < 1.5)
    assert(math.abs(m.eigenvalues(1) - 1.0) < 0.3)
    // component 0 aligns with v1 (axis 3), component 1 with v2 (axis 9)
    assert(math.abs(m.components(0)(3)) > 0.99)
    assert(math.abs(m.components(1)(9)) > 0.99)
    // orthonormal rows
    for (i <- m.components.indices; j <- i until m.components.length) {
      val dot = m.components(i).zip(m.components(j)).map { case (x, y) => x * y }.sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9, s"($i,$j) dot=$dot")
    }
    // canonical sign: largest-|component| entry is positive
    m.components.foreach { c =>
      assert(c(c.indices.maxBy(i => math.abs(c(i)))) > 0)
    }
    // mean recovered (v1 axis was offset by +0.5)
    assert(math.abs(m.mean(3) - 0.5) < 0.5)
  }

  test("whitened projections have unit variance per component; fit is layout-stable") {
    val s = spark
    import s.implicits._
    val embs = planted.toDF("vec_id", "embedding")
    val m = Pca.fit(embs, k = 3)
    val proj = Pca.project(embs, m, whiten = true).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    assert(proj.length === 200 && proj.head._2.length === 3)
    for (c <- 0 until 3) {
      val xs = proj.map(_._2(c))
      val mean = xs.sum / xs.length
      val variance = xs.map(x => (x - mean) * (x - mean)).sum / (xs.length - 1)
      assert(math.abs(variance - 1.0) < 1e-3, s"component $c variance $variance")
    }
    // re-fit under a different partitioning: same model to fp tolerance
    val m2 = Pca.fit(embs.repartition(7), k = 3)
    for (c <- 0 until 3; i <- 0 until d)
      assert(math.abs(m.components(c)(i) - m2.components(c)(i)) < 1e-6)
  }

  test("fitSampled: BIT-identical model across repartitionings (fit is only fp-close)") {
    val s = spark
    import s.implicits._
    val embs = planted.toDF("vec_id", "embedding")
    val m1 = Pca.fitSampled(embs, k = 3)
    val m2 = Pca.fitSampled(embs.repartition(7), k = 3)
    assert(m1.mean.toSeq === m2.mean.toSeq)
    assert(m1.eigenvalues.toSeq === m2.eigenvalues.toSeq)
    assert(m1.components.map(_.toSeq).toSeq === m2.components.map(_.toSeq).toSeq)
  }

  test("q60 driver query: flat pc_0..pc_7 scalar columns, one row per embedding") {
    val out = graft.SparkEntry.queries("q60_pca_whiten")(spark, "/root/testdata/sf0.001")
    // flat scalar schema (round-6 advice: the verify harness cannot
    // sort/hash array cells)
    assert(out.schema.fieldNames.toSeq ===
      "vec_id" +: (0 until 8).map(i => s"pc_$i"))
    assert(out.schema.fields.drop(1).forall(
      _.dataType == org.apache.spark.sql.types.DoubleType))
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
  }

  test("q60 cross-engine: numpy/LAPACK whitening matches the Jacobi pipeline") {
    // The r16 verdict's same-author-oracle item, q60 edition (the
    // q51/q82 precedent): the expected mean/eigenvalues/whitened
    // projections in the committed fixture were computed by
    // numpy/LAPACK (`np.linalg.eigh` — a genuinely independent
    // implementation of the symmetric eigenproblem) over pinned float32
    // embeddings (tools/r18/gen_q60_pca.py), replicating only the house
    // DEFINITIONS (ddof=1 covariance, descending-eigenvalue order,
    // largest-|component|-positive sign, whiten by
    // 1/sqrt(max(λ,0)+1e-12)). The fixture spectrum is well-separated
    // (gaps ≥ 3.3×) so eigenvectors are well-conditioned and the 1e-8
    // tolerance tests arithmetic, not luck; both solvers converge to
    // ~1e-12 here and fold-order FP noise is smaller still.
    val s = spark
    import s.implicits._
    val base = getClass.getResource("/graft/q60_pca_expected")
    assert(base != null, "missing test resource dir q60_pca_expected")
    val path = java.nio.file.Paths.get(base.toURI).resolve("expected.json")
    val f = spark.read.option("multiLine", "true").json(path.toString)
      .collect()(0)
    val k = f.getAs[Long]("k").toInt
    // Row arrays surface as collection.Seq (mutable.ArraySeq), not
    // immutable.Seq — type the bindings accordingly
    val ids = f.getSeq[Long](f.fieldIndex("vec_ids")).toSeq
    val embs = f.getSeq[scala.collection.Seq[Double]](
      f.fieldIndex("embeddings")).map(_.map(_.toFloat).toArray).toSeq
    val expMean = f.getSeq[Double](f.fieldIndex("mean"))
    val expEvals = f.getSeq[Double](f.fieldIndex("eigenvalues"))
    val expProj = f.getSeq[scala.collection.Seq[Double]](
      f.fieldIndex("projections"))
    val df = ids.zip(embs).toDF("vec_id", "embedding")
    val m = Pca.fitSampled(df, k) // cap 4096 >> 40: every row in the fold
    expMean.indices.foreach(i =>
      assert(math.abs(m.mean(i) - expMean(i)) < 1e-8, s"mean($i)"))
    (0 until k).foreach(c =>
      assert(math.abs(m.eigenvalues(c) - expEvals(c)) < 1e-8, s"eval($c)"))
    val got = Pca.project(df, m, whiten = true).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    ids.zipWithIndex.foreach { case (id, r) =>
      (0 until k).foreach { c =>
        assert(math.abs(got(id)(c) - expProj(r)(c)) < 1e-8,
          s"proj(vec $id, pc $c): ${got(id)(c)} != ${expProj(r)(c)}")
      }
    }
  }

  test("fit and project exclude NULL embeddings instead of NPE-ing") {
    val s = spark
    import s.implicits._
    val withNulls = (planted.map { case (id, e) => (id, e) } :+
      (900L, null.asInstanceOf[Array[Float]]) :+
      (901L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding")
    val clean = planted.toDF("vec_id", "embedding")
    val m = Pca.fit(withNulls, k = 3)       // NULL rows must not reach treeAggregate
    val mClean = Pca.fit(clean, k = 3)
    for (c <- 0 until 3; i <- 0 until d)    // NULLs excluded ⇒ identical model
      assert(math.abs(m.components(c)(i) - mClean.components(c)(i)) < 1e-12)
    val proj = Pca.project(withNulls, m, whiten = false).collect()
    assert(proj.length === 200)             // NULL rows have no projection
    assert(!proj.map(_.getLong(0)).exists(id => id == 900L || id == 901L))
    // all-NULL frame: descriptive failure, not an NPE
    val allNull = Seq((1L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException](Pca.fit(allNull, k = 2))
    assert(ex.getMessage.contains("no non-NULL embeddings"))
  }
}
