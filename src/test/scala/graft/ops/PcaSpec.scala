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
