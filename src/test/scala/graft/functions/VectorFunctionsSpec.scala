package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorFunctionsSpec extends SparkSpec {

  private def df = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (4L, Array(-1.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f)))
      .toDF("id", "a", "b")
  }

  test("cosine: identical=1, orthogonal=0, opposite=-1, general case") {
    val rows = df.select(col("id"), VectorFunctions.cosine(col("a"), col("b")).as("c"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(math.abs(rows(1L) - 1.0) < 1e-12)
    assert(math.abs(rows(2L)) < 1e-12)
    assert(math.abs(rows(4L) + 1.0) < 1e-12)
    val expected = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(rows(3L) - expected) < 1e-12)
  }

  test("dot product") {
    val rows = df.select(col("id"), VectorFunctions.dot(col("a"), col("b")).as("d"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(rows(3L) === 32.0)
    assert(rows(2L) === 0.0)
  }

  test("interpreted eval matches codegen (both paths exercised)") {
    // nullSafeEval path directly
    val e = CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0f, 2.0f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(2.0f, 4.0f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    val interpreted = e.eval(null).asInstanceOf[Double]
    assert(math.abs(interpreted - 1.0) < 1e-12)
  }

  test("SQL surface: cosine_similarity / dot_product / repetition_stats from spark.sql") {
    VectorFunctions.register(spark)
    val r = spark.sql(
      """SELECT cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                         array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) c,
        |       dot_product(array(CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT))) d,
        |       repetition_stats('a b a b a b').ng AS ng
        |""".stripMargin).collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) === 6.0)
    assert(r.getLong(2) === 4L)
  }

  test("lsh_bucket: deterministic, bounded by nbits, similar vectors collide") {
    val s = spark
    import s.implicits._
    val base = Array.tabulate(16)(i => if (i == 0) 1.0f else 0.01f * i)
    val near = base.clone(); near(5) += 0.001f
    val far = base.map(-_) // exact negation flips the sign of every projection
    val df = Seq((1L, base), (2L, base.clone()), (3L, near), (4L, far))
      .toDF("id", "v")
      .select(col("id"), VectorFunctions.lshBucket(col("v"), 8).as("b"))
    val m = df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(m(1L) === m(2L)) // identical vectors: same bucket
    assert(m(1L) === m(3L)) // near-identical: same bucket (tiny perturbation)
    assert(m.values.forall(b => b >= 0 && b < 256)) // 8 bits
    assert(m(1L) !== m(4L)) // opposite vector flips every plane
    assert(m(4L) === (~m(1L) & 0xFFL)) // sign symmetry of the hyperplanes
  }

  // ---- Hand-computed hyperplane evidence (the q94/q31 evidence class,
  // extended to the q34/q36 LSH family in r19) ----
  //
  // Every literal below is derived OUTSIDE this codebase by
  // tools/r19/hand_lsh.py: the same from-spec XXH64 that
  // tools/r19/hand_minhash.py validated against Spark token hashes,
  // applied to the committed weight contract — weight(plane, dim, seed)
  // = +1 iff bit 1 of XXH64_le8(dim, seed = XXH64_le8(plane, seed)),
  // bucket bit p set iff the float*double projection is > 0. The
  // hand-derived seed-42 4x4 weight matrix is
  //   plane 0: (+1, -1, -1, -1)    plane 1: (-1, +1, +1, -1)
  //   plane 2: (-1, -1, -1, -1)    plane 3: (-1, -1, +1, +1)
  // so bucket(e0) = 1 (only plane 0 weights dim 0 positively),
  // bucket(v = (1, 2, -1, 0.5)) = 0 (all four projections negative:
  // -0.5, -0.5, -2.5, -3.5) and bucket(-v) = 15. A silent change to
  // the seed, the parity bit, the hash chaining order, or the bit
  // packing breaks a literal, not just the collide/flip properties.
  test("lsh_bucket hand evidence: seed-42 buckets match from-spec XXH64 derivation") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 2.0f, -1.0f, 0.5f)),
      (3L, Array(-1.0f, -2.0f, 1.0f, -0.5f)))
      .toDF("id", "v")
      .select(col("id"), VectorFunctions.lshBucket(col("v"), 4).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows === Map(1L -> 1L, 2L -> 0L, 3L -> 15L))
  }

  test("lsh_bucket hand evidence: q34's band seeds 43-45 match the derivation") {
    val s = spark
    import s.implicits._
    // same vector, the three other band-family seeds (BandSeed + 1..3):
    // hand-derived buckets 10, 3, 4 — pins the per-band seed offsets
    val v = Array(1.0f, 2.0f, -1.0f, 0.5f)
    val got = (43L to 45L).map { seed =>
      Seq(Tuple1(v)).toDF("v")
        .select(VectorFunctions.lshBucket(col("v"), 4, seed).as("b"))
        .collect()(0).getLong(0)
    }
    assert(got === Seq(10L, 3L, 4L))
  }

  test("null inputs yield null; stays inside whole-stage codegen") {
    val s = spark
    import s.implicits._
    val withNull = Seq((1L, Some(Array(1.0f)), None: Option[Array[Float]]))
      .toDF("id", "a", "b")
    val out = withNull.select(VectorFunctions.cosine(col("a"), col("b"))).collect()
    assert(out(0).isNullAt(0))

    // a parquet-backed scan (a local Seq collapses to LocalTableScan and
    // evaluates eagerly, bypassing codegen entirely)
    val dir = embeddingsDir(Seq((1L, Array(1.0f, 2.0f)), (2L, Array(2.0f, 4.0f))))
    val scan = spark.read.parquet(s"$dir/embeddings.parquet")
    val plan = scan
      .select(VectorFunctions.cosine(col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    // "*(n)" marks a WholeStageCodegen stage; the Project carrying the
    // expression must sit inside one (a CodegenFallback expression would
    // strip the asterisk)
    assert(plan.contains("*(1) Project"), plan)
  }

  test("long_array_matches: positional equality count, prefix rule, nulls, codegen") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),    // all match
      (2L, Seq(1L, 2L, 3L), Seq(1L, 9L, 3L)),    // 2 of 3
      (3L, Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),    // none
      (4L, Seq(1L, 2L, 3L, 4L), Seq(1L, 2L)),    // common prefix only
      (5L, Seq.empty[Long], Seq(1L)))            // empty side
      .toDF("id", "a", "b")
      .select(col("id"),
        VectorFunctions.longArrayMatches(col("a"), col("b")).as("m"))
    val m = rows.collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(m === Map(1L -> 3, 2L -> 2, 3L -> 0, 4L -> 2, 5L -> 0))
    // null input -> null out (BinaryExpression null semantics)
    val withNull = Seq((1L, Some(Seq(1L)), None: Option[Seq[Long]]))
      .toDF("id", "a", "b")
      .select(VectorFunctions.longArrayMatches(col("a"), col("b"))).collect()
    assert(withNull(0).isNullAt(0))
    // interpreted path agrees with the codegen result above
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val e = LongArrayMatches(
      Literal.create(Array(1L, 2L, 3L), ArrayType(LongType)),
      Literal.create(Array(1L, 9L, 3L), ArrayType(LongType)))
    assert(e.eval(null).asInstanceOf[Int] === 2)
    // ELEMENT nulls (containsNull=true input): a null slot matches
    // nothing — two aligned nulls are NOT a match (pre-r17 they read
    // back as 0 == 0 and silently inflated est_jaccard), and a
    // null-vs-value slot is a non-match rather than an NPE. Both
    // codegen (via DataFrame) and interpreted paths.
    val en = Seq(
      (1L, Seq[Option[Long]](Some(1L), None, Some(3L)),
        Seq[Option[Long]](Some(1L), None, Some(3L))),   // aligned nulls: 2
      (2L, Seq[Option[Long]](None, Some(2L)),
        Seq[Option[Long]](Some(1L), Some(2L))))          // null vs 1: 1
      .toDF("id", "a", "b")
      .select(col("id"),
        VectorFunctions.longArrayMatches(col("a"), col("b")).as("m"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(en === Map(1L -> 2, 2L -> 1))
    val eNullElems = LongArrayMatches(
      Literal.create(Array[java.lang.Long](null, 2L), ArrayType(LongType, containsNull = true)),
      Literal.create(Array[java.lang.Long](null, 2L), ArrayType(LongType, containsNull = true)))
    assert(eNullElems.eval(null).asInstanceOf[Int] === 1)
  }
}
