package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Differential fuzz for the fused codegen expressions: the same
  * semantics expressed through Spark's BUILTIN higher-order functions
  * must produce identical results on seeded-random inputs. The builtins
  * are interpreted (CodegenFallback) and slow — that is exactly why the
  * native expressions exist — but they are an independent implementation
  * of the contract, so agreement catches semantic mistakes (trim sets,
  * codepoint vs UTF-16 lengths, fold order, null handling, clamping) that
  * a hand-picked example spec can miss.
  */
class DifferentialSpec extends SparkSpec {

  test("QuantizeStats == builtin-HOF reference on random vectors (incl. nulls)") {
    val s = spark
    import s.implicits._
    val rnd = new Random(20260812)
    val vecs: Seq[Seq[Option[Float]]] = Seq(
      Seq.empty[Option[Float]],            // empty vector
      Seq(Some(0f), Some(0f)),             // all-zero -> scale 0
      Seq(None, None),                     // all-null -> treated all-zero
      Seq(Some(Float.MinPositiveValue))    // denormal scale
    ) ++ (1 to 200).map { _ =>
      Seq.fill(1 + rnd.nextInt(24)) {
        if (rnd.nextInt(10) == 0) None
        else Some((rnd.nextFloat() - 0.5f) * 200f)
      }
    }
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
      .select(col("id"), col("v"),
        VectorFunctions.quantizeStats(col("v")).as("st"))
      .withColumn("ref_scale", expr(
        "aggregate(v, cast(0.0 as double), (a, x) -> greatest(a, abs(cast(coalesce(x, 0.0f) as double)))) / 127.0"))
      .withColumn("ref_qv", expr(
        """transform(v, x -> IF(ref_scale = 0.0d, 0L,
          |  cast(least(greatest(floor(cast(coalesce(x, 0.0f) as double) / ref_scale + 0.5d),
          |                      -127.0d), 127.0d) as bigint)))""".stripMargin))
      .withColumn("ref_sum_q", expr("aggregate(ref_qv, 0L, (a, q) -> a + q)"))
      .withColumn("ref_nnz", expr("aggregate(ref_qv, 0L, (a, q) -> a + IF(q != 0L, 1L, 0L))"))
      .withColumn("ref_mse", expr(
        """IF(size(v) = 0, 0.0d,
          |  aggregate(transform(zip_with(v, ref_qv,
          |      (x, q) -> cast(coalesce(x, 0.0f) as double) - cast(q as double) * ref_scale),
          |      e -> e * e),
          |    cast(0.0 as double), (a, e) -> a + e) / size(v))""".stripMargin))
    val rows = df.select(col("id"),
      col("st.scale"), col("ref_scale"),
      col("st.sum_q"), col("ref_sum_q"),
      col("st.n_nonzero"), col("ref_nnz"),
      col("st.mse"), col("ref_mse")).collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getDouble(1) === r.getDouble(2), s"scale diverged on vec $id")
      assert(r.getLong(3) === r.getLong(4), s"sum_q diverged on vec $id")
      assert(r.getLong(5) === r.getLong(6), s"n_nonzero diverged on vec $id")
      // fold orders are identical -> bit-equal doubles, no tolerance
      assert(r.getDouble(7) === r.getDouble(8), s"mse diverged on vec $id")
    }
  }

  test("LineStats == builtin-HOF reference on random multiline text") {
    val s = spark
    import s.implicits._
    val rnd = new Random(42424242)
    val words = Seq("alpha", "beta", "été", "🙂", "x",
      "longerwordhere", "menu", "nav")
    def randLine(): String = {
      val n = rnd.nextInt(8)
      val pad = if (rnd.nextBoolean()) "  \t" else ""
      val tail = rnd.nextInt(5) match {
        case 0 => "."
        case 1 => "!"
        case 2 => "?"
        case 3 => "\r"
        case _ => ""
      }
      pad + Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" ") + tail
    }
    val texts = Seq("", "\n", "no newline at all", "ends with newline\n") ++
      (1 to 200).map(_ => Seq.fill(1 + rnd.nextInt(6))(randLine()).mkString("\n"))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), col("text"), LineStats(col("text")).as("st"))
      // independent builtin pipeline: split keeps trailing empties
      // (limit -1), btrim strips exactly the space/tab/CR set, length
      // counts codepoints, rlike pins terminal punctuation
      .withColumn("tl", expr("transform(split(text, '\\n', -1), l -> btrim(l, ' \\t\\r'))"))
      .withColumn("kept", expr(
        "filter(tl, t -> length(t) >= 20 AND t rlike '[.!?]$')"))
      .withColumn("ref_n_lines", expr("cast(size(tl) as bigint)"))
      .withColumn("ref_n_kept", expr("cast(size(kept) as bigint)"))
      .withColumn("ref_kept_chars", expr(
        "aggregate(kept, 0L, (a, t) -> a + cast(length(t) as bigint))"))
    val rows = df.select(col("id"),
      col("st.n_lines"), col("ref_n_lines"),
      col("st.n_kept"), col("ref_n_kept"),
      col("st.kept_chars"), col("ref_kept_chars")).collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) === r.getLong(2), s"n_lines diverged on text $id")
      assert(r.getLong(3) === r.getLong(4), s"n_kept diverged on text $id")
      assert(r.getLong(5) === r.getLong(6), s"kept_chars diverged on text $id")
    }
  }
}
