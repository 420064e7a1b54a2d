package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {

  private def stats(text: String): (Long, Long, Long, Long) = {
    val r = RepetitionStats.compute(UTF8String.fromString(text))
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("repetition_stats: token/gram counts on hand-checked docs") {
    // "a b a b a b": 6 toks, top(a)=3, grams = 4 total, 2 distinct
    assert(stats("a b a b a b") === ((6L, 3L, 4L, 2L)))
    // all-distinct doc: ng == nu
    assert(stats("w x y z") === ((4L, 1L, 2L, 2L)))
    // short docs: no 3-grams (matches gramsOf's empty-array contract)
    assert(stats("one two") === ((2L, 1L, 0L, 0L)))
    // empty string tokenizes to [""] exactly like split(trim(text), "\\s+")
    assert(stats("") === ((1L, 1L, 0L, 0L)))
    // leading/trailing whitespace trimmed first
    assert(stats("  a a  ") === ((2L, 2L, 0L, 0L)))
    // SQL trim strips SPACES only — a leading tab survives the trim and
    // the \s+ split then yields a leading empty token, exactly like
    // trim()/regexp_split_to_array in the DuckDB oracle (Java's
    // String.trim would eat the tab and silently diverge)
    assert(stats("\ta b c") === ((4L, 1L, 2L, 2L)))
  }

  test("repetition_stats: codegen path equals interpreted eval") {
    val s = spark
    import s.implicits._
    val docs = Seq("a b a b a b c", "single", "x y z x y z x y z", "")
    val viaPlan = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), RepetitionStats(col("text")).as("st"))
      .collect()
      .map(r => r.getLong(0) -> r.getStruct(1))
      .toMap
    docs.zipWithIndex.foreach { case (t, i) =>
      val direct = stats(t)
      val p = viaPlan(i.toLong)
      assert((p.getLong(0), p.getLong(1), p.getLong(2), p.getLong(3)) === direct, t)
    }
  }

  test("q44 stays inside whole-stage codegen with zero exchanges") {
    val df = graft.SparkEntry.queries("q44_repetition")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan) // map-side only — the point
    assert(plan.contains("*(1)"), plan) // the whole query is ONE codegen stage
  }
}
