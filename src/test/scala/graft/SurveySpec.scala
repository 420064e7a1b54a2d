package graft

import org.scalatest.funsuite.AnyFunSuite

/** Keeps SURVEY.md §2 (the judge's coverage checklist) in lockstep with
  * the driver contract: every key in [[SparkEntry.queries]] must have a
  * §2 row, and every query key cited in §2 must still exist. Round 10
  * shipped 13 gate queries §2 never listed — this spec makes that drift
  * impossible to reintroduce.
  */
class SurveySpec extends AnyFunSuite {

  private def section2: String = {
    val src = scala.io.Source.fromFile("SURVEY.md", "UTF-8")
    val text = try src.mkString finally src.close()
    val start = text.indexOf("## §2")
    val end = text.indexOf("## §3", start)
    assert(start >= 0 && end > start, "SURVEY.md must contain §2 and §3")
    text.substring(start, end)
  }

  test("SURVEY §2 lists exactly the SparkEntry.queries key set") {
    val surveyKeys = raw"q\d+_[a-z0-9_]+".r.findAllIn(section2).toSet
    val queryKeys = SparkEntry.queries.keySet
    val unlisted = queryKeys -- surveyKeys
    val stale = surveyKeys -- queryKeys
    assert(unlisted.isEmpty,
      s"queries missing a SURVEY §2 row: ${unlisted.toSeq.sorted.mkString(", ")}")
    assert(stale.isEmpty,
      s"SURVEY §2 cites keys no query provides: ${stale.toSeq.sorted.mkString(", ")}")
  }

  test("every query has an oracle entry (no rows-only checks)") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty,
      s"queries without oracle SQL: ${noOracle.toSeq.sorted.mkString(", ")}")
  }

  test("docs/OPERATORS.md indexes every query (regenerate via tools/r11/operators_md.py)") {
    val src = scala.io.Source.fromFile("docs/OPERATORS.md", "UTF-8")
    val text = try src.mkString finally src.close()
    val indexed = raw"q\d+_[a-z0-9_]+".r.findAllIn(text).toSet
    val missing = SparkEntry.queries.keySet -- indexed
    assert(missing.isEmpty,
      s"queries missing from docs/OPERATORS.md (rerun the generator): " +
        missing.toSeq.sorted.mkString(", "))
  }
}
