package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract checks on the declared query surface — no Spark session needed.
  * The driver's correctness gate can only see what is declared here, so
  * drift (a query with neither an oracle nor a stated no-oracle reason, or
  * a stale oracle for a removed query) must fail the build, not be
  * discovered in the round report. */
class SparkEntrySpec extends AnyFunSuite {

  test("every query has an oracle XOR a stated no-oracle reason") {
    val qs = SparkEntry.queries.keySet
    val oracled = SparkEntry.oracleSql.keySet
    val reasoned = SparkEntry.noOracleReason.keySet
    assert((oracled intersect reasoned).isEmpty,
      s"both oracle and reason: ${oracled intersect reasoned}")
    assert((qs diff (oracled union reasoned)).isEmpty,
      s"uncovered queries: ${qs diff (oracled union reasoned)}")
    assert(((oracled union reasoned) diff qs).isEmpty,
      s"stale entries: ${(oracled union reasoned) diff qs}")
  }

  test("no-oracle reasons are substantive") {
    SparkEntry.noOracleReason.foreach { case (q, reason) =>
      assert(reason.length > 40, s"$q reason too thin: '$reason'")
    }
  }
}
