package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract checks on the declared query surface — no Spark session needed.
  * The driver's correctness gate can only see what is declared here, so
  * drift (a query with neither an oracle nor a stated no-oracle reason, or
  * a stale oracle for a removed query) must fail the build, not be
  * discovered in the round report. */
class SparkEntrySpec extends AnyFunSuite {

  test("no query key is silently collapsed by a duplicate Map literal") {
    // A Scala Map literal with a repeated key keeps only the LAST binding —
    // no warning, no runtime trace. Round 12 nearly shipped exactly this: a
    // new "q_dedup_incremental" entry silently replaced the existing one in
    // BOTH queries and oracleSql, shrinking the gate surface by one with
    // all checks green. Tripwire: no key may appear as a literal
    // `"q_..." ->` binding more than twice across the source (once in
    // queries, once in oracleSql; derived bindings are built
    // programmatically and don't match the pattern).
    val src = scala.io.Source.fromFile("src/main/scala/graft/SparkEntry.scala", "UTF-8")
    val text = try src.mkString finally src.close()
    val keyRe = """"(q_\w+)"\s*->""".r
    val counts = keyRe.findAllMatchIn(text).map(_.group(1)).toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    val collapsed = counts.filter(_._2 > 2)
    assert(collapsed.isEmpty,
      s"query keys bound more than twice (duplicate Map entry shadows one): $collapsed")
  }

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
