package graft

import org.apache.spark.sql.execution.ExplainMode

/** Plan-shape regressions: the properties §9's plan audit claims — filter
  * pushdown, column pruning, whole-stage codegen — asserted on
  * representative queries so a refactor that silently loses them fails CI
  * instead of only showing up in the bench. */
class PlanRegressionSpec extends SparkTestBase {

  private def formatted(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sf())
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  private def readSchemaLines(p: String): Seq[String] =
    p.linesIterator.filter(_.contains("ReadSchema:")).toSeq

  test("q_scan_filter_project: filters pushed to the scan, columns pruned") {
    val p = formatted("q_scan_filter_project")
    assert(p.contains("PushedFilters: ["), s"no pushdown metadata:\n$p")
    assert(!p.contains("PushedFilters: []"), s"expected non-empty pushed filters:\n$p")
    val rs = readSchemaLines(p)
    assert(rs.nonEmpty && rs.forall(!_.contains("l_comment")),
      s"lineitem scan must prune unused columns:\n${rs.mkString("\n")}")
  }

  test("q_token_count_bpe: scan pruned to (doc_id, text), single codegen projection") {
    val p = formatted("q_token_count_bpe")
    val rs = readSchemaLines(p)
    assert(rs.nonEmpty && rs.forall(l => l.contains("doc_id") && l.contains("text") &&
      !l.contains("source") && !l.contains("lang")),
      s"documents scan must read only (doc_id, text):\n${rs.mkString("\n")}")
  }

  test("q_pricing_summary: map-side partial agg; codegen spans in the final plan") {
    val p = formatted("q_pricing_summary")
    assert(p.contains("partial_sum") && p.contains("partial_count"),
      s"expected map-side combine (partial aggregation):\n$p")
    // codegen wrapping only shows on the AQE FINAL plan, after execution
    val df = SparkEntry.queries("q_pricing_summary")(spark, sf())
    df.collect()
    val fin = df.queryExecution.executedPlan.toString
    assert(fin.contains("WholeStageCodegen") || fin.contains("*("),
      s"expected whole-stage codegen in the executed plan:\n$fin")
  }
}
