package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The correctness-gate failure contract (VERDICT r6 next-round item 3):
  * a query that breaks — at analysis time or at runtime — must still
  * produce an artifact entry (the `graft_error` sentinel parquet), never a
  * silently missing key. */
class VerifySpec extends SparkTestBase {

  test("a healthy query dumps its result and reports no failure") {
    val out = Files.createTempDirectory("verify_ok").toString
    val err = Verify.dumpOne(spark, "q_ok",
      (s, _) => { import s.implicits._; Seq((1L, "a"), (2L, "b")).toDF("id", "v") },
      sf(), out)
    assert(err.isEmpty)
    assert(spark.read.parquet(s"$out/q_ok").count() == 2)
  }

  test("an analysis-time failure yields the graft_error sentinel row, not a missing dump") {
    val out = Files.createTempDirectory("verify_broken").toString
    // unresolvable column: fails in analysis, the round-6 failure class
    val err = Verify.dumpOne(spark, "q_broken",
      (s, d) => s.read.parquet(s"$d/events.parquet").select(col("no_such_column")),
      sf(), out)
    assert(err.isDefined && err.get.nonEmpty)
    val dumped = spark.read.parquet(s"$out/q_broken")
    assert(dumped.columns.toSeq == Seq("graft_error"))
    val rows = dumped.collect()
    assert(rows.length == 1 && rows(0).getString(0).nonEmpty)
  }

  test("a runtime failure (post-analysis) is captured the same way") {
    val out = Files.createTempDirectory("verify_runtime").toString
    val boom = org.apache.spark.sql.functions.udf((i: Long) =>
      if (i >= 0) throw new IllegalStateException("deliberate runtime failure") else i)
    val err = Verify.dumpOne(spark, "q_runtime",
      (s, _) => s.range(10).select(boom(col("id")).as("x")), sf(), out)
    assert(err.isDefined)
    val dumped = spark.read.parquet(s"$out/q_runtime")
    assert(dumped.columns.toSeq == Seq("graft_error"))
  }
}
