package graft.io

import org.apache.spark.sql.functions._
import graft.{GraftSession, SparkTestBase}

/** The single-file-layout split lever (VERDICT r12 #7): an oversize
  * one-file table fans out to cluster width right after the scan; already-
  * parallel or small tables pass through without the extra shuffle. */
class ReadSplitSpec extends SparkTestBase {

  test("oversize single-file table splits to the requested width, rows intact") {
    val dir = java.nio.file.Files.createTempDirectory("readsplit").toString
    spark.range(10000).selectExpr("id", "repeat('x', 64) AS pad")
      .repartition(1).write.parquet(s"$dir/one")
    val split = GraftSession.readSplit(spark, s"$dir/one",
      minSplitBytes = 1024, partitions = 8)
    assert(split.rdd.getNumPartitions == 8,
      s"expected 8 partitions, got ${split.rdd.getNumPartitions}")
    assert(split.count() == 10000)
    assert(split.agg(sum(col("id"))).head().getLong(0) == 10000L * 9999 / 2)
  }

  test("small single-file and multi-file tables pass through unshuffled") {
    val dir = java.nio.file.Files.createTempDirectory("readsplit").toString
    spark.range(100).repartition(1).write.parquet(s"$dir/small")
    val small = GraftSession.readSplit(spark, s"$dir/small") // default 256m floor
    assert(small.rdd.getNumPartitions == 1, "small table should not split")
    spark.range(10000).selectExpr("id", "repeat('x', 64) AS pad")
      .repartition(4).write.parquet(s"$dir/multi")
    val multi = GraftSession.readSplit(spark, s"$dir/multi", minSplitBytes = 1)
    assert(!multi.queryExecution.executedPlan.toString.contains("Exchange"),
      "multi-file table must not pay the split shuffle")
    assert(multi.count() == 10000)
  }

  test("single file with several row groups passes through (planner already splits it)") {
    val dir = java.nio.file.Files.createTempDirectory("readsplit").toString
    // force tiny row groups so one file carries many — the shape the scan
    // planner parallelizes natively at maxPartitionBytes granularity
    spark.range(20000).selectExpr("id", "repeat('x', 64) AS pad")
      .repartition(1).write.option("parquet.block.size", "65536")
      .parquet(s"$dir/manyrg")
    val df = GraftSession.readSplit(spark, s"$dir/manyrg", minSplitBytes = 1024)
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"),
      "multi-row-group single file must not pay the split shuffle")
    assert(df.count() == 20000)
  }
}
