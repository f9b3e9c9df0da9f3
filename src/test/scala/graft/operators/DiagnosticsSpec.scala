package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class DiagnosticsSpec extends SparkTestBase {

  test("keySkew: hand-computed shares and straggler factor") {
    import spark.implicits._
    // 6 a, 3 b, 1 c → total 10, max 6, 3 keys: straggler = 6*3/10 = 1.8
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("k")
    val got = Diagnostics.keySkew(df, col("k"), k = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq === Seq(("a", 6L, 0.6, 1.8), ("b", 3L, 0.3, 1.8)))
  }

  test("tableDiff: added/removed/changed, null-sentineled payloads") {
    import spark.implicits._
    val base = Seq((1L, Some("x"), 10L), (2L, Some("y"), 20L),
      (3L, None: Option[String], 30L)).toDF("id", "payload", "v")
    val next = Seq((1L, Some("x"), 10L),          // same → omitted
      (2L, Some("y2"), 20L),                      // changed
      (4L, Some("z"), 40L))                       // added; 3 removed
      .toDF("id", "payload", "v")
    val got = Diagnostics.tableDiff(base, next, "id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
    // null vs empty-string payload must DIFFER (the sentinel's job)
    val b2 = Seq((1L, None: Option[String])).toDF("id", "p")
    val n2 = Seq((1L, Some(""))).toDF("id", "p")
    assert(Diagnostics.tableDiff(b2, n2, "id").collect()
      .map(_.getString(1)).toSeq === Seq("changed"))
  }

  test("incrementalDistinct: merged-shard estimate == one-shot sketch; within 5%") {
    import spark.implicits._
    val all = (1 to 30000).map(i => s"v${i % 7321}").toDF("v")
    val shards = (0 until 3).map(i => all.filter(pmod(xxhash64(col("v")), lit(3)) === i))
    val steps = Diagnostics.incrementalDistinct(shards, "v").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(steps.keySet === Set(1, 2, 3))
    // union-of-sketches must equal the sketch of the union (HLL identity)
    val oneShot = all.agg(
      hll_sketch_estimate(hll_sketch_agg(col("v"))).as("e")).head().getLong(0)
    assert(steps(3) === oneShot)
    assert(math.abs(steps(3) / 7321.0 - 1.0) <= 0.05, s"estimate ${steps(3)}")
  }

  test("mergeAggState equals the direct full aggregate at any split") {
    import spark.implicits._
    val rows = (1 to 500).map(i => (s"k${i % 7}", (i % 13).toDouble)).toDF("key", "v")
    val direct = rows.groupBy(col("key")).agg(count(lit(1)).as("cnt"), sum(col("v")).as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val idx = (1 to 500).map(i => (i, s"k${i % 7}", (i % 13).toDouble)).toDF("i", "key", "v")
    for (frac <- Seq(0.0, 0.5, 1.0)) {
      val cut = (500 * frac).toInt
      val b = idx.filter(col("i") <= cut)
      val dl = idx.filter(col("i") > cut)
      val state = b.groupBy(col("key")).agg(count(lit(1)).as("cnt"), sum(col("v")).as("total"))
      val merged = Diagnostics.mergeAggState(state, dl, "key", "v").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
      assert(merged.toSeq === direct.toSeq, s"frac=$frac")
    }
  }
}
