package graft.operators

import graft.SparkTestBase

/** Strict-order funnel semantics on a handcrafted event log written to a
  * temp parquet dir shaped like the events table. */
class FunnelSpec extends SparkTestBase {

  test("stage anchors are strictly after the previous stage's min") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    // user 1: full path view(10) → click(20) → purchase(30)       depth 3
    // user 2: click(5) BEFORE view(10), no click after → depth 1
    // user 3: view(10), click(20), purchase(15) before click → depth 2
    // user 4: no view at all (click/purchase only) → depth 0
    // user 5: two views (30, 10) — anchor is min=10; click 20 counts
    val rows = Seq(
      (1L, 10L, 1L, "view"), (2L, 20L, 1L, "click"), (3L, 30L, 1L, "purchase"),
      (4L, 5L, 2L, "click"), (5L, 10L, 2L, "view"),
      (6L, 10L, 3L, "view"), (7L, 20L, 3L, "click"), (8L, 15L, 3L, "purchase"),
      (9L, 10L, 4L, "click"), (10L, 20L, 4L, "purchase"),
      (11L, 30L, 5L, "view"), (12L, 10L, 5L, "view"), (13L, 20L, 5L, "click"))
      .map { case (e, t, u, ty) =>
        (e, new java.sql.Timestamp(t), u, ty, 0.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.queries.Relational.funnel(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 3, 2L -> 1, 3L -> 2, 4L -> 0, 5L -> 2))
  }
}
