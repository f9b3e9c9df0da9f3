package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Demonstrates the co-located-join strategy SURVEY §9 cites for repeated
  * large-table joins: both sides written bucketed by the join key join with
  * ZERO Exchange operators (shuffle happened once, at write time), while
  * the same join over plain tables shuffles both sides.
  */
class BucketingSpec extends SparkTestBase {
  test("bucketed-by-key tables join without a shuffle") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("bucketed_wh").toString
    val left = (0L until 5000L).map(i => (i % 500, i)).toDF("k", "v")
    val right = (0L until 2000L).map(i => (i % 500, i * 10)).toDF("k", "w")
    // disable broadcast so the join strategy is decided by partitioning;
    // explicit external paths keep the shared session's warehouse untouched.
    // try/finally: a failed assert must still drop the four tables, or the
    // shared test session's catalog leaks into re-runs and other suites
    try withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      left.write.option("path", s"$wh/bk_left")
        .bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bk_left")
      right.write.option("path", s"$wh/bk_right")
        .bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bk_right")
      val bucketed = spark.table("bk_left").join(spark.table("bk_right"), "k")
      val bucketedPlan = bucketed.queryExecution.executedPlan.toString
      assert(!bucketedPlan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$bucketedPlan")

      left.write.option("path", s"$wh/plain_left").mode("overwrite")
        .saveAsTable("plain_left")
      right.write.option("path", s"$wh/plain_right").mode("overwrite")
        .saveAsTable("plain_right")
      val plain = spark.table("plain_left").join(spark.table("plain_right"), "k")
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange"),
        "control: the unbucketed join should shuffle")

      // same answer either way
      val a = bucketed.agg(count(lit(1)), sum($"v" + $"w").cast("decimal(30,0)"))
        .collect()(0)
      val b = plain.agg(count(lit(1)), sum($"v" + $"w").cast("decimal(30,0)"))
        .collect()(0)
      assert(a == b, s"$a vs $b")
    } finally Seq("bk_left", "bk_right", "plain_left", "plain_right")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  private def withSQLConf(kv: (String, String)*)(f: => Unit): Unit = {
    val olds = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
