package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Diagnostic main for the r16 plan artifacts: several declared queries
  * (the n-gram dedup family) materialize eagerly through the round-7
  * shingle cache, so their query-level `explain` shows only a cached
  * `Scan ExistingRDD` tail. This prints the operators' LAZY inner plans
  * (eager=false) — the form `plans/r16/` commits as before/after evidence
  * for the scan-split change, same technique PlanRegressionSpec pins with.
  *
  * Args: substring filters over {ngram_jaccard, ngram_containment,
  * simjoin_cost}; no args = all three.
  */
object LazyPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val split = sys.env.get("SPARK_GRAFT_LAZYPLANS_SPLIT").forall(_ == "1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs =
      if (split) graft.GraftSession.readSplit(spark, s"$sfDir/documents.parquet",
        minSplitBytes = 0L)
      else spark.read.parquet(s"$sfDir/documents.parquet")
    val frames: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "ngram_jaccard" -> (() =>
        graft.operators.Dedup.ngramJaccardPairsPrefix(docs, "source", eager = false)
          .orderBy(col("block"), col("id_a"), col("id_b"))),
      "ngram_containment" -> (() =>
        graft.operators.Dedup.ngramContainmentPairs(docs, "source", threshold = 0.9,
          eager = false)
          .orderBy(col("block"), col("id_a"), col("id_b"))),
      "simjoin_cost" -> (() =>
        graft.operators.Diagnostics.similarityJoinCost(docs, "source")
          .orderBy(col("block"))))
    frames.filter(f => args.isEmpty || args.exists(f._1.contains)).foreach {
      case (name, fn) =>
        println(s"\n========== lazy:$name (split=$split) ==========")
        try println(fn().queryExecution.explainString(ExplainMode.fromString("formatted")))
        catch { case e: Throwable => println(s"EXPLAIN FAILED: ${e.getMessage}") }
    }
    spark.stop()
  }
}
