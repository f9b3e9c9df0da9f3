package graft

import org.apache.spark.sql.functions._

/** Dynamic partition pruning (DPP) — the scan-side capability the 100 TB
  * story leans on when a partitioned fact joins a filtered dimension: the
  * dim-side filter result is injected into the fact scan as a runtime
  * partition filter, so only the matching partition directories are read.
  * Static pushdown (PlanRegressionSpec) can't cover this — the partition
  * set is only known at runtime. This spec writes a partitioned copy of
  * lineitem, joins it to a parquet-backed dimension with a selective
  * filter, and pins (a) the dynamicpruning expression in the fact scan and
  * (b) result equality with the statically-filtered plan.
  */
class DynamicPruningSpec extends SparkTestBase {

  test("partitioned fact ⋈ filtered dim plans a dynamicpruning scan filter and prunes correctly") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    queries.Relational.table(spark, sf(), "lineitem")
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
      .write.partitionBy("l_returnflag").mode("overwrite").parquet(s"$tmp/fact")
    // Two non-obvious preconditions this spec documents by existing:
    // the dim must be FILE-BACKED (a LocalRelation constant-folds around
    // the runtime-pruning machinery), and its predicate must be "likely
    // selective" to Catalyst (EqualTo-literal qualifies; a bare boolean
    // attribute filter does NOT and silently disables DPP — probed on
    // this exact Spark build). Also beware partition-value type
    // inference: numeric directory values come back as INT and the
    // resulting join-key cast unanchors the partition attribute.
    Seq(("A", "keep"), ("N", "drop"), ("R", "drop")).toDF("flag", "tag")
      .write.mode("overwrite").parquet(s"$tmp/dim")
    val fact = spark.read.parquet(s"$tmp/fact")
    val dim = spark.read.parquet(s"$tmp/dim").filter(col("tag") === "keep")
    val joined = fact.join(dim, fact("l_returnflag") === dim("flag"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sq"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamicpruning expression in the fact scan:\n$plan")
    val got = joined.collect()(0)
    val want = fact.filter(col("l_returnflag") === "A")
      .agg(count(lit(1)), round(sum(col("l_quantity")), 2)).collect()(0)
    assert(got.getLong(0) == want.getLong(0) && got.getDouble(1) == want.getDouble(1),
      s"DPP result differs from the static filter: $got vs $want")
    assert(got.getLong(0) > 0, "vacuous: the kept partition is empty")
  }
}
