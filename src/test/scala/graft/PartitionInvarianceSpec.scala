package graft

/** Blanket partition-invariance audit: every batch query in the declared
  * surface must produce the IDENTICAL result under two deliberately
  * different execution layouts (shuffle partition count and input split
  * size). The DuckDB oracle gate already proves value correctness for
  * SQL-replayable queries, but the pinned-VALUES family (LSH, BPE, MST,
  * multimodal stats, sampling) captures its expectation FROM the engine —
  * a partition-dependent bug there reproduces under the pin and passes
  * the gate silently (exactly the parallelism-dependent bubble-label bug
  * this round's earlier pass fixed). This spec closes that blind spot for
  * the whole surface at once: results must be a pure function of the
  * data, never of the cluster layout.
  *
  * Whitelisted exceptions carry the reason their output is partition-
  * DEPENDENT by design (and where the compensating evidence lives).
  */
class PartitionInvarianceSpec extends SparkTestBase {

  /** query → why its output may legitimately vary with the layout. */
  private val layoutDependentAllowed: Map[String, String] = Map(
    "q_sample_stratified" -> "df.stat.sampleBy draws per-partition seeded Bernoulli uniforms — the selected ROWS shift with input splits (the reference's semantics); the per-key FRACTIONS are the contract, pinned at the driver's default layout",
    "q_seq_pack" -> "bins are partition-local first-fit-decreasing by design — packing quality, not bin identity, is the contract (invariant oracle checks budget/coverage)",
    "q_percentiles_approx" -> "approx_percentile merges QuantileSummaries in layout order; the oracle checks the exact-percentile ENVELOPE, not equality")

  private val batchQueries =
    SparkEntry.queries.keys.toSeq.sorted.filterNot(_.startsWith("q_stream"))

  private def snapshot(): Map[String, Seq[String]] =
    batchQueries.map { n =>
      n -> SparkEntry.queries(n)(spark, sf())
        .collect().map(_.toString).sorted.toSeq
    }.toMap

  test("every batch query result is invariant to shuffle/input-split layout") {
    val conf = spark.conf
    val keep = (conf.get("spark.sql.shuffle.partitions"),
      conf.get("spark.sql.files.maxPartitionBytes"))
    try {
      conf.set("spark.sql.shuffle.partitions", "4")
      conf.set("spark.sql.files.maxPartitionBytes", "134217728")
      val a = snapshot()
      conf.set("spark.sql.shuffle.partitions", "13")
      conf.set("spark.sql.files.maxPartitionBytes", "16384") // force many input splits
      val b = snapshot()
      // third layout: a single shuffle partition collapses every partial-
      // aggregation tree to one fold order — the strongest probe for
      // order-dependent double sums (the q_volatility r9 flake class)
      conf.set("spark.sql.shuffle.partitions", "1")
      conf.set("spark.sql.files.maxPartitionBytes", "134217728")
      val c = snapshot()
      val diffs = batchQueries.filter(n => a(n) != b(n) || a(n) != c(n))
      val unexcused = diffs.filterNot(layoutDependentAllowed.contains)
      assert(unexcused.isEmpty,
        s"layout-dependent results (pure-function contract broken): ${unexcused.mkString(", ")}")
      val stale = layoutDependentAllowed.keySet -- diffs
      // a whitelisted query that HAPPENS to agree on this corpus is fine —
      // the whitelist documents permission, not expectation — but if it is
      // no longer declared at all, drop the row
      val gone = layoutDependentAllowed.keySet -- batchQueries
      assert(gone.isEmpty, s"whitelist rows for undeclared queries: $gone")
      info(s"${batchQueries.size} queries invariant across 3 layouts; " +
        s"layout-dependent by design: ${diffs.filter(layoutDependentAllowed.contains).mkString(", ")}; " +
        s"agreeing anyway: ${stale.mkString(", ")}")
    } finally {
      conf.set("spark.sql.shuffle.partitions", keep._1)
      conf.set("spark.sql.files.maxPartitionBytes", keep._2)
    }
  }

  /** The queries whose outputs round FLOATING-POINT aggregates: every one
    * now folds exact integers (cents / micro / pico units — the
    * q_volatility exact-replay recipe), so their hashes must survive any
    * layout at the DRIVER-GATE scale (sf0.01), where the r9 flake
    * actually fired while sf0.001 stayed green. */
  private val statsFamily = Seq(
    "q_volatility", "q_anova", "q_autocorr", "q_spearman", "q_cohort_ltv",
    "q_mix_kl", "q_mutual_info", "q_chi_square", "q_changepoint",
    "q_multitouch", "q_forecast", "q_bootstrap_ci", "q_winsorize",
    "q_corr_matrix", "q_pricing_summary", "q_tpch_q3", "q_tpch_q5",
    "q_doc_cosine_sparse", "q_embed_centroids", "q_groupwise_ols",
    "q_profile", "q_unigram_logprob", "q_bigram_logprob", "q_kneser_ney",
    "q_multimodal_stats", "q_range_join", "q_ab_test", "q_mann_whitney",
    "q_ks_test", "q_descriptive_stats")

  test("stats-family queries are layout-invariant at the driver-gate SF (sf0.01)") {
    val present = statsFamily.filter(SparkEntry.queries.contains)
    val conf = spark.conf
    val keep = conf.get("spark.sql.shuffle.partitions")
    def snap(): Map[String, Seq[String]] =
      present.map { n =>
        n -> SparkEntry.queries(n)(spark, sf("sf0.01"))
          .collect().map(_.toString).sorted.toSeq
      }.toMap
    try {
      conf.set("spark.sql.shuffle.partitions", "1")
      val a = snap()
      conf.set("spark.sql.shuffle.partitions", "7")
      val b = snap()
      conf.set("spark.sql.shuffle.partitions", "32")
      val c = snap()
      val diffs = present.filter(n => a(n) != b(n) || a(n) != c(n))
      assert(diffs.isEmpty,
        s"order-dependent float aggregation at gate scale: ${diffs.mkString(", ")}")
      info(s"${present.size} stats queries hash-stable at sf0.01 across 3 layouts")
    } finally conf.set("spark.sql.shuffle.partitions", keep)
  }
}
