package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Automates BASELINE.md/SURVEY §9's plan audit: every declared batch query
  * is driven through its query function and every physical plan it touches
  * is scanned for the two shapes that are job-killers at 100 TB unless the
  * build side is provably bounded — `CartesianProduct` (never acceptable:
  * it means Spark found no equi-key and no broadcastable side) and
  * `BroadcastNestedLoopJoin` (acceptable ONLY on a bounded build side).
  *
  * "Every plan it touches" is three channels (round-5 review finding — the
  * returned frame's plan alone is blind to iterative operators, whose inner
  * rounds execute eagerly inside the query function and leave only a scan
  * over materialized blocks behind):
  *   1. the returned frame's own physical plan (planned, not executed);
  *   2. every Dataset action completed while the function ran (count/collect
  *      inside loops), via a `QueryExecutionListener`;
  *   3. every `GraftShim.materialize` call (star-contraction rounds, Borůvka
  *      rounds, checkpoint rotations — these run through `toRdd`, which no
  *      listener sees), via `GraftShim.planAuditSink`.
  *
  * The BNLJ whitelist below carries the boundedness argument per query; a
  * new query that plans an unlisted BNLJ, or any query that plans a
  * cartesian anywhere in its pipeline, fails this spec instead of waiting
  * for a round's manual `graft.Explain` pass.
  *
  * Streaming queries are excluded: their sinks run inside the query
  * function, and their state/shuffle shape is pinned by the streaming
  * specs instead.
  */
class PlanAuditSpec extends SparkTestBase {

  /** query → why its BNLJ build side is bounded (cardinality argument). */
  private val bnljAllowed: Map[String, String] = Map(
    "q_argmin_assign" -> "seed frame: fixed seed sample, tens of rows",
    "q_bubble_distance" -> "10-row bubble frame crossJoined to itself (pairwise E7 showcase)",
    "q_connected_components" -> "bounded demo slice crossJoin (<=300-vertex pairwise edge build)",
    "q_mst_distributed" -> "150-point reference dataset pairwise edge build, broadcast side",
    "q_core_distance_window" -> "bounded demo slice crossJoin (pairwise distances over <=200 points)",
    "q_corpus_mix" -> "single-row corpus-totals frame joined to every cell",
    "q_ks_test" -> "single-row (na, nb) totals frame crossJoined onto the compressed distinct-value CDF domain",
    "q_corpus_overlap" -> "three single-row sketch-aggregate frames crossJoined into one result row",
    "q_profile" -> "two SINGLE-ROW aggregate frames (plain-moments pass × exact-distinct pass) crossJoined into one wide row — the split that keeps the moment sums off the ×(k+1) distinct Expand",
    "q_scd2_lookup" -> "single-row global time-span frame crossJoined into the probe generator",
    "q_embed_quantize" -> "single-row packed min/max-arrays frame broadcast to the code transform",
    "q_hybrid_search" -> "single-row query-vector frame broadcast to the cosine leg (bm25 leg reuses q_bm25's single-row stats)",
    "q_distance_pairs" -> "bounded demo slice crossJoin (pairwise distance showcase)",
    "q_heavy_hitters" -> "single-row token-total frame joined into the exact counts",
    "q_knn_bruteforce" -> "broadcast query set: fixed handful of probe vectors",
    "q_knn_ivf" -> "k x dim centroid frame + probe set, both k-bounded; plus the broadcast fixed query set of the in-query brute-force recall baseline",
    "q_knn_pq" -> "broadcast per-query ADC LUT frame (|queries| x m*ks doubles, query-set-bounded); plus the broadcast fixed query set of the brute-force recall baseline",
    "q_knn_ivfpq" -> "broadcast centroid frame (k x dim) for probe routing + broadcast fixed query set; the ADC scan itself is an equi-join on centroid_id, not a BNLJ",
    "q_collocations" -> "two SINGLE-ROW broadcast totals (bigram total, unigram total) joined onto the vocab-shaped pair table — the 1-row-frame normalizer pattern",
    "q_kneser_ney" -> "single-row broadcast bigram-type total joined onto the vocab-shaped model table — the 1-row-frame normalizer pattern",
    "q_key_skew" -> "single-row broadcast totals frame (sum/max/count of the key histogram) — the 1-row-frame normalizer pattern",
    "q_gap_fill" -> "single-row broadcast [min,max] span frame fanned onto the distinct event types — the 1-row-frame normalizer pattern",
    "q_anomaly_zscore" -> "single-row broadcast [min,max] span frame building the hourly spine — same 1-row-frame pattern as q_gap_fill",
    "q_bm25" -> "single-row broadcast corpus-stats frame (N, Σdl, per-term df) joined onto every doc — the 1-row-frame normalizer pattern",
    "q_histogram" -> "single-row broadcast [min,max] span frame fanned onto the value rows — the 1-row-frame normalizer pattern",
    "q_triangle_count" -> "broadcast 200-vector bounded slice building the mutual-kNN graph (at corpus scale the edges come from the IVF tier); the triangle closure itself is equi-join only",
    "q_link_prediction" -> "same bounded 200-vector mutual-kNN preamble as q_triangle_count; the wedge join and Jaccard scoring are equi-join only",
    "q_mix_temperature" -> "single-row normalizer z joined to per-source counts",
    "q_mutual_reachability" -> "bounded demo slice: pairwise mutual-reachability showcase",
    "q_quality_buckets" -> "single-row percentile-boundaries frame",
    "q_quality_classifier" -> "single-row train-count frame joined to the single-row holdout summary",
    "q_range_join" -> "bucket-boundary dim table: fixed bucket count",
    "q_seq_pack" -> "single-row packing-summary totals join",
    "q_tfidf_top_terms" -> "single-row corpus-size frame joined into the IDF term table",
    "q_unigram_logprob" -> "single-row corpus-token-total frame joined into the vocab model",
    "q_autocorr" -> "single-row broadcast global-mean frame joined onto the daily series — the 1-row-frame normalizer pattern",
    "q_chi_square" -> "broadcast marginal frames bounded by |flag|x|status| cells plus the single-row grand total",
    "q_changepoint" -> "two single-row broadcast frames (global mean, argmax changepoint) joined onto the daily series",
    "q_rfm" -> "single-row broadcast global-max-date frame anchoring recency — the 1-row-frame normalizer pattern",
    "q_naive_bayes" -> "single-row broadcast doc-total frame plus the |languages|-bounded prior frame joined onto test tokens",
    "q_psi" -> "single-row broadcast midpoint/total frames plus the fixed bin-cut frame (<=10 rows)",
    "q_adamic_adar" -> "same bounded 200-vector mutual-kNN preamble as q_triangle_count/q_link_prediction; the wedge join and AA scoring are equi-join only",
    "q_log_odds_terms" -> "single-row broadcast corpus-token-total frame joined onto the (lang, term) counts — the 1-row-frame normalizer pattern",
    "q_lift" -> "single-row broadcast (N, P) totals frame assigning deciles — the 1-row-frame normalizer pattern",
    "q_hits" -> "per-round single-row max-normalizer frames broadcast onto the node-shaped score frames",
    "q_target_encode" -> "single-row broadcast global-prior frame joined onto every doc — the 1-row-frame normalizer pattern",
    "q_churn" -> "single-row broadcast max-period frame excluding the unclosable last period — the 1-row-frame normalizer pattern",
    "q_power_curve" -> "single-row broadcast max-day frame anchoring the trailing 28-day window — the 1-row-frame normalizer pattern",
    "q_mix_kl" -> "single-row broadcast corpus-total frame joined onto the (source, lang) cells — the 1-row-frame normalizer pattern",
    "q_pareto" -> "single-row broadcast (total, n_users) frame gating the cumulative walk — the 1-row-frame normalizer pattern",
    "q_anova" -> "single-row broadcast grand-totals frame joined onto the |types|-bounded group moments — the 1-row-frame normalizer pattern")

  private object capture extends QueryExecutionListener {
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      plans.add(qe.executedPlan.toString)
    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
  }

  /** Run one query function and return every physical plan it touched. */
  private def plansTouched(name: String): Seq[String] = {
    capture.plans.clear()
    spark.listenerManager.register(capture)
    GraftShim.planAuditSink = Some(p => capture.plans.add(p))
    try {
      val outer = SparkEntry.queries(name)(spark, sf()).queryExecution.executedPlan.toString
      GraftShim.drainListenerBus(spark)
      outer +: capture.plans.asScala.toSeq
    } finally {
      GraftShim.planAuditSink = None
      spark.listenerManager.unregister(capture)
    }
  }

  private val batchQueries =
    SparkEntry.queries.keys.toSeq.sorted.filterNot(_.startsWith("q_stream"))

  test("plan audit: no cartesian products; BNLJ only on whitelisted bounded build sides") {
    val seenBnlj = scala.collection.mutable.Set[String]()
    val offenders = batchQueries.flatMap { name =>
      val plans = plansTouched(name)
      val cart = if (plans.exists(_.contains("CartesianProduct")))
        Seq(s"$name: CartesianProduct") else Nil
      val hasBnlj = plans.exists(_.contains("BroadcastNestedLoopJoin"))
      if (hasBnlj) seenBnlj += name
      val bnlj = if (hasBnlj && !bnljAllowed.contains(name))
        Seq(s"$name: unlisted BroadcastNestedLoopJoin") else Nil
      cart ++ bnlj
    }
    assert(offenders.isEmpty,
      s"plan audit violations (justify + whitelist, or fix the plan):\n${offenders.mkString("\n")}")
    // staleness check rides the same pass (the audit executes eager
    // pipelines — running it twice would double the spec's cost)
    val stale = bnljAllowed.keySet -- seenBnlj
    assert(stale.isEmpty,
      s"whitelisted queries no longer touch a BNLJ — drop them from the list: $stale")
  }
}
