package graft

/** Automates BASELINE.md/SURVEY §9's plan audit: every declared batch query
  * is planned (not run) and its physical plan scanned for the two shapes
  * that are job-killers at 100 TB unless the build side is provably
  * bounded — `CartesianProduct` (never acceptable: it means Spark found no
  * equi-key and no broadcastable side) and `BroadcastNestedLoopJoin`
  * (acceptable ONLY on a bounded build side). The BNLJ whitelist below
  * carries the boundedness argument per query; a new query that plans an
  * unlisted BNLJ, or any query that plans a cartesian, fails this spec
  * instead of waiting for a round's manual `graft.Explain` pass.
  *
  * Streaming queries are excluded: their sinks run inside the query
  * function, and their state/shuffle shape is pinned by the streaming
  * specs instead.
  */
class PlanAuditSpec extends SparkTestBase {

  /** query → why its BNLJ build side is bounded (cardinality argument). */
  private val bnljAllowed: Map[String, String] = Map(
    "q_argmin_assign" -> "seed frame: fixed seed sample, tens of rows",
    "q_core_distance_window" -> "bounded demo slice crossJoin (pairwise distances over <=200 points)",
    "q_corpus_mix" -> "single-row corpus-totals frame joined to every cell",
    "q_distance_pairs" -> "bounded demo slice crossJoin (pairwise distance showcase)",
    "q_knn_bruteforce" -> "broadcast query set: fixed handful of probe vectors",
    "q_knn_ivf" -> "k x dim centroid frame + probe set, both k-bounded",
    "q_mix_temperature" -> "single-row normalizer z joined to per-source counts",
    "q_mutual_reachability" -> "bounded demo slice: pairwise mutual-reachability showcase",
    "q_quality_buckets" -> "single-row percentile-boundaries frame",
    "q_range_join" -> "bucket-boundary dim table: fixed bucket count",
    "q_seq_pack" -> "single-row packing-summary totals join",
    "q_tfidf_top_terms" -> "single-row corpus-size frame joined into the IDF term table",
    "q_unigram_logprob" -> "single-row corpus-token-total frame joined into the vocab model")

  test("plan audit: no cartesian products; BNLJ only on whitelisted bounded build sides") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(_._1.startsWith("q_stream"))
      .flatMap { case (name, fn) =>
        val plan = fn(spark, sf()).queryExecution.executedPlan.toString
        val cart = if (plan.contains("CartesianProduct")) Seq(s"$name: CartesianProduct") else Nil
        val bnlj = if (plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed.contains(name))
          Seq(s"$name: unlisted BroadcastNestedLoopJoin") else Nil
        cart ++ bnlj
      }
    assert(offenders.isEmpty,
      s"plan audit violations (justify + whitelist, or fix the plan):\n${offenders.mkString("\n")}")
  }

  test("plan audit: whitelist has no stale entries") {
    val stale = bnljAllowed.keySet
      .filter(n => SparkEntry.queries.get(n).forall(fn =>
        !fn(spark, sf()).queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin")))
    assert(stale.isEmpty,
      s"whitelisted queries no longer plan a BNLJ — drop them from the list: $stale")
  }
}
