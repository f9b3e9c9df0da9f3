package graft

import org.apache.spark.sql.execution.ExplainMode

/** Plan-shape regressions: the properties §9's plan audit claims — filter
  * pushdown, column pruning, whole-stage codegen — asserted on
  * representative queries so a refactor that silently loses them fails CI
  * instead of only showing up in the bench. */
class PlanRegressionSpec extends SparkTestBase {

  private def formatted(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sf())
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  private def readSchemaLines(p: String): Seq[String] =
    p.linesIterator.filter(_.contains("ReadSchema:")).toSeq

  test("q_scan_filter_project: filters pushed to the scan, columns pruned") {
    val p = formatted("q_scan_filter_project")
    assert(p.contains("PushedFilters: ["), s"no pushdown metadata:\n$p")
    assert(!p.contains("PushedFilters: []"), s"expected non-empty pushed filters:\n$p")
    val rs = readSchemaLines(p)
    assert(rs.nonEmpty && rs.forall(!_.contains("l_comment")),
      s"lineitem scan must prune unused columns:\n${rs.mkString("\n")}")
  }

  test("q_token_count_bpe: scan pruned to (doc_id, text), single codegen projection") {
    val p = formatted("q_token_count_bpe")
    val rs = readSchemaLines(p)
    assert(rs.nonEmpty && rs.forall(l => l.contains("doc_id") && l.contains("text") &&
      !l.contains("source") && !l.contains("lang")),
      s"documents scan must read only (doc_id, text):\n${rs.mkString("\n")}")
  }

  test("q_pricing_summary: map-side partial agg; codegen spans in the final plan") {
    val p = formatted("q_pricing_summary")
    assert(p.contains("partial_sum") && p.contains("partial_count"),
      s"expected map-side combine (partial aggregation):\n$p")
    // codegen wrapping only shows on the AQE FINAL plan, after execution
    val df = SparkEntry.queries("q_pricing_summary")(spark, sf())
    df.collect()
    val fin = df.queryExecution.executedPlan.toString
    assert(fin.contains("WholeStageCodegen") || fin.contains("*("),
      s"expected whole-stage codegen in the executed plan:\n$fin")
  }

  test("q_cf_stats: typed CF aggregator combines map-side; only (label, CF) partials shuffle") {
    val p = formatted("q_cf_stats")
    // partial_cfaggregator below the Exchange = the 100 TB property: one
    // CF(n, LS, SS) row per (task, label) crosses the wire, not the vectors
    assert(p.contains("partial_cfaggregator"),
      s"expected map-side partial CF aggregation:\n$p")
    assert(p.contains("ObjectHashAggregate"),
      s"typed Aggregator should plan as ObjectHashAggregate:\n$p")
  }

  test("q_funnel: min-agg chain — no Window sort of the event log, map-side partial mins") {
    val p = formatted("q_funnel")
    assert(!p.contains("Window"),
      s"funnel must be the groupBy-min chain, not an event-log window sort:\n$p")
    assert(p.contains("partial_min"),
      s"expected map-side partial min per stage:\n$p")
  }

  test("q_pagerank: rank frame lineage is checkpoint-truncated (constant plan depth)") {
    val p = formatted("q_pagerank")
    // after 3 localCheckpoint'd rounds the final plan reads the
    // checkpointed RDD — if the full 3-round join/agg lineage ever
    // reappears inline, the BpeTrain-class plan blowup is back
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"),
      s"expected the checkpoint-truncated rank scan:\n$p")
    assert(!p.contains("Exchange hashpartitioning(dst"),
      s"iteration internals must not leak into the final plan:\n$p")
  }

  test("q_triangle_count: equi-join wedges, LeftSemi closure, no cartesian anywhere") {
    val p = formatted("q_triangle_count")
    assert(p.contains("LeftSemi"),
      s"wedge closure must be a semi-join against the oriented edge set:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"triangle closure must never plan a cartesian:\n$p")
    // the oriented edge frame is checkpointed once and read by both the
    // wedge join and the closure probe
    assert(p.contains("ExistingRDD"),
      s"expected the checkpointed oriented-edge scan:\n$p")
  }

  test("q_label_propagation: label frame lineage is checkpoint-truncated (constant plan depth)") {
    val p = formatted("q_label_propagation")
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"),
      s"expected the checkpoint-truncated label scan:\n$p")
    assert(!p.contains("Exchange hashpartitioning(dst"),
      s"iteration internals must not leak into the final plan:\n$p")
  }

  test("count-min sketch build plans as map-side-combining ObjectHashAggregate") {
    // q_count_min's returned frame is the driver-assembled probe table
    // (LocalTableScan); the plan property to pin is the SKETCH BUILD that
    // runs inside it — partial CMS matrices per task, one combiner.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val toks = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(explode(graft.operators.TextOps.tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "").as[String]
    val agg = toks.select(new graft.operators.Sketches.CountMin(4, 256).toColumn)
    val p = agg.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("ObjectHashAggregate"),
      s"typed CMS Aggregator should plan as ObjectHashAggregate:\n$p")
    assert(p.toLowerCase.contains("partial_countmin"),
      s"expected map-side partial CMS aggregation:\n$p")
  }

  // ---- round-5 heavy-tail pins (VERDICT r4 #6) ----

  test("q_ngram_jaccard: prefix-posting plan — (block, shingle) exchanges, codegen verify, no cartesian") {
    // eager=false: the shipped query materializes through the shingle
    // cache (round-7 persist), leaving only a cached-block scan in its
    // returned plan — pin the operator's underlying lazy plan instead
    // (identical modulo the cache wrapper; PlanAuditSpec still audits the
    // executed eager pipeline through its listener channels)
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val df = graft.operators.Dedup.ngramJaccardPairsPrefix(docs, "source", eager = false)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"prefix-AllPairs must never plan an all-pairs join:\n$p")
    // the df-count stage and the posting self-join both shuffle on (block, h)
    assert(p.contains("hashpartitioning(block"),
      s"expected exchanges keyed by (block, shingle):\n$p")
    assert(p.contains("partial_count"), s"df stage must map-side combine:\n$p")
    // the exact verify runs the zero-allocation codegen merge kernel, not
    // size(array_intersect) (the 1.6x regression graft.Prof verify measured)
    assert(p.contains("graft_sorted_intersect_count") || p.contains("sortedIntersectCount") ||
      p.toLowerCase.contains("sorted_intersect"),
      s"expected the codegen sorted-merge verify kernel in the plan:\n$p")
  }

  test("q_span_dedup: two map-side-combining agg levels, no countDistinct Expand") {
    val p = formatted("q_span_dedup")
    // the explicit (span, doc) → span two-level shape: partial counts below
    // each exchange, and NO Expand operator (countDistinct's planning,
    // which would re-shuffle raw occurrence rows)
    assert(p.contains("partial_count"), s"expected map-side partial counts:\n$p")
    assert(!p.contains("Expand"), s"countDistinct Expand crept back in:\n$p")
    val rs = readSchemaLines(p)
    assert(rs.nonEmpty && rs.forall(l => l.contains("doc_id") && l.contains("text") &&
      !l.contains("source")),
      s"documents scan must read only (doc_id, text):\n${rs.mkString("\n")}")
  }

  test("q_decontaminate_bloom: codegen bloom probe on the scan side, anti-join only for candidates") {
    val p = formatted("q_decontaminate_bloom")
    assert(p.contains("might_contain"),
      s"expected the BloomFilterMightContain probe in the plan:\n$p")
    // the provably-clean branch (NOT might_contain) must not feed any join:
    // exactly one anti-join in the plan TREE, for the candidate sliver
    // (simple mode prints each operator once; formatted repeats it in the
    // per-operator detail section)
    val tree = SparkEntry.queries("q_decontaminate_bloom")(spark, sf())
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    val antiJoins = tree.linesIterator.count(l => l.contains("LeftAnti"))
    assert(antiJoins == 1, s"expected exactly one anti-join (candidates only):\n$tree")
  }

  test("q_dedup_clusters: star contraction converges in O(log n) rounds on the production slice") {
    import org.apache.spark.sql.functions._
    // same edge set as the query (ngram-jaccard >= 0.5 over the bounded
    // sf0.001 slice) — through runCounted to pin the round bound that the
    // query path (Dedup.dedupClusters -> ConnectedComponents.run) executes
    val docs = spark.read.parquet(s"${sf()}/documents.parquet").filter(col("doc_id") < 1500)
    val pairs = graft.operators.Dedup.ngramJaccardPairsPrefix(docs, "source", threshold = 0.5)
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
    val (labels, rounds) = graft.operators.ConnectedComponents.runCounted(spark, edges)
    val nVerts = labels.count()
    assert(nVerts > 0, "vacuous: no near-dup pairs in the slice")
    val bound = 2 * (math.ceil(math.log(nVerts.toDouble.max(2)) / math.log(2)).toInt + 2)
    assert(rounds <= bound, s"star contraction took $rounds rounds for $nVerts vertices (bound $bound)")
    // all-pairs-shape scanning for this query (including the contraction
    // rounds, which materialize eagerly and never appear in the returned
    // frame's plan) lives in PlanAuditSpec's three-channel audit — a
    // final-plan assert here would only see a scan over cached blocks
  }

  test("q_mst_distributed: Boruvka contracts in O(log V) rounds on the reference graph") {
    import org.apache.spark.sql.functions._
    val pts = graft.io.PointsIO.readPointsText(spark, SparkEntry.refDatasetPath())
    val a = pts.select(col("id").as("src"), col("features").as("va"))
    val b = pts.select(col("id").as("dst"), col("features").as("vb"))
    val edges = a.crossJoin(b).filter(col("src") < col("dst"))
      .select(col("src"), col("dst"),
        graft.functions.Distances.euclidean(col("va"), col("vb")).as("weight"))
    // driverCap = 0 forces the distributed contraction (the subject here);
    // the below-cap driver Kruskal path returns rounds = 0 by design
    val (forest, rounds) = graft.operators.BoruvkaMst.runCounted(spark, edges,
      driverCap = 0)
    assert(forest.count() == 149)
    // components at least halve per round: ceil(log2(150)) = 8, +1 for the
    // final empty-frame convergence detection round
    assert(rounds <= 9, s"Boruvka took $rounds rounds for 150 vertices")
  }

  test("bigramLogProb: the hot-w1 context join is salted (AQE skew-split cannot match it)") {
    import org.apache.spark.sql.functions._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    // web-scale shape in miniature: force shuffle joins and scale the skew
    // thresholds down to the test corpus (production: 256 MB partitions)
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32768")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      // every bigram starts with "the": the cnt2<-cnt1 join key w1 is one
      // hot value — the exact 100 TB skew VERDICT r4 wrong #2 flags. AQE
      // skew-split can NEVER rescue this join (both inputs are final
      // aggregates, so HashAggregate sits between the shuffle stage and
      // the join and OptimizeSkewedJoin's pattern misses — verified here
      // by the absence of skew=true even with thresholds scaled to toy
      // size), so the operator must salt it.
      val docs = spark.range(12000).select(col("id").as("doc_id"),
        concat(lit("the a"), col("id"), lit(" the b"), col("id"),
          lit(" the c"), col("id"), lit(" the d"), col("id")).as("text"))
      val bi = graft.operators.TextOps.bigramLogProb(docs)
      assert(bi.count() == 12000)
      val fin = bi.queryExecution.executedPlan.toString
      assert(!fin.toLowerCase.contains("skew=true"),
        "AQE began skew-splitting the agg-fed join: the explicit salt is " +
          "now redundant — re-evaluate the operator")
      // the context join must key on (w1, salt), spreading the "the"
      // mega-key over the salt fan-out
      val saltedJoin = fin.linesIterator.exists(l =>
        (l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")) &&
          l.contains("w1") && l.contains("salt"))
      assert(saltedJoin, s"expected the cnt2-cnt1 context join keyed (w1, salt):\n$fin")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
