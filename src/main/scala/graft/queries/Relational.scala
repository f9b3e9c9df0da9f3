package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Distances

/** The declared relational query surface (SURVEY.md §2.14): every dataflow
  * shape the reference engine contains, instantiated on the driver testdata
  * and expressed with idiomatic, Catalyst-optimizable DataFrame code. Each
  * query has a DuckDB-equivalent oracle in [[graft.SparkEntry.oracleSql]].
  *
  * Determinism rules used throughout (so oracle hashes match):
  *   - every output is totally ordered by an explicit unique key
  *   - every floating aggregate over non-integral doubles is round()ed
  *   - ties in windows are broken by a unique id column
  */
object Relational {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** The events table, with `ts` normalized to TimestampType micros whatever
    * the testdata's physical encoding — see [[graft.io.EventsReader]]. */
  def events(spark: SparkSession, dir: String): DataFrame =
    graft.io.EventsReader.batch(spark, dir)

  /** S1/S2/F-class: scan → filter → project, pushdown-friendly. */
  def scanFilterProject(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .filter(col("l_quantity") > 45 && col("l_discount") >= 0.05)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        round(col("l_extendedprice"), 2).as("price"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** A1/A2-class: TPC-H Q1-shaped grouped aggregation with partial (map-side)
    * aggregation — one shuffle on the two grouping keys. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    // price·(1−disc) is a 4-dp value; its double sum lands EXACTLY on the
    // 2-dp round boundary for ~1% of groups, where the partial-agg order
    // decides the flip. Accumulate exact 1e-4-unit integers instead
    // (cents × (100−disc_cents), ≤ ~1e9/row — the plain BIGINT sum holds
    // to ~6e9 rows/group, i.e. past sf1000); one order-free division at
    // the end.
    val pc = round(col("l_extendedprice") * 100).cast("long")
    val dc = round(col("l_discount") * 100).cast("long")
    table(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("l_quantity")).as("sum_qty"),                 // integral doubles: exact
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        round(sum(pc * (lit(100L) - dc)) / lit(10000.0), 2)
          .as("sum_disc_price"),
        avg(col("l_quantity")).as("avg_qty"),                 // exact-sum / count: deterministic
        min(col("l_discount")).as("min_disc"),
        max(col("l_discount")).as("max_disc"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** A-family extension: hierarchical ROLLUP totals (per (flag, status),
    * per flag, grand total) in one pass — Catalyst expands the grouping
    * sets map-side, so the cube costs one shuffle, not three queries.
    * Null grouping keys are re-labeled 'ALL' so the result is
    * unambiguous (and hash-comparable: DuckDB's ROLLUP emits the same
    * NULLs). */
  def rollupPricing(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
        col("cnt"), col("sum_qty"), col("sum_price"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Skew-resilient equi-join: the classic salting rewrite. The skewed
    * (fact) side gets a deterministic salt in [0, S); the small (dim) side
    * is exploded S× with every salt value; the join key becomes
    * (key, salt), so one hot key's rows spread over S reducers instead of
    * one. Semantically identical to the plain join — which is exactly what
    * the oracle checks. S=8 here; at scale S is sized to the hottest key's
    * row count / target partition size (or left to AQE's skew-join split
    * when its thresholds fit). */
  def saltedJoin(spark: SparkSession, dir: String, salts: Int = 8): DataFrame = {
    val fact = table(spark, dir, "lineitem")
      .withColumn("salt", pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(salts)))
    val dim = table(spark, dir, "part")
      .select(col("p_partkey"), col("p_brand"))
      .withColumn("salt", explode(array((0 until salts).map(lit): _*)))
    // merge hint: without it Spark would broadcast the exploded dim and
    // never exercise the salted shuffle this operator demonstrates
    fact.join(dim.hint("merge"), fact("l_partkey") === dim("p_partkey") && fact("salt") === dim("salt"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("p_brand"))
  }

  /** A2: global count. */
  def countLineitem(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem").agg(count(lit(1)).as("cnt"))

  /** F-class on events: predicate + projection. */
  def filterEvents(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .filter(col("event_type") === "click" && col("value") > 50.0)
      .select(col("event_id"), col("user_id"), round(col("value"), 4).as("value"))
      .orderBy(col("event_id"))

  /** J2-class: broadcast dimension join (part is small) + grouped agg. */
  def joinBroadcast(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .join(broadcast(table(spark, dir, "part")), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("p_brand"))

  /** Multiway join through two broadcastable dims. */
  def joinMultiway(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .join(broadcast(table(spark, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(table(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("sum_price"))
      .orderBy(col("n_name"))

  /** U2/F4-class: anti join — customers with no orders. */
  def antiJoin(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer")
      .join(table(spark, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** U1-class: UNION ALL of two filtered slices. */
  def unionSlices(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    ev.filter(col("event_type") === "click").select(col("event_id"), col("event_type"))
      .unionAll(ev.filter(col("event_type") === "error").select(col("event_id"), col("event_type")))
      .orderBy(col("event_id"))
  }

  /** U3/P4-class: distinct + dense-rank renumbering (the reference's driver
    * TreeSet relabel, Main.java:272-290, as a declarative window). */
  def distinctRenumber(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus")).distinct()
      .withColumn("new_id",
        dense_rank().over(Window.orderBy(col("l_returnflag"), col("l_linestatus"))))
      .orderBy(col("new_id"))

  /** A5/W1-class: argmax per key with deterministic tie-break. */
  def maxPerKey(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    table(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"), round(col("o_totalprice"), 2).as("max_price"))
      .orderBy(col("o_custkey"))
  }

  /** W2-class: tied-max kept together (rank, not row_number) — the
    * reference's FilterTiedEdges semantics (F3+A5). */
  def tiedMaxWindow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_quantity").desc)
    table(spark, dir, "lineitem")
      .withColumn("rk", rank().over(w))
      .filter(col("rk") === 1)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** O1/O3-class: global top-k with total tie-break order. */
  def topkOrderBy(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), round(col("l_extendedprice"), 2).as("price"))
      .orderBy(col("price").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(100)

  /** A6/A7-class: adjacency-list build via collect_list; rendered as a sorted
    * CSV string so the oracle compare is type-stable. */
  def adjacencyList(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(array_join(sort_array(collect_list(col("o_orderkey"))), ",").as("orderkeys"),
        count(lit(1)).as("degree"))
      .orderBy(col("o_custkey"))

  /** Calendar aggregation (scan-pushdown on a timestamp column). */
  def ordersByMonth(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .groupBy(to_date(date_trunc("month", col("o_orderdate"))).as("month"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("sum_price"))
      .orderBy(col("month"))

  /** Tumbling-window shaped batch aggregation over the events stream table —
    * the batch twin of the Structured Streaming query. */
  def eventsHourly(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 3).as("sum_value"))
      .orderBy(col("hour"), col("event_type"))

  /** A5-adjacent: exact interpolated percentiles of event values per type.
    * Spark's `percentile` is a single-pass typed aggregate (sorted digest
    * per group, partial-merge across partitions) — one shuffle on the
    * low-cardinality group key; all four quantiles share the one digest. */
  def valuePercentiles(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(percentile(col("value"),
        array(lit(0.25), lit(0.5), lit(0.9), lit(0.99))).as("p"))
      .select(col("event_type"),
        round(element_at(col("p"), 1), 6).as("p25"),
        round(element_at(col("p"), 2), 6).as("p50"),
        round(element_at(col("p"), 3), 6).as("p90"),
        round(element_at(col("p"), 4), 6).as("p99"))
      .orderBy(col("event_type"))

  /** W-class: 5-row trailing moving average per user — a sliding rows-frame
    * window ordered by (ts, event_id). Partition key is user_id (many small
    * partitions); the frame is O(1) per row. */
  def rollingAvg(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ts_ms"),
        col("value"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
      .rowsBetween(-4, Window.currentRow)
    ev.withColumn("avg5", round(avg(col("value")).over(w), 6))
      .select(col("user_id"), col("event_id"), col("ts_ms"), col("avg5"))
      .orderBy(col("user_id"), col("ts_ms"), col("event_id"))
  }

  /** Gap-based sessionization (30-min default): classic event-stream shape —
    * lag + cumulative-sum windows, then per-session aggregation. */
  def sessionize(spark: SparkSession, dir: String, gapMs: Long = 1800000L): DataFrame = {
    val ev = table(spark, dir, "events")
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ts_ms"))
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("new_sess",
        when(col("ts_ms") - lag(col("ts_ms"), 1).over(wOrd) > gapMs, 1).otherwise(0))
      .withColumn("session_idx", sum(col("new_sess")).over(wCum).cast("long") + 1)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("ts_ms")).as("start_ms"), max(col("ts_ms")).as("end_ms"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  /** Ordered-sequence funnel analysis — the product-analytics staple: how
    * deep into `steps` (strictly time-ordered, first qualifying event per
    * stage) each user gets. Stage k's anchor is the MIN event time of
    * step k strictly after stage k−1's anchor, so the result is a pure
    * function of the event set (no window-order tie ambiguity — min is
    * well-defined under any tie), which is what lets the oracle replay it
    * as a chain of min-aggregate subqueries.
    *
    * Scale shape: one filtered groupBy per stage, all keyed by user_id
    * (high-cardinality, map-side-combinable min) + user-keyed joins —
    * stages × 1 shuffles of user-shaped frames, never event-shaped
    * re-sorts. A window-sort formulation would shuffle and sort the full
    * event log once per user instead.
    *
    * @return (user_id, funnel_depth, step1_ms, step2_ms, ... nullable) */
  def funnel(spark: SparkSession, dir: String,
      steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(steps.nonEmpty)
    val ev = table(spark, dir, "events")
      .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("ts_ms"))
    val users = ev.select(col("user_id")).distinct()
    var acc = users
    var prev: Option[String] = None
    steps.zipWithIndex.foreach { case (step, i) =>
      val colName = s"step${i + 1}_ms"
      val candidates = ev.filter(col("event_type") === step)
      val anchored = prev match {
        case None => candidates
        case Some(p) =>
          candidates.join(acc.select(col("user_id"), col(p)), Seq("user_id"))
            .filter(col("ts_ms") > col(p))
      }
      val firsts = anchored.groupBy(col("user_id")).agg(min(col("ts_ms")).as(colName))
      acc = acc.join(firsts, Seq("user_id"), "left")
      prev = Some(colName)
    }
    val depth = steps.indices.foldLeft(lit(0)) { (d, i) =>
      when(col(s"step${i + 1}_ms").isNotNull, lit(i + 1)).otherwise(d)
    }
    acc.select(col("user_id") +: depth.as("funnel_depth") +:
      steps.indices.map(i => col(s"step${i + 1}_ms")): _*)
  }

  // ---------- vector / distance surface (embeddings table) ----------

  /** Embeddings with the float vector cast to ARRAY<DOUBLE>. */
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"), col("label"))

  /** E1-E4-class: distance expressions on all pairs of a bounded slice
    * (J3 cross-join shape with the upper-triangle filter F8). */
  def distancePairs(spark: SparkSession, dir: String): DataFrame = {
    val e = embeddings(spark, dir).filter(col("vec_id") < 30)
    val a = e.select(col("vec_id").as("id_a"), col("vec").as("va"))
    val b = e.select(col("vec_id").as("id_b"), col("vec").as("vb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(Distances.euclidean(col("va"), col("vb")), 6).as("euclidean"),
        round(Distances.manhattan(col("va"), col("vb")), 6).as("manhattan"),
        round(Distances.supremum(col("va"), col("vb")), 6).as("chebyshev"),
        round(Distances.cosineDistance(col("va"), col("vb")), 6).as("cosine_dist"),
        round(Distances.pearsonDistance(col("va"), col("vb")), 6).as("pearson_dist"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** W3-class: core distance as k-th smallest pairwise distance (k = minPts-1
    * neighbors, here 3) over a bounded slice — the oracle-checkable form of
    * the kernel's coreDistances. */
  def coreDistanceWindow(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val e = embeddings(spark, dir).filter(col("vec_id") < 200)
    val a = e.select(col("vec_id").as("id_a"), col("vec").as("va"))
    val b = e.select(col("vec_id").as("id_b"), col("vec").as("vb"))
    val w = Window.partitionBy(col("id_a")).orderBy(col("d"), col("id_b"))
    a.join(b, col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"), Distances.euclidean(col("va"), col("vb")).as("d"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === k)
      .select(col("id_a"), round(col("d"), 6).as("core_dist"))
      .orderBy(col("id_a"))
  }

  /** J1-class: broadcast argmin-distance assignment (point → nearest sample)
    * — the reference's FirstStep NN join, as crossJoin + window. */
  def argminAssign(spark: SparkSession, dir: String): DataFrame = {
    val e = embeddings(spark, dir)
    val points = e.filter(col("vec_id") >= 100 && col("vec_id") < 300)
      .select(col("vec_id").as("point_id"), col("vec").as("pv"))
    val samples = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("sample_id"), col("vec").as("sv"))
    val w = Window.partitionBy(col("point_id")).orderBy(col("d"), col("sample_id"))
    points.crossJoin(broadcast(samples))
      .select(col("point_id"), col("sample_id"), Distances.euclidean(col("pv"), col("sv")).as("d"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("point_id"), col("sample_id"), round(col("d"), 6).as("dist"))
      .orderBy(col("point_id"))
  }

  /** E6-class: mutual reachability = greatest(d, core_a, core_b) over the
    * bounded pairwise frame, joining the W3 core distances back in. */
  def mutualReachabilityPairs(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val e = embeddings(spark, dir).filter(col("vec_id") < 100)
    val a = e.select(col("vec_id").as("id_a"), col("vec").as("va"))
    val b = e.select(col("vec_id").as("id_b"), col("vec").as("vb"))
    val pairs = a.join(b, col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"), Distances.euclidean(col("va"), col("vb")).as("d"))
    val w = Window.partitionBy(col("id_a")).orderBy(col("d"), col("id_b"))
    val core = pairs.withColumn("rn", row_number().over(w)).filter(col("rn") === k)
      .select(col("id_a").as("cid"), col("d").as("core"))
    pairs.filter(col("id_a") < col("id_b"))
      .join(broadcast(core).withColumnRenamed("cid", "ca"), col("id_a") === col("ca"))
      .withColumnRenamed("core", "core_a")
      .join(broadcast(core).withColumnRenamed("cid", "cb"), col("id_b") === col("cb"))
      .withColumnRenamed("core", "core_b")
      .select(col("id_a"), col("id_b"),
        round(Distances.mutualReachability(col("d"), col("core_a"), col("core_b")), 6).as("mreach"))
      .orderBy(col("id_a"), col("id_b"))
  }
}
