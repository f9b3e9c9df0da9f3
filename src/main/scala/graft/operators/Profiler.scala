package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-pass data-quality profiling and rule checking — the Deequ/dbt-test
  * capability a 100 TB ingest pipeline runs before anything else touches the
  * data (the reference has no data-quality surface at all; its loader trusts
  * every line of the input text — `DataProcessing.java:31`).
  *
  * Scale contract: EVERY metric for EVERY column comes out of ONE Aggregate
  * over the table — no per-column jobs, no driver loops; the result frame is
  * O(columns × metrics) rows. The only caveat is exact `distinct`, which
  * Catalyst plans through an Expand (input ×(k+1) for k distinct aggregates)
  * — still one shuffle, and the documented swap at extreme scale is
  * `approx_count_distinct` (the q_count_distinct_approx HLL path) which
  * removes the Expand entirely.
  */
object Profiler {

  /** Long-form profile (column, metric, value): completeness, exact
    * distinct, min/max/mean/stddev for numeric columns; completeness,
    * exact distinct, length stats for string columns. Values are rounded
    * to 6 decimals so the frame is hash-stable across partitionings.
    *
    * Numeric contract: every value is quantized to 1e-6 units PER ROW
    * (`round(v * 1e6)` into BIGINT) before the moment sums — mean/stddev
    * are therefore the exact moments of the QUANTIZED values (bias vs the
    * unquantized mean ≤ 5e-7, invisible at the 6-dp output round for
    * ≤6-dp inputs), not of the raw doubles. The quantization itself
    * requires |value| ≤ ~9.2e12 (micro-units must fit BIGINT); the limb
    * decomposition below then keeps every per-row sum addend < ~1e6, so
    * the BIGINT moment sums are exact to ~9.2e12 rows per aggregation for
    * |value| ≤ ~9e5 (and n ≤ ~9.2e18/(|value|·1e6) beyond that). */
  def profile(df: DataFrame, numericCols: Seq[String], stringCols: Seq[String]): DataFrame = {
    // mean/stddev from EXACT micro-unit integer moments: avg()/stddev()
    // merge double partials in partition order, which flips the 6-dp
    // round order-dependently (the q_volatility hazard class). The square
    // Σvm² would overflow BIGINT, so vm splits into base-1e6 limbs
    // (vm = a·1e6 + b) and the moment folds over the three limb products
    // a², ab, b² — and because those PRODUCTS reach ~1e12 per row (b² up
    // to (1e6)²), summing them directly would wrap BIGINT at ~9.2e6 rows:
    // each product therefore splits AGAIN into base-1e6 limbs
    // (x = hi·1e12 + mid·1e6 + lo, all three < 1e6 per row except the
    // tiny hi), giving nine plain long sums per column whose addends stay
    // < 1e6 — exact to ~9.2e12 rows — reconstructed once in double in the
    // same IEEE order as the mirrored oracle SQL. All limb arithmetic is
    // precomputed in this projection: the exact-distinct Expand (×k+1)
    // replicates every regular-agg input per branch, so heavy expression
    // trees under the sums cost k+1× the scan — plain column refs don't
    // (measured 7.9 s → 2.1 s at sf0.1; the DECIMAL(38,0) accumulator
    // these replace was no better).
    def productLimbs(x: Column, tag: String, c: String): Seq[Column] = {
      val lo = pmod(x, lit(1000000L))
      val rest = ((x - lo) / lit(1000000L)).cast("long") // exact multiple
      val mid = pmod(rest, lit(1000000L))
      val hi = ((rest - mid) / lit(1000000L)).cast("long")
      Seq(hi.as(s"__${tag}hi_$c"), mid.as(s"__${tag}mid_$c"), lo.as(s"__${tag}lo_$c"))
    }
    val prepared = df.select((numericCols ++ stringCols).map(col) ++
      numericCols.flatMap { c =>
        val vm = round(col(c) * lit(1000000.0)).cast("long")
        val b = pmod(vm, lit(1000000L)) // nonneg limb, negatives included
        val a = ((vm - b) / lit(1000000L)).cast("long") // exact: vm−b is a multiple
        Seq(a.as(s"__a_$c"), b.as(s"__b_$c")) ++
          productLimbs(a * a, "aa", c) ++ productLimbs(a * b, "ab", c) ++
          productLimbs(b * b, "bb", c)
      } ++ stringCols.map(c => length(col(c)).as(s"__len_$c")): _*)
    // TWO single-row aggregates, cross-joined: the exact-distinct pass
    // (whose Expand multiplies the scan ×(k+1) — it gets ONLY the distinct
    // counters) and the plain moments pass (counts/min/max/integer moment
    // sums — no Expand). Folding the moment sums into the distinct
    // aggregate costs the Expand factor on every one of them (measured
    // 2.1× the whole profile at sf0.1); two thin passes are cheaper than
    // one ×(k+1)-amplified pass, and the frame stays O(cols × metrics).
    val n = count(lit(1))
    def metricsFor(c: String, numeric: Boolean): Seq[(String, Column, Boolean)] = {
      val col_ = col(c)
      val base = Seq(
        ("completeness", count(col_).cast("double") / n.cast("double"), false),
        ("distinct", count_distinct(col_).cast("double"), true))
      val nD = count(col_).cast("double")
      val la = col(s"__a_$c"); val lb = col(s"__b_$c")
      val sxD = sum(la).cast("double") * lit(1.0e6) + sum(lb).cast("double")
      // reconstruct each split product sum in double (exact limb sums);
      // the oracle SQL mirrors this expression tree token for token
      def m(tag: String): Column =
        sum(col(s"__${tag}hi_$c")).cast("double") * lit(1.0e12) +
          sum(col(s"__${tag}mid_$c")).cast("double") * lit(1.0e6) +
          sum(col(s"__${tag}lo_$c")).cast("double")
      val sxxD = m("aa") * lit(1.0e12) + m("ab") * lit(2.0e6) + m("bb")
      val typed =
        if (numeric) Seq(
          ("min", min(col_).cast("double"), false),
          ("max", max(col_).cast("double"), false),
          ("mean", sxD / lit(1000000.0) / nD, false),
          ("stddev", sqrt((nD * sxxD - sxD * sxD) / (nD * (nD - lit(1.0))))
            / lit(1000000.0), false))
        else Seq(
          ("min_length", min(col(s"__len_$c")).cast("double"), false),
          ("max_length", max(col(s"__len_$c")).cast("double"), false),
          ("avg_length", avg(col(s"__len_$c")), false))
      (base ++ typed).map { case (m, e, d) => (s"$c/$m", e, d) }
    }
    val all = numericCols.map(c => metricsFor(c, numeric = true)) ++
      stringCols.map(c => metricsFor(c, numeric = false))
    val flat = all.flatten.map { case (k, e, _) => (k, e) }
    val (distinctAggs, plainAggs) = all.flatten.partition(_._3)
    def onerow(aggs: Seq[(String, Column, Boolean)]) =
      prepared.agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (k, e, _) => e.as(k) }: _*)
    val aggd = onerow(plainAggs).crossJoin(onerow(distinctAggs))
    // unpivot the single wide row to (column, metric, value) long form
    val stacked = flat.map { case (k, _) =>
      val Array(c, m) = k.split("/", 2)
      // col_name, not `column`: the frame must replay verbatim in ANSI
      // SQL engines where COLUMN is reserved
      struct(lit(c).as("col_name"), lit(m).as("metric"),
        round(col(k), 6).as("value"))
    }
    aggd.select(explode(array(stacked: _*)).as("r"))
      .select(col("r.col_name").as("col_name"), col("r.metric").as("metric"),
        col("r.value").as("value"))
      .orderBy(col("col_name"), col("metric"))
  }

  /** A named expectation over a table: `violated` marks the failing rows. */
  final case class Rule(name: String, violated: Column)

  /** Rule compliance in one pass: each rule contributes one conditional
    * count to a single global Aggregate. Null predicate results count as
    * violations (a rule that cannot evaluate has not passed). Uniqueness
    * checks ride the same pass as `count − count_distinct` rules via
    * [[uniqueRule]]. Output: (rule, violations, total, pass). */
  def expectations(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val aggs = rules.map(r =>
      sum(when(coalesce(r.violated, lit(true)), 1L).otherwise(0L)).as(r.name)) :+
      count(lit(1)).as("__total")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = rules.map(r =>
      struct(lit(r.name).as("rule"), col(r.name).as("violations"),
        col("__total").as("total")))
    wide.select(explode(array(stacked: _*)).as("r"))
      .select(col("r.rule").as("rule"), col("r.violations").as("violations"),
        col("r.total").as("total"),
        (col("r.violations") === 0L).as("pass"))
      .orderBy(col("rule"))
  }

  /** Key-uniqueness as a one-row frame joinable beside [[expectations]]
    * output: violations = n − distinct(keys), computed in the same scan
    * shape (one Aggregate). */
  def uniqueRule(df: DataFrame, name: String, keys: Seq[String]): DataFrame = {
    val keyCol = struct(keys.map(col): _*)
    df.agg((count(lit(1)) - count_distinct(keyCol)).as("violations"),
      count(lit(1)).as("total"))
      .select(lit(name).as("rule"), col("violations"), col("total"),
        (col("violations") === 0L).as("pass"))
  }
}
