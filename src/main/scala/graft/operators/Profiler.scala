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
    * to 6 decimals so the frame is hash-stable across partitionings. */
  def profile(df: DataFrame, numericCols: Seq[String], stringCols: Seq[String]): DataFrame = {
    val n = count(lit(1))
    def metricsFor(c: String, numeric: Boolean): Seq[(String, Column)] = {
      val col_ = col(c)
      val base = Seq(
        "completeness" -> count(col_).cast("double") / n.cast("double"),
        "distinct" -> count_distinct(col_).cast("double"))
      // mean/stddev from EXACT micro-unit integer moments (DECIMAL(38,0)
      // sums — overflow-safe at any SF), evaluated once in double: avg()/
      // stddev() merge double partials in partition order, which flips
      // the 6-dp round order-dependently (the q_volatility hazard class)
      val vm = round(col_ * lit(1000000.0)).cast("long")
      val nD = count(col_).cast("double")
      val sxD = sum(vm.cast("decimal(38,0)")).cast("double")
      val sxxD = sum(vm.cast("decimal(38,0)") * vm).cast("double")
      val typed =
        if (numeric) Seq(
          "min" -> min(col_).cast("double"),
          "max" -> max(col_).cast("double"),
          "mean" -> sxD / lit(1000000.0) / nD,
          "stddev" -> sqrt((nD * sxxD - sxD * sxD) / (nD * (nD - lit(1.0))))
            / lit(1000000.0))
        else Seq(
          "min_length" -> min(length(col_)).cast("double"),
          "max_length" -> max(length(col_)).cast("double"),
          "avg_length" -> avg(length(col_)))
      (base ++ typed).map { case (m, e) => (s"$c/$m", e) }
    }
    val all = numericCols.map(c => metricsFor(c, numeric = true)) ++
      stringCols.map(c => metricsFor(c, numeric = false))
    val flat = all.flatten
    val aggd = df.agg(flat.head._2.as(flat.head._1), flat.tail.map { case (k, e) => e.as(k) }: _*)
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
