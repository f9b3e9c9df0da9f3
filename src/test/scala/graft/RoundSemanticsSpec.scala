package graft

import org.apache.spark.sql.functions._

/** Pins the cross-engine round() contract (r10 verdict #5).
  *
  * Round 9 lost q_volatility to sum-order; round 10 to IEEE signed zero
  * (DuckDB's round preserves −0.0, Spark's BigDecimal HALF_UP cannot
  * represent it). This spec plants the exact r10 failure (−1 micro-unit
  * summed over 29 days → true value −3.45e-8) and asserts the normalized
  * output is bit-exactly +0.0, and pins the full q_round_semantics battery
  * to the DuckDB-verified expected values so the class can't reach the
  * driver gate again.
  */
class RoundSemanticsSpec extends SparkTestBase {

  private def bits(d: Double): Long = java.lang.Double.doubleToRawLongBits(d)

  test("Spark round never emits -0.0 (the r10 q_volatility cell)") {
    // the exact failing cell: srm = -1 micro-unit over n_days = 29
    val row = spark.range(1).select(
      round(lit(-1L) / lit(1000000.0) / lit(29L), 6).as("drift"),
      (round(lit(-1L) / lit(1000000.0) / lit(29L), 6) + lit(0.0)).as("drift_nz"))
      .head()
    assert(bits(row.getDouble(0)) == bits(0.0),
      "Spark round(-3.45e-8, 6) must be +0.0 (BigDecimal HALF_UP has no -0)")
    assert(bits(row.getDouble(1)) == bits(0.0))
  }

  test("+ 0.0 normalizes a raw -0.0 (the DuckDB-side recipe)") {
    val row = spark.range(1).select(
      lit(-0.0).as("raw"), (lit(-0.0) + lit(0.0)).as("nz")).head()
    assert(bits(row.getDouble(0)) == bits(-0.0), "literal -0.0 must survive")
    assert(bits(row.getDouble(1)) == bits(0.0), "-0.0 + 0.0 must be +0.0")
  }

  test("a planted negative-epsilon mean aggregate normalizes to +0.0") {
    // r10 verdict's asked-for shape: an aggregate whose true mean is -1e-9
    import spark.implicits._
    val df = Seq(-3L, 1L, 1L, 1L).toDF("micro") // sum = 0 micro... use -1
    val out = Seq(-1L).toDF("micro")
      .agg((round(sum(col("micro")) / lit(1000000.0) / lit(1000.0), 6)
        + lit(0.0)).as("mean6"))
      .head().getDouble(0)
    assert(bits(out) == bits(0.0))
    val out2 = df.agg((round(sum(col("micro")) * lit(-1e-12), 6) + lit(0.0)))
      .head().getDouble(0)
    assert(bits(out2) == bits(0.0))
  }

  test("q_round_semantics matches the DuckDB-verified battery") {
    // expected values verified against DuckDB 'SELECT round(x, scale) + 0.0'
    // on 2026-08-15 (see the oracleSql entry); any drift here means one of
    // the engines changed rounding semantics.
    val expected = Map(
      "t01_tie_pos_half" -> 3.0, "t02_tie_neg_half" -> -3.0,
      "t03_tie_pos_odd" -> 4.0, "t04_tie_neg_odd" -> -4.0,
      "t05_half_up" -> 1.0, "t06_half_dn" -> -1.0,
      "t07_exact_eighth" -> 0.13, "t08_exact_eighth_neg" -> -0.13,
      "t09_repr_above_tie" -> 2.68, "t10_tie_sc3" -> 1.001,
      "t11_tie_sc3b" -> 2.001, "t12_tie_sc3c" -> 0.001,
      "t13_plain" -> 12.35, "t14_plain_neg" -> -12.35,
      "t15_sc4" -> 0.1235, "t16_sc4_above" -> 0.1235,
      "t17_carry" -> 100.0, "t18_carry_neg" -> -100.0,
      "t19_zero_pos" -> 0.0, "t20_zero_neg" -> 0.0,
      "t21_below_tie" -> 0.0, "t22_above_tie" -> 1e-6,
      "t23_tie_sc6" -> 1e-6, "t24_tie_sc6_neg" -> -1e-6,
      "t25_zero4_neg" -> 0.0, "t26_noop" -> 123.456,
      "t27_noop_neg" -> -123.456, "t28_int" -> 7.0,
      "t29_sum_repr" -> 0.3, "t30_third" -> 0.333333,
      "t31_third_neg" -> -0.333333)
    val got = SparkEntry.queries("q_round_semantics")(spark, sf())
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (k, v) =>
      assert(bits(got(k)) == bits(v), s"$k: got ${got(k)}, want $v (bit-exact)")
    }
  }
}
