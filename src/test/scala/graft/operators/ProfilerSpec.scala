package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ProfilerSpec extends SparkTestBase {

  private def sample = {
    import spark.implicits._
    Seq(
      (1L, Some(2.0), "a"),
      (2L, Some(4.0), "bb"),
      (3L, None, "a"),
      (4L, Some(6.0), null)
    ).toDF("id", "x", "s")
  }

  test("profile: one-pass metrics match hand computation (nulls excluded)") {
    val m = Profiler.profile(sample, numericCols = Seq("x"), stringCols = Seq("s"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(m(("x", "completeness")) == 0.75)
    assert(m(("x", "distinct")) == 3.0)
    assert(m(("x", "min")) == 2.0 && m(("x", "max")) == 6.0)
    assert(m(("x", "mean")) == 4.0)
    assert(m(("x", "stddev")) == 2.0) // sample stddev of {2,4,6}
    assert(m(("s", "completeness")) == 0.75)
    assert(m(("s", "distinct")) == 2.0)
    assert(m(("s", "min_length")) == 1.0 && m(("s", "max_length")) == 2.0)
  }

  test("profile: split-limb moments are exact on negatives and mixed signs") {
    // the base-1e6 limb decomposition (vm = a·1e6 + b with b = pmod ≥ 0)
    // must reproduce textbook mean/stddev for NEGATIVE values too — the
    // subtle path: a goes negative while b stays in [0, 1e6)
    import spark.implicits._
    val vals = Seq(-3.5, -1.25, 0.0, 2.75, 7.0)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "x")
    val m = Profiler.profile(df, numericCols = Seq("x"), stringCols = Nil)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val mean = vals.sum / vals.size
    val sd = math.sqrt(vals.map(v => (v - mean) * (v - mean)).sum / (vals.size - 1))
    // profile rounds values at 6 dp — compare within that granularity
    assert(math.abs(m(("x", "mean")) - mean) < 1e-6, s"mean ${m(("x", "mean"))} vs $mean")
    assert(math.abs(m(("x", "stddev")) - sd) < 1e-6, s"stddev ${m(("x", "stddev"))} vs $sd")
    assert(m(("x", "min")) == -3.5 && m(("x", "max")) == 7.0)
  }

  test("profile: moment sums survive the old BIGINT wrap point (7M max-limb rows)") {
    // regression for the r10 ADVICE overflow: with vm = k·1e6 + 999999 the
    // low limb b = 999999, so the PRE-split Σb² ≈ 1e12/row wrapped a plain
    // long sum at ~9.2e6 rows and silently corrupted stddev. 7M rows of
    // b² ≈ 1e12 puts Σb² ≈ 7e18 within 2^63 only barely — combined with
    // Σ(ab) ≈ 7e6·k·1e6·999999 (up to ~4e19) the old single-sum layout is
    // guaranteed to wrap; the base-1e6 product limbs must stay exact.
    val n = 7000000L
    val df = spark.range(n).select(
      ((col("id") % 7).cast("double") + lit(0.999999)).as("x"))
    val m = Profiler.profile(df, numericCols = Seq("x"), stringCols = Nil)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    // exact replay of the quantized-moment formula with BigInt sums
    val perK = n / 7
    val vms = (0L to 6L).map(k => k * 1000000L + 999999L)
    val sx = vms.map(v => BigInt(v) * perK).sum
    val sxx = vms.map(v => BigInt(v) * v * perK).sum
    val nD = BigDecimal(n); val sxD = BigDecimal(sx); val sxxD = BigDecimal(sxx)
    val sd = math.sqrt(((nD * sxxD - sxD * sxD) /
      (nD * (nD - 1))).toDouble) / 1000000.0
    val mean = (sxD / nD).toDouble / 1000000.0
    assert(!m(("x", "stddev")).isNaN, "stddev is NaN — a moment sum wrapped")
    assert(math.abs(m(("x", "stddev")) - sd) < 1e-6,
      s"stddev ${m(("x", "stddev"))} vs exact $sd")
    assert(math.abs(m(("x", "mean")) - mean) < 1e-6)
  }

  test("profile job count is independent of column count (no per-column fan-out)") {
    def jobsFor(numeric: Seq[String], string: Seq[String]): Int = {
      val counted = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          counted.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        Profiler.profile(sample, numeric, string).collect()
        org.apache.spark.sql.GraftShim.drainListenerBus(spark)
        counted.get()
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    val one = jobsFor(Seq("x"), Nil)
    val three = jobsFor(Seq("id", "x"), Seq("s"))
    assert(three == one,
      s"3-column profile ran $three jobs vs $one for 1 column — per-column fan-out")
  }

  test("expectations: violation counts, null predicates count as violations") {
    import spark.implicits._
    val df = Seq((1.0, "ok"), (2.0, "ok"), (-1.0, null)).toDF("v", "tag")
    val out = Profiler.expectations(df, Seq(
      Profiler.Rule("v_positive", col("v") <= 0.0),
      Profiler.Rule("tag_ok", col("tag") =!= "ok") // null tag → violation
    )).collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(out("v_positive") == ((1L, 3L, false)))
    assert(out("tag_ok") == ((1L, 3L, false)))
  }

  test("uniqueRule: composite-key duplicates counted") {
    import spark.implicits._
    val df = Seq((1, 1), (1, 1), (1, 2), (2, 1)).toDF("a", "b")
    val r = Profiler.uniqueRule(df, "ab_unique", Seq("a", "b")).collect()(0)
    assert(r.getString(0) == "ab_unique")
    assert(r.getLong(1) == 1L && r.getLong(2) == 4L && !r.getBoolean(3))
  }
}
