package graft.operators

import org.apache.spark.sql.functions._

class SamplingSpec extends graft.SparkTestBase {

  test("sampleByKeyExact: per-stratum size is exactly ceil(f*n) and rows are a subset") {
    import spark.implicits._
    val df = (1 to 997).map(i => (i.toLong, Seq("A", "N", "R")(i % 3))).toDF("id", "k")
    val fractions = Map("A" -> 0.1, "N" -> 0.05, "R" -> 0.37)
    val base = df.groupBy("k").count().as[(String, Long)].collect().toMap
    val got = Sampling.sampleByKeyExact(df, "k", fractions, seed = 7L).persist()
    val counts = got.groupBy("k").count().as[(String, Long)].collect().toMap
    fractions.foreach { case (k, f) =>
      assert(counts(k) == math.ceil(f * base(k)).toLong,
        s"stratum $k: got ${counts(k)}, want ceil($f*${base(k)})")
    }
    // subset: every sampled id exists in the input, no duplicates
    val ids = got.select("id").as[Long].collect()
    assert(ids.distinct.length == ids.length)
    assert(ids.forall(i => i >= 1 && i <= 997))
    got.unpersist()
  }

  test("weightedSample: deterministic, parallelism-invariant, weight-biased") {
    import spark.implicits._
    // two weight classes: heavy rows (w=500) vs light rows (w=5)
    val df = (1L to 2000L).map(i => (i, if (i <= 200) 500L else 5L))
      .toDF("id", "w")
    val sel1 = Sampling.weightedSample(df, "id", "w", k = 150, seed = 9L)
      .select("id").as[Long].collect().sorted
    val sel2 = Sampling.weightedSample(df.repartition(13), "id", "w", k = 150, seed = 9L)
      .select("id").as[Long].collect().sorted
    assert(sel1.sameElements(sel2), "selection must not depend on partitioning")
    assert(sel1.length == 150 && sel1.distinct.length == 150)
    // with w-ratio 100:1 and 200 heavy rows, the heavy class dominates the
    // sample: expected heavy share ~97%; require a loose majority bound
    val heavy = sel1.count(_ <= 200)
    assert(heavy > 100, s"heavy rows underrepresented: $heavy/150")
    // E-S reference check: replay ln(u)/w locally and compare top-k sets
    val ref = (1L to 2000L).map { i =>
      val w = if (i <= 200) 500L else 5L
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:9".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val u = java.lang.Long.parseLong(hex.take(13), 16).toDouble / 4503599627370496.0
      (i, math.log(u) / w)
    }.sortBy { case (i, k) => (-k, i) }.take(150).map(_._1).sorted
    assert(sel1.sameElements(ref))
  }

  test("weightedSample: zero/negative weights are excluded") {
    import spark.implicits._
    val df = Seq((1L, 10L), (2L, 0L), (3L, -4L), (4L, 10L)).toDF("id", "w")
    val sel = Sampling.weightedSample(df, "id", "w", k = 10)
      .select("id").as[Long].collect().sorted
    assert(sel.sameElements(Array(1L, 4L)))
  }

  test("weightedSample: selection-boundary gap dwarfs ln() ulp noise on every SF corpus") {
    // the oracle hash-matches the SELECTED SET across engines; the only
    // float risk is ln() differing in the last ulp between libms at the
    // k-th/(k+1)-th boundary. Assert the actual gap is astronomically
    // larger than ulp (~1e-16 relative) at the gate corpora.
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val docs = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
      val u = conv(substring(md5(concat(col("doc_id").cast("string"), lit(":42"))), 1, 13), 16, 10)
        .cast("double") / lit(4503599627370496.0)
      val keys = docs.filter(col("n_chars") > 0)
        .select((log(u) / col("n_chars")).as("k"))
        .orderBy(col("k").desc).limit(101)
        .collect().map(_.getDouble(0))
      val gap = math.abs(keys(99) - keys(100))
      val scale = math.max(math.abs(keys(99)), math.abs(keys(100)))
      assert(gap / scale > 1e-9, s"$sf boundary gap ${gap / scale} too tight")
    }
  }

  test("sampleByKeyExact: sizes hold at a different partitioning (the oracle contract)") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toLong, if (i % 5 == 0) "x" else "y")).toDF("id", "k")
    val fractions = Map("x" -> 0.5, "y" -> 0.25)
    for (parts <- Seq(1, 7)) {
      val counts = Sampling.sampleByKeyExact(df.repartition(parts), "k", fractions, seed = 3L)
        .groupBy("k").count().as[(String, Long)].collect().toMap
      assert(counts("x") == 50 && counts("y") == 100, s"parts=$parts: $counts")
    }
  }
}
