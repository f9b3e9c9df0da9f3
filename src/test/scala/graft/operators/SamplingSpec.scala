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
