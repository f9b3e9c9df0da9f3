package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PcaSpec extends SparkTestBase {

  test("topComponent recovers a planted dominant direction") {
    import spark.implicits._
    // points spread along e0 with tiny noise on e1/e2: the top PC must be
    // ±e0 and var_explained ≈ 1
    val rows = (0 until 200).map { i =>
      val t = (i - 100) / 10.0
      Array(t, (i % 3 - 1) * 0.01, (i % 5 - 2) * 0.01)
    }
    val df = rows.toDF("vec")
    val pc = Pca.topComponent(spark, df, d = 3).orderBy("dim").collect()
    assert(pc.length == 3)
    val loadings = pc.map(_.getDouble(1))
    assert(math.abs(math.abs(loadings(0)) - 1.0) < 1e-3)
    assert(math.abs(loadings(1)) < 0.01 && math.abs(loadings(2)) < 0.01)
    val ve = pc(0).getDouble(3)
    assert(ve > 0.999)
    // eigenvalue ≈ population variance of the planted axis
    val xs = rows.map(_(0))
    val mean = xs.sum / xs.length
    val popVar = xs.map(x => (x - mean) * (x - mean)).sum / xs.length
    assert(math.abs(pc(0).getDouble(2) - popVar) / popVar < 1e-3)
  }

  test("moment aggregator is partition-order invariant at 6dp") {
    import spark.implicits._
    val rows = (0 until 500).map(i =>
      Array(math.sin(i * 0.7), math.cos(i * 1.3), math.sin(i * 2.1) * 0.5))
    val one = Pca.topComponent(spark, rows.toDF("vec").coalesce(1), d = 3)
      .orderBy("dim").collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    val many = Pca.topComponent(spark, rows.toDF("vec").repartition(13), d = 3)
      .orderBy("dim").collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    assert(one.toSeq == many.toSeq)
  }

  test("dimension mismatch fails loudly") {
    import spark.implicits._
    val bad = Seq(Array(1.0, 2.0), Array(1.0, 2.0, 3.0)).toDF("vec")
    val ex = intercept[Exception] {
      Pca.topComponent(spark, bad, d = 2).collect()
    }
    assert(ex.getMessage != null)
  }
}
