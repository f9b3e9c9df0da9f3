package graft.operators

import org.apache.spark.sql.functions._

class ClassifierSpec extends graft.SparkTestBase {

  test("solve inverts a known linear system") {
    val a = Array(Array(4.0, 1.0), Array(1.0, 3.0))
    val w = Classifier.solve(a.map(_.clone()), Array(9.0, 7.0))
    // 4x + y = 9, x + 3y = 7 → x = 20/11, y = 19/11
    assert(math.abs(w(0) - 20.0 / 11) < 1e-9 && math.abs(w(1) - 19.0 / 11) < 1e-9)
  }

  test("ridge probe + refine separates deterministic linear data") {
    import spark.implicits._
    // y = 1 iff 2*x0 - x1 > 0.3, features in [0,1], grid data (no RNG)
    val rows = for (i <- 0 until 40; j <- 0 until 40) yield {
      val x0 = i / 39.0; val x1 = j / 39.0
      (Array(x0, x1, 1.0), if (2 * x0 - x1 > 0.3) 1 else 0)
    }
    val df = rows.toDF("x", "y")
    def accOf(w: Array[Double]): Double =
      df.select(((Classifier.score(col("x"), w) >= 0.5).cast("int") === col("y"))
          .cast("double").as("ok"))
        .agg(avg(col("ok"))).head().getDouble(0)
    val w0 = Classifier.ridgeProbe(df)
    val w = Classifier.logisticRefine(df, w0, iters = 5)
    val (acc0, acc) = (accOf(w0), accOf(w))
    // both the one-pass closed-form fit and the polished model separate
    // the grid (GD optimizes logistic loss, not 0-1 accuracy, so strict
    // monotonicity in accuracy is not a theorem and not asserted)
    assert(acc0 >= 0.95, s"probe accuracy $acc0")
    assert(acc >= 0.95, s"refined accuracy $acc")
    // determinism: the whole fit is aggregate-based, no RNG
    val w2 = Classifier.logisticRefine(df, Classifier.ridgeProbe(df), iters = 5)
    assert(w.toSeq === w2.toSeq)
  }

  test("quality classifier hits accuracy 1.0 and spam recall 1.0 on every SF corpus") {
    for (d <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val out = graft.SparkEntry.queries("q_quality_classifier")(spark, sf(d)).head()
      assert(out.getBoolean(2), s"$d: holdout accuracy below 0.9")
      assert(out.getBoolean(3), s"$d: spam recall below 0.9")
    }
  }
}
