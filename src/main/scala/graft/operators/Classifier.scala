package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the classifier stage of web-corpus
  * pipelines (GPT-3 appendix A, LLaMA: score every document with a small
  * model trained to tell curated text from raw crawl, keep high scorers).
  *
  * Training runs as DataFrame AGGREGATIONS, never a driver loop over rows:
  *
  *  - [[ridgeProbe]] is the one-pass closed-form fit: one aggregate job
  *    computes the d×d Gram matrix Xᵀ X and moment vector Xᵀ y as
  *    d(d+3)/2 map-side-combinable sums, the driver solves the d×d ridge
  *    system. ONE scan of 100 TB, driver state O(d²) — for the ~7 cheap
  *    text features of a quality filter this is the whole cost.
  *  - [[logisticRefine]] polishes the probe under true logistic loss:
  *    each iteration is ONE aggregate computing the gradient's d sums
  *    with the current weights riding the plan as literals. Iterations
  *    are O(1)-few because the probe already starts near the optimum.
  *
  * Both are deterministic (no sampling, no init randomness), so a seeded
  * pipeline re-trains to bit-identical weights — the property that lets
  * q_quality_classifier pin holdout accuracy on the oracle gate.
  */
object Classifier {

  /** Solve A·w = b in place (Gaussian elimination, partial pivoting).
    * d is tiny (feature count), so this is driver arithmetic. */
  private[operators] def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val d = b.length
    val m = Array.tabulate(d)(i => a(i) :+ b(i))
    for (col0 <- 0 until d) {
      var p = col0
      for (r <- col0 + 1 until d) if (math.abs(m(r)(col0)) > math.abs(m(p)(col0))) p = r
      val t = m(p); m(p) = m(col0); m(col0) = t
      val piv = m(col0)(col0)
      require(math.abs(piv) > 1e-12, "singular system — raise lambda")
      for (r <- 0 until d if r != col0) {
        val f = m(r)(col0) / piv
        for (c <- col0 to d) m(r)(c) -= f * m(col0)(c)
      }
    }
    Array.tabulate(d)(i => m(i)(d) / m(i)(i))
  }

  /** One-pass ridge regression of y ∈ {0,1} (mapped to ±1) on the feature
    * array column: w = (XᵀX + λI)⁻¹ Xᵀy. The feature array must carry its
    * bias term (append 1.0) and have fixed length d. */
  def ridgeProbe(data: DataFrame, featCol: String = "x", labelCol: String = "y",
      lambda: Double = 1e-3): Array[Double] = {
    val d = data.select(size(col(featCol))).head().getInt(0)
    val yy = (col(labelCol).cast("double") * 2.0) - 1.0
    val sums =
      (for (j <- 0 until d; k <- j until d)
        yield sum(col(featCol)(j) * col(featCol)(k)).as(s"g_${j}_$k")) ++
      (0 until d).map(j => sum(col(featCol)(j) * yy).as(s"m_$j"))
    val row = data.agg(sums.head, sums.tail: _*).head()
    val gram = Array.ofDim[Double](d, d)
    var idx = 0
    for (j <- 0 until d; k <- j until d) {
      gram(j)(k) = row.getDouble(idx); gram(k)(j) = gram(j)(k); idx += 1
    }
    for (j <- 0 until d) gram(j)(j) += lambda
    val mom = Array.tabulate(d)(j => row.getDouble(idx + j))
    solve(gram, mom)
  }

  /** Gradient-descent refinement under logistic loss from a starting
    * weight vector: per iteration one aggregate of the d gradient sums
    * (weights as literals in the plan — zero extra driver state). */
  def logisticRefine(data: DataFrame, w0: Array[Double], iters: Int = 5,
      lr: Double = 0.5, featCol: String = "x", labelCol: String = "y"): Array[Double] = {
    var w = w0.clone()
    val n = data.count().toDouble.max(1.0)
    for (_ <- 0 until iters) {
      val margin = dotLit(col(featCol), w)
      val p = lit(1.0) / (lit(1.0) + exp(-margin))
      val err = p - col(labelCol).cast("double")
      val grads = w.indices.map(j => sum(err * col(featCol)(j)).as(s"g_$j"))
      val row = data.agg(grads.head, grads.tail: _*).head()
      w = w.indices.map(j => w(j) - lr * row.getDouble(j) / n).toArray
    }
    w
  }

  /** w·x with driver-side weights as plan literals. */
  def dotLit(x: Column, w: Array[Double]): Column =
    w.zipWithIndex.map { case (wj, j) => x(j) * lit(wj) }
      .reduce(_ + _)

  /** Classifier score in (0, 1): sigmoid(w·x). */
  def score(x: Column, w: Array[Double]): Column =
    lit(1.0) / (lit(1.0) + exp(-dotLit(x, w)))
}
