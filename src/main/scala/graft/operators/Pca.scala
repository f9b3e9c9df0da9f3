package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed principal-component extraction by power iteration — the
  * embedding-analytics staple (dominant direction of a vector corpus:
  * drift detection, whitening, IVF coarse axes). The reference has no
  * vector-analytics surface at all; this is pure extension.
  *
  * Scale shape: ONE pass over the data computes the full second-moment
  * summary through [[MomentAggregator]] — a typed Aggregator whose buffer
  * is `[n, Σx (d), Σxxᵀ upper-tri (d(d+1)/2)]`, 2 145 doubles at d = 64
  * (≈17 KB). Partials map-side combine, so the shuffle moves one buffer
  * per task, never per row; at 100 TB the job is scan-bound. Everything
  * after is O(d²) DRIVER arithmetic on the 64×64 covariance (a
  * metadata-bounded, tagged collect of ONE row — same contract as the CF
  * summaries): `iters` fixed-count power iterations from the
  * deterministic 1/√d start vector. A fixed iteration count (not a
  * convergence test) is deliberate: the DuckDB oracle unrolls the SAME
  * iterations, so engine and oracle agree bit-for-bit-at-6dp regardless
  * of the eigengap.
  */
object Pca {

  /** One-pass (n, Σx, upper-tri Σxxᵀ) moment summary. Buffer layout:
    * [0] = n, [1..d] = Σx, then row-major upper triangle of Σxxᵀ.
    * Merge is element-wise add — associative/commutative, so partition
    * order can't change the algebra (only last-ulp fp noise, absorbed by
    * the 6dp output rounding). */
  final class MomentAggregator(d: Int)
      extends Aggregator[Array[Double], Array[Double], Array[Double]] {
    private val len = 1 + d + d * (d + 1) / 2
    override def zero: Array[Double] = new Array[Double](len)
    override def reduce(b: Array[Double], x: Array[Double]): Array[Double] = {
      require(x.length == d, s"MomentAggregator: expected dim $d, got ${x.length}")
      b(0) += 1.0
      var i = 0
      var t = 1 + d
      while (i < d) {
        b(1 + i) += x(i)
        var j = i
        while (j < d) {
          b(t) += x(i) * x(j)
          t += 1
          j += 1
        }
        i += 1
      }
      b
    }
    override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      var i = 0
      while (i < len) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(r: Array[Double]): Array[Double] = r
    override def bufferEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    override def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  /** Top principal component of `vecs` (one ARRAY<DOUBLE> column `vec` of
    * uniform dimension `d`): rows `(dim, loading, eigenvalue,
    * var_explained)`, loadings the unit eigenvector after exactly `iters`
    * power iterations of the covariance from v₀ = 1/√d, eigenvalue the
    * final pre-normalization norm ‖Cv‖, var_explained its share of
    * trace(C). */
  def topComponent(spark: SparkSession, vecs: DataFrame, d: Int,
      iters: Int = 15, scale: Int = 6): DataFrame = {
    import spark.implicits._
    val agg = new MomentAggregator(d).toColumn
    val ds = vecs.select(col("vec")).as[Array[Double]]
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    val m = try {
      sc.setJobDescription(graft.hdbscan.Hdbscan.BoundedCollectTag)
      ds.select(agg).head() // ONE row: the 1+d+d(d+1)/2 moment buffer
    } finally sc.setJobDescription(prev)
    val n = m(0)
    require(n > 1, s"Pca.topComponent: need at least 2 rows, got $n")
    // covariance C(i,j) = Σxᵢxⱼ/n − μᵢμⱼ (population normalization, the
    // same formula the oracle replays)
    val mu = Array.tabulate(d)(i => m(1 + i) / n)
    val c = Array.ofDim[Double](d, d)
    var t = 1 + d
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val v = m(t) / n - mu(i) * mu(j)
        c(i)(j) = v
        c(j)(i) = v
        t += 1
        j += 1
      }
      i += 1
    }
    var trace = 0.0
    i = 0
    while (i < d) { trace += c(i)(i); i += 1 }
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var lambda = 0.0
    var it = 0
    while (it < iters) {
      val w = new Array[Double](d)
      i = 0
      while (i < d) {
        var s = 0.0
        var j = 0
        while (j < d) { s += c(i)(j) * v(j); j += 1 }
        w(i) = s
        i += 1
      }
      var nrm = 0.0
      i = 0
      while (i < d) { nrm += w(i) * w(i); i += 1 }
      lambda = math.sqrt(nrm)
      i = 0
      while (i < d) { w(i) /= lambda; i += 1 }
      v = w
      it += 1
    }
    v.zipWithIndex.map { case (x, dim) => (dim, x, lambda, lambda / trace) }
      .toSeq.toDF("dim", "loading_raw", "eigenvalue_raw", "ve_raw")
      .select(col("dim"),
        // + 0.0 normalizes IEEE −0.0 after the round: eigenvector
        // components can approach 0 from below, and DuckDB's round
        // preserves the sign bit while Spark's cannot (q_volatility r10)
        (round(col("loading_raw"), scale) + lit(0.0)).as("loading"),
        round(col("eigenvalue_raw"), scale).as("eigenvalue"),
        round(col("ve_raw"), scale).as("var_explained"))
  }
}
