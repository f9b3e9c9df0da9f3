package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Cluster-feature vector of a data bubble: (n, LS, SS) — the mergeable
  * sketch at the heart of MR-HDBSCAN*'s compression step.
  * Reference semantics: `mappers/CombineStep.java:18-64` (live merge),
  * `datastructure/ClusterFeatureDataBubbles.java` (bean form). Unlike the
  * reference's reduce (which is merge-order-sensitive, SURVEY §3.3), this is
  * a proper commutative/associative `Aggregator` with map-side partial
  * aggregation.
  */
final case class CF(n: Long, ls: Array[Double], ss: Array[Double]) {
  def merge(o: CF): CF =
    if (n == 0) o
    else if (o.n == 0) this
    else {
      val l = new Array[Double](ls.length); val s = new Array[Double](ss.length)
      var i = 0
      while (i < l.length) { l(i) = ls(i) + o.ls(i); s(i) = ss(i) + o.ss(i); i += 1 }
      CF(n + o.n, l, s)
    }

  /** rep = LS/n elementwise (E8, `CombineStep.java:58-64`). */
  def rep: Array[Double] = ls.map(_ / n)

  /** extent: mean over dims of sqrt((2n·SS_d − 2·LS_d²)/(n(n−1))), skipping
    * negative radicands (E9, live formula `CombineStep.java:46-56`). */
  def extent: Double = {
    if (n <= 1) return 0.0
    var acc = 0.0; var i = 0
    while (i < ls.length) {
      val r = (2.0 * n * ss(i) - 2.0 * ls(i) * ls(i)) / (n.toDouble * (n - 1))
      if (r > 0) acc += math.sqrt(r)
      i += 1
    }
    acc / ls.length
  }

  /** nnDist(k) = (k/n)^(1/d) · extent — expected k-NN distance inside the
    * bubble under uniformity (E10). The reference's live code divides 1 by
    * the dimension in *integer* math (`CombineStep.java:42-44`), collapsing
    * this to `extent`; we implement the correct real-valued formula (the
    * reference's own dead code `ClusterFeatureDataBubbles.java:209-215`
    * agrees) and document the divergence here.
    */
  def nnDist(k: Double): Double =
    if (n == 0 || ls.isEmpty) 0.0
    else math.pow(k / n.toDouble, 1.0 / ls.length) * extent
}

object CFAggregator extends Aggregator[Array[Double], CF, CF] {
  override def zero: CF = CF(0L, Array.empty, Array.empty)
  override def reduce(b: CF, a: Array[Double]): CF = {
    if (b.n == 0) CF(1L, a.clone(), a.map(x => x * x))
    else {
      val l = b.ls; val s = b.ss
      var i = 0
      while (i < a.length) { l(i) += a(i); s(i) += a(i) * a(i); i += 1 }
      CF(b.n + 1, l, s)
    }
  }
  override def merge(x: CF, y: CF): CF = x.merge(y)
  override def finish(r: CF): CF = r
  override def bufferEncoder: Encoder[CF] = Encoders.product[CF]
  override def outputEncoder: Encoder[CF] = Encoders.product[CF]
}
