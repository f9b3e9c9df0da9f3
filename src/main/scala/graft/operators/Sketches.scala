package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches for 100 TB token statistics.
  *
  * [[MisraGries]] is the classic k-counter heavy-hitters summary (Misra &
  * Gries 1982), in the MERGEABLE formulation of Agarwal, Cormode et al.,
  * "Mergeable Summaries" (PODS'12): per-partition summaries of k counters
  * combine pairwise — sum counts, then subtract the (k+1)-th largest count
  * from every counter and drop non-positives — and the merged summary keeps
  * the full guarantee: every item's estimate undercounts its true frequency
  * by at most n/(k+1), where n is the TOTAL count seen across all inputs.
  * Consequence (the invariant the oracle gate checks): any token whose true
  * frequency exceeds n/(k+1) — in particular any with frequency > n/k — is
  * PRESENT in the summary, no matter how the input was partitioned.
  *
  * Execution shape: a typed [[Aggregator]], so Spark runs it as an
  * object-hash aggregate with map-side partial merge — each task reduces
  * its rows into ONE k-entry map, and only those k-entry maps shuffle (to a
  * single combiner for a global sketch). That is the whole point at scale:
  * the exact count of every token needs a shuffle of one row per distinct
  * token (unbounded vocabulary); the sketch shuffles O(k × tasks) rows,
  * independent of both corpus size and vocabulary.
  */
object Sketches {

  /** Misra-Gries summary state: item → counter (at most k entries), plus
    * the running total of items fed in (needed to state the error bound). */
  final case class MgState(counters: Map[String, Long], total: Long)

  final class MisraGries(k: Int)
      extends Aggregator[String, MgState, Map[String, Long]] {
    require(k > 0, s"need at least one counter, got k=$k")

    override def zero: MgState = MgState(Map.empty, 0L)

    override def reduce(b: MgState, item: String): MgState = {
      val c = b.counters
      val next =
        if (c.contains(item)) c.updated(item, c(item) + 1L)
        else if (c.size < k) c.updated(item, 1L)
        else {
          // decrement step: all counters lose 1 (the arriving item's single
          // count annihilates with one unit of each survivor); zeros drop
          c.flatMap { case (t, n) => if (n > 1L) Some(t -> (n - 1L)) else None }
        }
      MgState(next, b.total + 1L)
    }

    override def merge(b1: MgState, b2: MgState): MgState = {
      if (b2.counters.isEmpty) return MgState(b1.counters, b1.total + b2.total)
      if (b1.counters.isEmpty) return MgState(b2.counters, b1.total + b2.total)
      val summed = b2.counters.foldLeft(b1.counters) { case (acc, (t, n)) =>
        acc.updated(t, acc.getOrElse(t, 0L) + n)
      }
      val trimmed =
        if (summed.size <= k) summed
        else {
          // subtract the (k+1)-th largest counter from all, keep positives —
          // the PODS'12 merge that preserves the n/(k+1) error bound
          val kth = summed.valuesIterator.toArray.sortBy(-_).apply(k)
          summed.flatMap { case (t, n) => if (n > kth) Some(t -> (n - kth)) else None }
        }
      MgState(trimmed, b1.total + b2.total)
    }

    override def finish(r: MgState): Map[String, Long] = r.counters

    override def bufferEncoder: Encoder[MgState] = Encoders.product[MgState]
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Count-min sketch state: a depth×width counter matrix flattened
    * row-major, with the running item total in the trailing slot. Merge is
    * elementwise sum — the CMS is a linear sketch, so any partitioning of
    * the input merges to the identical matrix (unlike Misra-Gries, whose
    * merge is lossy but bounded). */
  final class CountMin(depth: Int, width: Int)
      extends Aggregator[String, Array[Long], Array[Long]] {
    require(depth > 0 && width > 0, s"need positive dims, got $depth x $width")

    override def zero: Array[Long] = new Array[Long](depth * width + 1)

    override def reduce(b: Array[Long], item: String): Array[Long] = {
      var r = 0
      while (r < depth) {
        b(r * width + CountMin.bucket(item, r, width)) += 1L
        r += 1
      }
      b(depth * width) += 1L
      b
    }

    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < b1.length) { b1(i) += b2(i); i += 1 }
      b1
    }

    override def finish(r: Array[Long]): Array[Long] = r

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  object CountMin {
    /** Row-r bucket for an item: murmur3 with a per-row seed, masked
      * non-negative. Pure Scala murmur — deterministic across executors
      * running the same jar. */
    def bucket(item: String, row: Int, width: Int): Int = {
      val h = scala.util.hashing.MurmurHash3.stringHash(item, 0x9747b28c + row * 104729)
      (h & 0x7fffffff) % width
    }

    /** Point estimate: the minimum of the item's d counters — each row
      * OVERcounts (collisions only add), so the min is an upper-biased
      * estimate with `est - true ≤ e·N/width` per row in expectation
      * (Cormode & Muthukrishnan 2005). */
    def estimate(sketch: Array[Long], depth: Int, width: Int, item: String): Long = {
      var best = Long.MaxValue
      var r = 0
      while (r < depth) {
        val c = sketch(r * width + bucket(item, r, width))
        if (c < best) best = c
        r += 1
      }
      best
    }
  }

  /** Count-min verification frame over a token column: the `topK` tokens by
    * EXACT count (plain SQL — the oracle side), each annotated with the two
    * CMS guarantees evaluated against the sketch built by the mergeable
    * aggregator: the estimate never undercounts (deterministic — collisions
    * only add), and it overshoots by at most ⌈e·N/width⌉ (the Markov bound;
    * probabilistic per item, but deterministic for a fixed corpus + seeded
    * hashes, and enforced per-SF by SketchesSpec). The sketch shuffles
    * O(depth·width × tasks) longs where the exact count shuffles the
    * vocabulary — the 100 TB trade the operator exists for.
    *
    * @param toks single-column DataFrame of tokens (column `tok`)
    * @return (token, n_exact, est_ge_exact, within_eps) ordered by
    *         n_exact desc, token
    */
  def countMinCheck(toks: DataFrame, depth: Int = 4, width: Int = 2048,
      topK: Int = 20): DataFrame = {
    val spark = toks.sparkSession
    import spark.implicits._
    val sketch: Array[Long] =
      toks.as[String].select(new CountMin(depth, width).toColumn).head()
    val total = sketch(depth * width)
    val bound = math.ceil(math.E * total / width).toLong
    val top = toks.groupBy(col("tok")).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("tok"))
      .limit(topK).collect() // bounded: topK rows, the declared probe set
    val rows = top.map { r =>
      val t = r.getString(0)
      val n = r.getLong(1)
      val est = CountMin.estimate(sketch, depth, width, t)
      (t, n, est >= n, est <= n + bound)
    }.toSeq
    spark.createDataset(rows)
      .toDF("token", "n_exact", "est_ge_exact", "within_eps")
      .orderBy(col("n_exact").desc, col("token"))
  }

  /** Global heavy-hitters verification frame over a token column: exact
    * counts of every token whose frequency exceeds total/k, each annotated
    * with its presence in the Misra-Gries summary — which the MG merge
    * guarantee forces to `true` regardless of partitioning. The exact side
    * is the oracle harness (an ordinary two-level count); the sketch side
    * is the operator under test.
    *
    * @param toks single-column DataFrame of tokens (column `tok`)
    * @return (token, n_exact, in_sketch) ordered by n_exact desc, token
    */
  def heavyHitters(toks: DataFrame, k: Int): DataFrame = {
    import toks.sparkSession.implicits._
    val sketch: Map[String, Long] =
      toks.as[String].select(new MisraGries(k).toColumn).head()
    val sketchKeys = typedLit(sketch.keySet.toSeq.sorted)
    val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("n_exact"))
    val total = counts.agg(sum(col("n_exact")).as("n_total"))
    counts.crossJoin(total)
      .filter(col("n_exact") * k > col("n_total"))
      .select(col("tok").as("token"), col("n_exact"),
        array_contains(sketchKeys, col("tok")).as("in_sketch"))
      .orderBy(col("n_exact").desc, col("token"))
  }
}
