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
