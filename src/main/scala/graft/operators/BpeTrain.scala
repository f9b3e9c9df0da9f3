package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed BPE vocabulary induction (Sennrich et al., ACL 2016) — the
  * tokenizer-TRAINING side of the pipeline ([[graft.expr]] `bpeTokenCount`
  * is the inference side). Classic byte-pair encoding: start from
  * characters, repeatedly merge the most frequent adjacent symbol pair
  * (weighted by word frequency), emit the ordered merge list.
  *
  * Scale shape — the crucial property: the CORPUS is touched exactly once,
  * by the initial word-count scan. Training then iterates on the
  * vocab-shaped (word, count, symbols) frame — bounded by the distinct-word
  * vocabulary, not corpus size — with one map-side-combinable pair-count
  * aggregation plus a single-row argmax collect per merge (driver state per
  * round: ONE pair — the k×dim-style bounded state every iterative fitter
  * here keeps). Each round persists its frame and releases the previous
  * one, so lineage depth stays constant across merges.
  *
  * Determinism: pair-frequency ties break lexicographically on (left,
  * right), so the learned merge list is a pure function of the corpus —
  * what lets q_bpe_train sit on a pinned oracle.
  */
object BpeTrain {

  /** Greedy left-to-right application of one merge to a symbol sequence —
    * the standard BPE convention (non-overlapping, leftmost first). */
  def mergePair(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Learn `nMerges` merges from the token stream of `docs`.
    *
    * @return (merge_rank, left, right, new_token, freq) — freq is the
    *         pair's weighted frequency at learn time; the sequence is
    *         non-increasing in freq (merging can only shrink the max).
    */
  def train(docs: DataFrame, textCol: String = "text", nMerges: Int = 20,
      minPairFreq: Long = 2L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // localCheckpoint, not persist: persist caches BLOCKS but keeps the
    // full logical plan, so 20 map rounds would nest 20 plans deep
    // (exponential analysis/codegen cost). The eager local checkpoint
    // TRUNCATES lineage each round — constant-depth plans, which is the
    // whole point of the per-round materialization.
    var state: Dataset[(Long, Seq[String])] = docs
      .select(explode(TextOps.tokens(col(textCol))).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(col("cnt"), split(col("w"), "").as("syms"))
      .as[(Long, Seq[String])]
      // the iteration frame is VOCABULARY-shaped (typically 10⁴–10⁸ rows
      // at any corpus size) and every merge round checkpoints + scans it:
      // right-size its partition count to the data instead of paying
      // 32-partition task overhead × rounds on a tiny frame. sized ~64k
      // words/partition; a web-scale vocab still fans out
      .repartition(math.max(1, (docs.sparkSession.sparkContext.defaultParallelism / 4).min(16)))
      .localCheckpoint(eager = true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val best = state.toDF("cnt", "syms")
        .select(col("cnt"), explode(arrays_zip(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1))).as("p"))
        .groupBy(col("p.0").as("l"), col("p.1").as("r"))
        .agg(sum(col("cnt")).as("freq"))
        .orderBy(col("freq").desc, col("l"), col("r"))
        .limit(1).collect() // ONE row: the argmax pair — bounded driver state
      if (best.isEmpty || best(0).getLong(2) < minPairFreq) done = true
      else {
        val l = best(0).getString(0)
        val r = best(0).getString(1)
        merges += ((rank, l, r, l + r, best(0).getLong(2)))
        val next = state.map { case (cnt, syms) => (cnt, mergePair(syms, l, r)) }
          .localCheckpoint(eager = true) // materializes + truncates lineage
        state.unpersist(blocking = false)
        state = next
        rank += 1
      }
    }
    state.unpersist(blocking = false)
    spark.createDataset(merges.toSeq)
      .toDF("merge_rank", "left", "right", "new_token", "freq")
  }
}
