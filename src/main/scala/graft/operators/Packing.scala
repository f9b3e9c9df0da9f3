package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training pipelines: group short documents into
  * fixed token-budget bins (e.g. 512-token training sequences) so padding
  * waste is bounded, without any global coordination.
  *
  * Design for 100 TB: documents are hash-repartitioned by a stable key, each
  * partition is sorted by descending token count and packed independently
  * with greedy first-fit-decreasing (classic bin packing: FFD is a
  * 11/9·OPT+1 approximation). Bin ids are made globally unique by encoding
  * the partition id in the high bits — no driver state, no cross-partition
  * shuffle beyond the initial repartition, memory bounded by the open-bin
  * list (≤ partition rows). The layout is deterministic: partition
  * assignment is a pure hash of doc_id and the in-partition order is a total
  * order (n_tokens desc, doc_id).
  */
object Packing {

  /** @param docs   (doc_id, text) — any extra columns are dropped
    * @param budget max tokens per bin; docs longer than the budget are
    *               emitted as singleton overflow bins (bin_tokens > budget)
    *               rather than silently dropped — truncation is a separate,
    *               explicit op
    * @param numPartitions packing parallelism (each partition packs alone)
    * @return (doc_id, n_tokens, bin_id) — every input doc with n_tokens > 0
    *         appears exactly once
    */
  def packSequences(docs: DataFrame, budget: Int = 512, numPartitions: Int = 32,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sized = docs
      .select(col(idCol).cast("long").as("doc_id"),
        TextOps.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .repartition(numPartitions, pmod(col("doc_id"), lit(numPartitions)))
      .sortWithinPartitions(col("n_tokens").desc, col("doc_id"))
      .as[(Long, Long)]
    sized.mapPartitions { it =>
      val pid = TaskContext.getPartitionId().toLong
      // open bins as (binIdx, remaining); first-fit over the open list.
      // FFD keeps the list short (large docs first claim their own bins),
      // but worst case it is O(bins) per doc — fine for training-shard
      // partition sizes (1e5-1e6 docs)
      val remaining = scala.collection.mutable.ArrayBuffer.empty[Long]
      it.map { case (docId, nTok) =>
        var i = 0
        while (i < remaining.length && remaining(i) < nTok) i += 1
        if (i == remaining.length) remaining += (budget.toLong - nTok).max(0L)
        else remaining(i) -= nTok
        (docId, nTok, (pid << 40) | i.toLong)
      }
    }.toDF("doc_id", "n_tokens", "bin_id")
  }

  /** Bin-level summary of a [[packSequences]] result: per-bin token totals
    * and the overall packing efficiency (fill / budget over non-overflow
    * bins). */
  def binSummary(packed: DataFrame, budget: Int = 512): DataFrame =
    packed.groupBy(col("bin_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"))
      .agg(count(lit(1)).as("n_bins"),
        sum(col("n_docs")).as("n_docs"),
        sum(col("bin_tokens")).as("total_tokens"),
        max(col("bin_tokens")).as("max_bin_tokens"),
        coalesce(round(avg(when(col("bin_tokens") <= budget,
          col("bin_tokens").cast("double") / budget)), 6), lit(0.0))
          .as("fill_ratio"))
}
