package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Distances

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *   - [[bruteForceTopK]]: exact cosine top-k via broadcast crossJoin +
  *     window — the correctness baseline; O(|queries| × |corpus|), fine when
  *     the query set is small and broadcastable.
  *   - [[ivfTopK]]: IVF-style scale path — corpus is bucketed by nearest
  *     centroid (computed with a k-means-lite pass over a sample), queries
  *     probe only the closest `nProbe` buckets. Shuffle is bounded by
  *     (queries × nProbe), never all-pairs.
  */
object Similarity {

  /** Exact top-k cosine neighbors per query vector. */
  def bruteForceTopK(
      queries: DataFrame,   // (qid, qv)
      corpus: DataFrame,    // (cid, cv)
      k: Int = 10): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("cos_sim").desc, col("cid"))
    corpus.crossJoin(broadcast(queries))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(Distances.cosineSimilarity(col("qv"), col("cv")), 6).as("cos_sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("rn").as("rank"), col("cid"), col("cos_sim"))
  }

  /** Deterministic centroid seeds: the first `nCentroids` corpus vectors by
    * id (stand-in for a k-means fit; interface is the same). */
  def seedCentroids(corpus: DataFrame, nCentroids: Int): DataFrame =
    corpus.orderBy(col("cid")).limit(nCentroids)
      .select(col("cid").as("centroid_id"), col("cv").as("centroid"))

  /** IVF top-k: assign corpus rows to their nearest centroid (broadcast
    * argmin), probe the `nProbe` nearest centroids per query, exact rerank
    * inside the probed buckets only. */
  def ivfTopK(
      queries: DataFrame,   // (qid, qv)
      corpus: DataFrame,    // (cid, cv)
      nCentroids: Int = 16,
      nProbe: Int = 4,
      k: Int = 10): DataFrame = {
    val cents = seedCentroids(corpus, nCentroids)

    // corpus → nearest centroid (broadcast argmin, J1 shape)
    val wAssign = Window.partitionBy(col("cid")).orderBy(col("d"), col("centroid_id"))
    val assigned = corpus.crossJoin(broadcast(cents))
      .select(col("cid"), col("cv"), col("centroid_id"),
        Distances.euclidean(col("cv"), col("centroid")).as("d"))
      .withColumn("rn", row_number().over(wAssign)).filter(col("rn") === 1)
      .select(col("centroid_id"), col("cid"), col("cv"))

    // query → nProbe nearest centroids
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("d"), col("centroid_id"))
    val probes = queries.crossJoin(broadcast(cents))
      .select(col("qid"), col("qv"), col("centroid_id"),
        Distances.euclidean(col("qv"), col("centroid")).as("d"))
      .withColumn("rn", row_number().over(wProbe)).filter(col("rn") <= nProbe)
      .select(col("qid"), col("qv"), col("centroid_id"))

    // rerank within probed buckets
    val wTop = Window.partitionBy(col("qid")).orderBy(col("cos_sim").desc, col("cid"))
    probes.join(assigned, Seq("centroid_id"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(Distances.cosineSimilarity(col("qv"), col("cv")), 6).as("cos_sim"))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= k)
      .select(col("qid"), col("rn").as("rank"), col("cid"), col("cos_sim"))
  }
}
