package graft

import org.apache.spark.sql.SparkSession

/** Job-description tags marking the driver-collect contract of an action —
  * the listener specs assert that nothing untagged returns big results.
  * (Shared by the clustering pipeline and the distributed dendrogram;
  * values must stay in sync with [[graft.hdbscan.Hdbscan]]'s aliases.) */
object GraftTags {
  /** Wittingly driver-O(n) collects (core rows, final MST edges). */
  val DriverCollectTag = "graft:driver-O(n)"

  /** Collects bounded by cluster/metadata size (≤ 2n/minClusterSize
    * condensed-tree rows, seed rows, cell counts), never by n. */
  val BoundedCollectTag = "graft:driver-bounded"

  def tagged[T](spark: SparkSession, tag: String)(body: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(tag)
    try body finally sc.setJobDescription(prev)
  }

  def bounded[T](spark: SparkSession)(body: => T): T =
    tagged(spark, BoundedCollectTag)(body)
}
