package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative connected components over an edge DataFrame — the engine's
  * replacement for the reference's label-propagation loop
  * (`main/findConnectedComponentsOnMST.java:18-73`, `Main.java:385-407`,
  * which aborts after one round). Min-label propagation to a fixed point:
  * each round every vertex takes the min component id in its closed
  * neighborhood; converges in O(diameter) rounds, each one shuffle.
  * `localCheckpoint` cuts lineage per round (the reference used object-file
  * checkpoints for the same purpose, `Main.java:101,199,...`).
  */
object ConnectedComponents {

  /** @param edges (src: long, dst: long) undirected
    * @return (vertex: long, component: long) — component = min vertex id in
    *         the component
    */
  def run(spark: SparkSession, edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()

    var labels = sym.select(col("src").as("vertex")).distinct()
      .withColumn("component", col("vertex"))
      .localCheckpoint()

    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // component candidate from each neighbor, plus own label
      val viaNeighbors = sym
        .join(labels.withColumnRenamed("vertex", "dst").withColumnRenamed("component", "nc"), "dst")
        .groupBy(col("src").as("vertex")).agg(min(col("nc")).as("neighbor_min"))
      val updated = labels.join(viaNeighbors, Seq("vertex"), "left")
        .select(col("vertex"),
          least(col("component"), coalesce(col("neighbor_min"), col("component"))).as("component"))
        .localCheckpoint()
      val changed = updated.join(labels.withColumnRenamed("component", "old"), "vertex")
        .filter(col("component") =!= col("old")).limit(1).count()
      labels = updated
      converged = changed == 0
      iter += 1
    }
    labels
  }
}
