package graft

import org.apache.spark.sql.SparkSession

/** Defensive between-queries cleanup for the Bench/Verify harnesses.
  *
  * Operators clean up after themselves (see Dedup.minhashNearDup,
  * StreamingOps, CheckpointRotator), but a returned DataFrame's own
  * materialized blocks legitimately outlive the operator call — this sweep
  * frees them once the harness has consumed the result, so query N+1 never
  * pays for query N's state (round 1's suite self-degraded 20-100x,
  * VERDICT r1).
  */
object SessionHygiene {
  def sweep(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    spark.catalog.listTables().collect()
      .filter(_.isTemporary)
      .foreach(t => spark.catalog.dropTempView(t.name))
  }
}
