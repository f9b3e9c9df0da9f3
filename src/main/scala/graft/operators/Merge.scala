package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC MERGE / upsert: apply a keyed insert/update/delete delta to a
  * snapshot — the warehouse staple the SCD-2 history builder (q_scd2)
  * implies but does not cover. The reference engine has no incremental
  * surface at all (every run re-reads the full input,
  * `main/Main.java:91-101`); a 100 TB lakehouse table is maintained by
  * exactly this operator instead of full rewrites.
  */
object Merge {

  /** Apply a CDC delta to a snapshot in one key-partitioned pass.
    *
    * `delta` carries the snapshot's payload columns plus `opCol`
    * ('I' | 'U' | 'D') and `seqCol` (change sequence; larger = newer).
    * Per key only the NEWEST delta row applies (latest-wins — the
    * log-compaction contract, so a delete-then-reinsert batch lands the
    * reinsert); 'I' and 'U' both land the payload (upsert semantics —
    * no key-existence check needed), 'D' removes the key. Keys the
    * delta never mentions pass through untouched. (`keys`, `seqCol`)
    * must uniquely identify delta rows — ties would make latest-wins
    * nondeterministic, so the builder of the delta owns uniqueness
    * (CDC logs carry a total order natively).
    *
    * Scale shape: the latest-wins window and the full-outer join both
    * hash-partition on `keys`, so the delta side reuses ONE exchange
    * across both operators and the snapshot shuffles once; nothing is
    * collected or broadcast — both sides may be table-scale. A snapshot
    * bucketed on `keys` would make its side exchange-free too.
    */
  def applyCdc(snapshot: DataFrame, delta: DataFrame, keys: Seq[String],
      opCol: String = "op", seqCol: String = "seq"): DataFrame = {
    val payload = snapshot.columns.filterNot(keys.contains).toSeq
    require(payload.forall(delta.columns.contains),
      s"delta must carry the snapshot payload columns ${payload.mkString(", ")}")
    require(delta.columns.contains(opCol) && delta.columns.contains(seqCol),
      s"delta must carry '$opCol' and '$seqCol'")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(seqCol).desc)
    val latest = delta
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    // USING-join coalesces the key columns; payload columns stay
    // side-qualified so the projection can pick delta-else-snapshot.
    snapshot.as("s").join(latest.as("d"), keys, "full_outer")
      .filter(col(s"d.$opCol").isNull || col(s"d.$opCol") =!= "D")
      .select(keys.map(col) ++ payload.map(p =>
        when(col(s"d.$opCol").isNotNull, col(s"d.$p"))
          .otherwise(col(s"s.$p")).as(p)): _*)
  }
}
