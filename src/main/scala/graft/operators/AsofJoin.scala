package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: match each left row to the single right row with the largest
  * time ≤ the left row's time, per key — the temporal lookup ("state of X
  * when Y happened") that plain equi-joins cannot express.
  *
  * Spark has no native as-of join; the naive encodings are scale-killers —
  * an inequality join (`l.t >= r.t`) plans as a broadcast-nested-loop or a
  * range join producing O(|matches|) intermediate rows per left row, and a
  * per-left-row argmax window over that product is quadratic in the hot
  * key. This operator uses the union+window formulation instead: tag both
  * inputs, union them, and carry the latest right payload forward with one
  * `last(ignoreNulls)` running window per key — one shuffle on the key, one
  * sort on (time, side), zero row amplification, any skew handled by the
  * same AQE/salting machinery as any single window.
  *
  * Right-side rows must be unique per (key, time) — pre-aggregate ties
  * (e.g. `max_by`) before calling, as the tie order within one timestamp
  * is otherwise unspecified (DuckDB's native ASOF JOIN has the same
  * contract).
  *
  * @param left     probe side; all its columns pass through
  * @param right    build side: (key, time, payload...)
  * @param key      equi-join key column name (same on both sides)
  * @param time     event-time column name (same on both sides, any ordered
  *                 numeric/timestamp type)
  * @param payload  right-side columns to attach
  * @param prefix   prefix for attached payload columns
  * @return left rows that have a match, with `prefix+payload` columns
  *         attached (inner as-of semantics; unmatched left rows drop)
  * @note the union encoding needs five internal working columns
  *       (`__t`, `__side`, `__payload`, `__left`, `__carried`); neither
  *       input may already contain a column with one of those names —
  *       asserted up front rather than silently mis-resolving
  */
object AsofJoin {

  private val Reserved = Seq("__t", "__side", "__payload", "__left", "__carried")

  def asof(left: DataFrame, right: DataFrame, key: String, time: String,
      payload: Seq[String], prefix: String = "asof_"): DataFrame = {
    val clash = (left.columns ++ right.columns).distinct.filter(Reserved.contains)
    require(clash.isEmpty,
      s"asof(): input column(s) ${clash.mkString(", ")} collide with the " +
        s"operator's reserved working columns (${Reserved.mkString(", ")}); rename them first")
    val leftCols = left.columns.toSeq
    // side 0 sorts before side 1 at equal time: a right row AT the left
    // row's timestamp is visible to it ("at-or-before")
    val r = right.select(col(key), col(time).as("__t"), lit(0).as("__side"),
      struct(payload.map(col): _*).as("__payload"), lit(null).cast(
        org.apache.spark.sql.types.StructType(left.schema.fields)).as("__left"))
    val l = left.select(col(key), col(time).as("__t"), lit(1).as("__side"),
      lit(null).cast(r.schema("__payload").dataType).as("__payload"),
      struct(leftCols.map(col): _*).as("__left"))
    val w = Window.partitionBy(col(key)).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("__carried", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__carried").isNotNull)
      .select(leftCols.map(c => col(s"__left.$c").as(c)) ++
        payload.map(p => col(s"__carried.$p").as(s"$prefix$p")): _*)
  }
}
