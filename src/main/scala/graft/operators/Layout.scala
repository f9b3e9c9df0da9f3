package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators for scan pruning at 100 TB.
  *
  * Columnar scans skip files (and row groups) whose min/max stats exclude a
  * predicate. A plain sort tightens stats on ONE column; Z-ordering sorts by
  * the Morton interleave of two columns' bits, so every file covers a small
  * RECTANGLE of the (a, b) space and predicates on EITHER column prune —
  * the standard lakehouse clustering layout. The interleave is a pure
  * bitwise expression tree (whole-stage codegen, no UDF); the layout itself
  * is `repartitionByRange` + `sortWithinPartitions`, i.e. one range shuffle
  * whatever the table size.
  */
object Layout {

  /** Morton (Z-order) value of two non-negative ints: bit i of `a` lands at
    * position 2i, bit i of `b` at 2i+1. Inputs must fit in `bits` bits
    * (callers bucket/clamp first — stats pruning only needs rank order of
    * the buckets, not exact values). Pure codegen expression. */
  def zValue2(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val la = a.cast("long")
    val lb = b.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(la, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(lb, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** N-column Morton interleave: bit i of column j lands at position
    * i·m + j (m = number of columns). `zValue2` is the m=2 special case
    * (kept separate — its layout matches the classic 2-D literature and
    * the q_zorder_layout oracle). Total bits m·bits must stay below 63. */
  def zValueN(cols: Seq[Column], bits: Int = 16): Column = {
    val m = cols.length
    require(m >= 2, s"need at least 2 columns, got $m")
    require(bits >= 1 && m * bits <= 63, s"$m columns × $bits bits exceeds a long")
    val longs = cols.map(_.cast("long"))
    (for {
      i <- 0 until bits
      (c, j) <- longs.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * m + j))
      .reduce(_.bitwiseOR(_))
  }

  /** Cluster `df` for writing: range-partition on the Z-value of (a, b) and
    * sort within partitions, so each output file holds one compact Z-range —
    * tight min/max on both dimensions. One shuffle (range exchange over a
    * sampled boundary set); the sort is partition-local. */
  def zorderBy(df: DataFrame, a: Column, b: Column, bits: Int = 16,
      numPartitions: Int = 0): DataFrame = {
    val withZ = df.withColumn("__graft_z", zValue2(a, b, bits))
    val ranged =
      if (numPartitions > 0) withZ.repartitionByRange(numPartitions, col("__graft_z"))
      else withZ.repartitionByRange(col("__graft_z"))
    ranged.sortWithinPartitions(col("__graft_z")).drop("__graft_z")
  }
}
