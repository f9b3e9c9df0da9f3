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

  /** One compaction run's accounting. */
  final case class CompactionReport(
      files_before: Long, bytes_before: Long,
      files_after: Long, bytes_after: Long,
      rows_before: Long, rows_after: Long,
      max_file_bytes_after: Long)

  /** (name, bytes) of the part-files in `dir`, name-sorted. */
  def dataFiles(spark: org.apache.spark.sql.SparkSession,
      dir: String): Seq[(String, Long)] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(path).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .map(st => (st.getPath.getName, st.getLen))
      .sortBy(_._1)
  }

  /** Run `body` with the file-source split planner forced to pack whole
    * small files into ~`targetBytes` splits: `maxPartitionBytes` = the bin
    * size, `openCostInBytes` charging each file's open so a bin of tiny
    * files stays seek-bounded, `minPartitionNum` = 1 so core-count
    * parallelism doesn't shrink the bins below the target. The packing is
    * Spark's own first-fit over size-sorted files — no custom reader.
    *
    * The confs MUST wrap the consuming ACTION, not just `spark.read`:
    * split planning happens at physical planning time (the scan's RDD is
    * built when the query executes), so a read-then-restore would silently
    * plan with the restored defaults. Confs are restored afterwards. */
  def withBinPackedSplits[T](spark: org.apache.spark.sql.SparkSession,
      targetBytes: Long)(body: => T): T = {
    val conf = spark.conf
    val saved = Seq("spark.sql.files.maxPartitionBytes",
      "spark.sql.files.openCostInBytes", "spark.sql.files.minPartitionNum")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.files.maxPartitionBytes", targetBytes.toString)
      conf.set("spark.sql.files.openCostInBytes", (64 * 1024).toString)
      conf.set("spark.sql.files.minPartitionNum", "1")
      body
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  /** Lakehouse small-file compaction (the other half of the write-layout
    * story beside [[zorderBy]]): rewrite a fragmented directory into
    * ~`targetBytes` files by bin-packing whole input files into scan
    * splits and writing one file per split — ZERO shuffle, one pass over
    * the data, each task reads its bin of small files sequentially. This
    * is the scale path for 100 TB maintenance: no repartition() (a full
    * exchange of the table just to change file boundaries), and
    * failure-safe because every task's output depends only on its own
    * input files. Returns before/after file-count, byte and row
    * accounting (rows re-counted from the rewritten files, not assumed). */
  def compact(spark: org.apache.spark.sql.SparkSession, inDir: String,
      outDir: String, targetBytes: Long): CompactionReport = {
    val before = dataFiles(spark, inDir)
    val rowsBefore = spark.read.parquet(inDir).count()
    withBinPackedSplits(spark, targetBytes) {
      spark.read.parquet(inDir).write.mode("overwrite").parquet(outDir)
    }
    val after = dataFiles(spark, outDir)
    val rowsAfter = spark.read.parquet(outDir).count()
    CompactionReport(
      files_before = before.size.toLong, bytes_before = before.map(_._2).sum,
      files_after = after.size.toLong, bytes_after = after.map(_._2).sum,
      rows_before = rowsBefore, rows_after = rowsAfter,
      max_file_bytes_after = if (after.isEmpty) 0L else after.map(_._2).max)
  }
}
