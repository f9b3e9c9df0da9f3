package graft.operators

import org.apache.spark.sql.functions._

class LayoutSpec extends graft.SparkTestBase {

  private def mortonRef(a: Long, b: Long, bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("zValue2 matches the reference interleave on exhaustive small inputs") {
    import spark.implicits._
    val rows = for (a <- 0 until 32; b <- 0 until 32) yield (a.toLong, b.toLong)
    val got = rows.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zValue2(col("a"), col("b"), 5).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    rows.foreach { case (a, b) =>
      assert(got((a, b)) === mortonRef(a, b, 5), s"($a,$b)")
    }
    // interleave is a bijection on the 10-bit square
    assert(got.values.toSet.size === rows.size)
  }

  test("zValueN generalizes zValue2 and interleaves 3 columns bijectively") {
    import spark.implicits._
    val rows = for (a <- 0 until 16; b <- 0 until 16) yield (a.toLong, b.toLong)
    val same = rows.toDF("a", "b")
      .select((Layout.zValueN(Seq(col("a"), col("b")), 4) ===
        Layout.zValue2(col("a"), col("b"), 4)).as("eq"))
      .agg(min(col("eq"))).head().getBoolean(0)
    assert(same, "zValueN(m=2) must equal zValue2")
    val triples = for (a <- 0 until 8; b <- 0 until 8; c <- 0 until 8)
      yield (a.toLong, b.toLong, c.toLong)
    val zs = triples.toDF("a", "b", "c")
      .select(Layout.zValueN(Seq(col("a"), col("b"), col("c")), 3).as("z"))
      .collect().map(_.getLong(0))
    assert(zs.toSet.size === triples.size, "3-column interleave must be a bijection")
    assert(zs.forall(z => z >= 0 && z < 512))
  }

  test("zorderBy yields disjoint, ordered z-ranges and 2-D locality") {
    val li = spark.read.parquet(s"${sf("sf0.01")}/lineitem.parquet")
      .select(col("l_partkey") % 4096 as "a", col("l_suppkey") % 4096 as "b")
    val laid = Layout.zorderBy(li, col("a"), col("b"), bits = 12, numPartitions = 16)
    val stats = laid
      .select(spark_partition_id().as("pid"), col("a"), col("b"),
        Layout.zValue2(col("a"), col("b"), 12).as("z"))
      .groupBy(col("pid"))
      .agg(min(col("z")).as("zmin"), max(col("z")).as("zmax"),
        (max(col("a")) - min(col("a"))).as("aRange"),
        (max(col("b")) - min(col("b"))).as("bRange"),
        count(lit(1)).as("n"))
      .orderBy(col("zmin")).collect()
    assert(stats.length > 4)
    // disjoint ordered z-ranges: each partition's zmin exceeds the previous zmax
    stats.sliding(2).foreach { case Array(p, q) =>
      assert(q.getLong(1) > p.getLong(2),
        s"z-ranges overlap: ${p.getLong(2)} vs ${q.getLong(1)}")
    case _ => ()
    }
    // 2-D locality: partitions cover rectangles, so the AVERAGE per-partition
    // span of each dimension is well below the global 4096 span (a plain
    // a-sort would give bRange ≈ 4095 everywhere)
    val aAvg = stats.map(_.getLong(3)).sum.toDouble / stats.length
    val bAvg = stats.map(_.getLong(4)).sum.toDouble / stats.length
    assert(aAvg < 3000, s"no a-locality: avg range $aAvg")
    assert(bAvg < 3000, s"no b-locality: avg range $bAvg")
  }

  test("compact: bin-packs a fragmented directory without a shuffle, rows intact") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("compact").toString
    // 48 small files, each comfortably above the 64k open-cost so the
    // packing is byte-driven, not open-cost-driven
    (1L to 200000L).map(i => (i, s"row-$i-${"x" * 40}", i * 3.5)).toDF("id", "s", "v")
      .repartition(48).write.parquet(s"$base/in")
    val totalBytes = Layout.dataFiles(spark, s"$base/in").map(_._2).sum
    val target = totalBytes / 6 // aim for ~6-8 bins
    val report = Layout.compact(spark, s"$base/in", s"$base/out", target)
    assert(report.files_before == 48)
    assert(report.rows_before == 200000L && report.rows_after == 200000L)
    assert(report.files_after >= 4 && report.files_after <= report.files_before / 3,
      s"expected real consolidation into ~6-12 bins, got ${report.files_after}")
    // re-encoded bins stay near the target (wide band: re-compression +
    // the 64k open-cost padding shift sizes)
    assert(report.max_file_bytes_after <= 2 * target,
      s"oversized output file: ${report.max_file_bytes_after} vs target $target")
    // content preserved exactly, not just counted
    val sumBefore = spark.read.parquet(s"$base/in").agg(sum(col("id"))).head.getLong(0)
    val sumAfter = spark.read.parquet(s"$base/out").agg(sum(col("id"))).head.getLong(0)
    assert(sumBefore == sumAfter)
    // the zero-shuffle contract: the rewrite plan is scan → write, no
    // Exchange — materialized INSIDE the conf window, like compact does
    val plan = Layout.withBinPackedSplits(spark, target) {
      spark.read.parquet(s"$base/in").queryExecution.executedPlan.toString
    }
    assert(!plan.contains("Exchange"), s"compaction must not shuffle:\n$plan")
  }

  test("withBinPackedSplits drives split planning at action time and restores confs") {
    import spark.implicits._
    val base = s"${java.nio.file.Files.createTempDirectory("binpack")}/in"
    (1L to 400000L).map(i => (i, s"pad-${"y" * 32}-$i")).toDF("a", "b")
      .repartition(32).write.parquet(base)
    val before = spark.conf.getOption("spark.sql.files.maxPartitionBytes")
    val total = Layout.dataFiles(spark, base).map(_._2).sum
    def nParts(target: Long): Int = Layout.withBinPackedSplits(spark, target) {
      // rdd materialization forces physical planning inside the window
      spark.read.parquet(base).rdd.getNumPartitions
    }
    val coarse = nParts(total / 4)
    val fine = nParts(total / 16)
    assert(spark.conf.getOption("spark.sql.files.maxPartitionBytes") == before,
      "session conf must be restored")
    // the target genuinely drives the packing: 4 big bins vs ~16 small
    // ones (open-cost padding adds slack, hence the bands)
    assert(coarse >= 3 && coarse <= 8, s"expected ~4-6 coarse bins, got $coarse")
    assert(fine > coarse, s"smaller target must yield more bins: $fine vs $coarse")
  }
}
