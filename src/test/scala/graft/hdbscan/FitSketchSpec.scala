package graft.hdbscan

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.operators.{CF, CFAggregator}

/** [[Hdbscan.fitSketch]] — clustering a pre-aggregated CF sketch, the
  * surface that pairs with the streaming CFAggregator state. */
class FitSketchSpec extends SparkTestBase {

  private val rng = new scala.util.Random(5)

  /** 3 well-separated blobs, 40 cells each (cell = fine-grained bucket
    * inside a blob), ~25 points per cell. */
  private def cellData: Seq[(Long, Int, Array[Double])] =
    (0 until 3000).map { i =>
      val blob = i % 3
      val cell = blob * 40 + (i / 3) % 40
      val center = Array(blob * 100.0, blob * 50.0)
      (cell.toLong, blob, center.map(c => c + rng.nextGaussian()))
    }

  private def cfOf(rows: Seq[(Long, Array[Double])]) = {
    import spark.implicits._
    rows.toDF("cell", "vec").as[(Long, Array[Double])]
      .groupByKey(_._1).mapValues(_._2)
      .agg(CFAggregator.toColumn.name("cf"))
  }

  test("fitSketch separates the blobs' cells and labels every bubble") {
    import spark.implicits._
    val data = cellData
    val sketch = cfOf(data.map(t => (t._1, t._3)))
    val out = Hdbscan(minPts = 4, minClusterSize = 4).fitSketch(sketch)
      .select(col("bubble_id"), col("label"), col("mass"))
      .as[(Long, Int, Long)].collect()
    assert(out.length == 120)
    assert(out.map(_._3).sum == 3000) // mass conservation
    val byBlob = out.groupBy(t => (t._1 / 40).toInt).view.mapValues(_.map(_._2).toSet)
    // each blob's 40 cells carry ONE label; different blobs different labels
    byBlob.foreach { case (b, ls) =>
      assert(ls.size == 1 && ls.head != 0, s"blob $b labels $ls")
    }
    assert(byBlob.values.map(_.head).toSet.size == 3)
  }

  test("fitSketch equals the point-level bubble mode's bubble labeling on shared cells") {
    import spark.implicits._
    // feed fitSketch the CF of deterministic cells; a second fitSketch on a
    // permuted/partitioned layout of the same rows must be identical (the
    // collect is canonically sorted, the aggregator order-invariant at the
    // label level on well-separated data)
    val data = cellData
    val a = Hdbscan(minPts = 4, minClusterSize = 4)
      .fitSketch(cfOf(data.map(t => (t._1, t._3))))
      .select(col("bubble_id"), col("label"))
      .as[(Long, Int)].collect().sortBy(_._1).toSeq
    val shuffled = scala.util.Random.javaRandomToRandom(
      new java.util.Random(9)).shuffle(data)
    val b = Hdbscan(minPts = 4, minClusterSize = 4)
      .fitSketch(cfOf(shuffled.map(t => (t._1, t._3))).repartition(7))
      .select(col("bubble_id"), col("label"))
      .as[(Long, Int)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("fitSketch matrix-free route (bubbleMatrixCap = 0) equals the matrix route") {
    import spark.implicits._
    val sketch = cfOf(cellData.map(t => (t._1, t._3)))
    def run(h: Hdbscan): Seq[(Long, Int, Double, Double)] =
      h.fitSketch(sketch)
        .select(col("bubble_id"), col("label"), col("outlier_score"), col("core_dist"))
        .as[(Long, Int, Double, Double)].collect().sortBy(_._1).toSeq
    val base = Hdbscan(minPts = 4, minClusterSize = 4)
    val matrix = run(base)
    val free = run(base.setBubbleMatrixCap(0))
    assert(matrix.map(t => (t._1, t._2)) == free.map(t => (t._1, t._2)),
      "labels differ between matrix and matrix-free fitSketch routes")
    matrix.zip(free).foreach { case (a, b) =>
      assert(a._4 == b._4, s"core_dist differs at ${a._1}")
      assert(math.abs(a._3 - b._3) < 1e-9, s"outlier score differs at ${a._1}")
    }
  }

  test("fitSketch rejects malformed sketches and passes through an empty one") {
    import spark.implicits._
    val h = Hdbscan(minPts = 4, minClusterSize = 4)
    val empty = Seq.empty[(Long, CF)].toDS()
    assert(h.fitSketch(empty).count() == 0)
    val ragged = Seq(
      (0L, CF(2L, Array(1.0, 2.0), Array(1.0, 4.0))),
      (1L, CF(2L, Array(1.0), Array(1.0)))).toDS()
    intercept[IllegalArgumentException] { h.fitSketch(ragged) }
    val dup = Seq(
      (0L, CF(2L, Array(1.0), Array(1.0))),
      (0L, CF(2L, Array(2.0), Array(4.0)))).toDS()
    intercept[IllegalArgumentException] { h.fitSketch(dup) }
  }

  test("fitSketch honors bubble-level constraints (must-link flips selection)") {
    import spark.implicits._
    // two adjacent blobs A (cells 0-9) and B (cells 10-19), far blob C
    // (cells 20-29): unconstrained A/B split; a must-link across them merges
    val rows = (0 until 900).map { i =>
      val cell = i % 30
      val base = if (cell < 10) 0.0 else if (cell < 20) 6.0 else 300.0
      (cell.toLong, Array(base + cell % 10 * 0.3 + rng.nextGaussian() * 0.05))
    }
    val base = Hdbscan(minPts = 4, minClusterSize = 4)
    def labelsOf(h: Hdbscan): Map[Long, Int] =
      h.fitSketch(cfOf(rows)).select(col("bubble_id"), col("label"))
        .as[(Long, Int)].collect().toMap
    val plain = labelsOf(base)
    assert(plain(0L) != 0 && plain(15L) != 0 && plain(0L) != plain(15L),
      s"expected A/B split, got ${plain(0L)} vs ${plain(15L)}")
    val ml = labelsOf(base.setBubbleConstraints(Seq((0L, 15L, true))))
    assert(ml(0L) != 0 && ml(0L) == ml(15L), s"must-link should merge A and B")
    assert(ml(25L) != 0 && ml(25L) != ml(0L), "C stays its own cluster")
    // deprecated fallback (r12 configs): point-level setConstraints ids are
    // still reinterpreted as bubble ids, with a warning — same steering
    val legacy = labelsOf(base.setConstraints(Seq((0L, 15L, true))))
    assert(legacy == ml, "legacy constraint fallback diverged from typed path")
    // typed parameter wins when both are set
    val both = labelsOf(base.setBubbleConstraints(Seq((0L, 15L, true)))
      .setConstraints(Seq((999999L, 999998L, true))))
    assert(both == ml, "bubbleConstraints should take precedence over constraints")
  }

  test("streamed CF snapshot clusters identically to the batch sketch") {
    import spark.implicits._
    // the headline loop: vectors stream through the CFAggregator in two
    // micro-batches; fitSketch over the snapshot must label the cells the
    // same as the batch-aggregated sketch (well-separated blobs — label
    // structure is robust to the streams' different IEEE summation order)
    val dir = java.nio.file.Files.createTempDirectory("fitsk").toString
    val data = cellData.map(t => (t._1, t._3))
    data.take(1400).toDF("cell", "vec").coalesce(1).write.parquet(s"$dir/b1")
    data.drop(1400).toDF("cell", "vec").coalesce(1).write.parquet(s"$dir/b2")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true").format("parquet").load(dir)
      .as[(Long, Array[Double])]
      .groupByKey(_._1).mapValues(_._2)
      .agg(CFAggregator.toColumn.name("cf"))
    val name = s"fitsk_${System.nanoTime()}"
    val q = src.toDF("cell", "cf").writeStream
      .format("memory").queryName(name)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2)
    val snapshot = spark.table(name).as[(Long, CF)]
    val h = Hdbscan(minPts = 4, minClusterSize = 4)
    val fromStream = h.fitSketch(snapshot)
      .select(col("bubble_id"), col("label")).as[(Long, Int)]
      .collect().sortBy(_._1).toSeq
    spark.catalog.dropTempView(name)
    val fromBatch = h.fitSketch(cfOf(data))
      .select(col("bubble_id"), col("label")).as[(Long, Int)]
      .collect().sortBy(_._1).toSeq
    assert(fromStream == fromBatch)
  }
}
