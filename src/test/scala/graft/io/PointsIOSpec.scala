package graft.io

import java.nio.file.{Files, Paths}
import graft.SparkTestBase
import graft.hdbscan.Hdbscan
import org.apache.spark.sql.functions._

class PointsIOSpec extends SparkTestBase {

  private def tmpDir(): String = Files.createTempDirectory("graft_io").toString

  test("readPointsText: whitespace matrix with deterministic ids") {
    val f = Paths.get(tmpDir(), "pts.txt")
    Files.writeString(f, "1.0 2.0 3.0\n4.0 5.0 6.0\n7.5 8.5 9.5\n")
    val df = PointsIO.readPointsText(spark, f.toString)
    val rows = df.orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    assert(rows(1).getSeq[Double](1) == Seq(4.0, 5.0, 6.0))
  }

  test("readPointsText: tab-separated with label column split off") {
    val f = Paths.get(tmpDir(), "skin.txt")
    Files.writeString(f, "74\t85\t123\t1\n73\t84\t122\t2\n")
    val df = PointsIO.readPointsText(spark, f.toString, labelCol = Some("truth"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getSeq[Double](1) == Seq(74.0, 85.0, 123.0))
    assert(rows(0).getInt(2) == 1 && rows(1).getInt(2) == 2)
  }

  test("splitLines: multi-line values explode to one trimmed record per line") {
    import spark.implicits._
    val df = Seq("a b\nc d\n\n e ", "single").toDF("value")
    val lines = PointsIO.splitLines(df).collect().map(_.getString(0))
    assert(lines.toSeq.sorted == Seq(" e ", "a b", "c d", "single"))
  }

  test("result writers produce the reference CSV shapes") {
    import spark.implicits._
    val out = tmpDir()
    val points = Seq((0L, 1, 0.1, 0.5), (1L, 1, 0.2, 0.4), (2L, 0, 0.9, 1.5))
      .toDF("id", "label", "outlier_score", "core_dist")

    PointsIO.writePartitionCsv(points, s"$out/part")
    val partLine = spark.read.text(s"$out/part").collect().map(_.getString(0))
    assert(partLine.toSeq == Seq("1,1,0"))

    // order must hold on multi-partition input too (the aggregate sorts
    // internally; collect_list merge order is nondeterministic — ADVICE r1)
    val shuffled = Seq((4L, 4), (0L, 0), (2L, 2), (3L, 3), (1L, 1))
      .toDF("id", "label").repartition(5)
    PointsIO.writePartitionCsv(shuffled, s"$out/part_mp")
    val mp = spark.read.text(s"$out/part_mp").collect().map(_.getString(0))
    assert(mp.toSeq == Seq("0,1,2,3,4"), s"got ${mp.toSeq}")

    PointsIO.writeOutlierScoresCsv(points, s"$out/outl")
    val outl = spark.read.text(s"$out/outl").collect().map(_.getString(0))
    assert(outl.head.startsWith("0.1,") && outl.last.startsWith("0.9,"))

    // all 8 reference columns: label,birth,death,stability,gamma,vcGamma,charOffset,parent
    val tree = Seq((1, 0, 2.0, 0.5, 3.2, 10.0, 0)).toDF(
      "label", "parent", "birth_eps", "death_eps", "stability", "size", "flat_label")
    PointsIO.writeTreeCsv(tree, s"$out/tree")
    assert(spark.read.text(s"$out/tree").collect().head.getString(0) == "1,2.0,0.5,3.2,0,0,0,0")

    // charOffset = byte offset of the hierarchy line where the label first appears
    val tree3 = Seq((1, 0, 5.0, 2.0, 1.0, 3.0, 0), (2, 1, 2.0, 1.0, 0.5, 2.0, 1),
        (3, 1, 2.0, 1.0, 0.4, 1.0, 2))
      .toDF("label", "parent", "birth_eps", "death_eps", "stability", "size", "flat_label")
    val levels = Seq((5.0, "1,1,1"), (2.0, "2,3,0")).toDF("level_eps", "labels_csv")
    PointsIO.writeTreeCsv(tree3, s"$out/tree_off", Some(levels))
    val rows = spark.read.text(s"$out/tree_off").collect().map(_.getString(0)).sorted
    assert(rows(0) == "1,5.0,2.0,1.0,0,0,0,0", rows(0))
    assert(rows(1) == "2,2.0,1.0,0.5,0,0,10,1", rows(1)) // "5.0,1,1,1\n" = 10 bytes
    assert(rows(2) == "3,2.0,1.0,0.4,0,0,10,1", rows(2))
  }

  test("end-to-end result files: reference shapes, vis line count, compact switch") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    val centers = Array.fill(3, 4)(rng.nextDouble() * 30.0)
    val data = (0 until 90).map { i =>
      (i.toLong, centers(i % 3).map(c => c + rng.nextGaussian() * 0.2))
    }.toDF("id", "features")
    val out = tmpDir()
    val clusterer = Hdbscan(minPts = 4, minClusterSize = 8)
    val model = clusterer.fitModel(data)

    PointsIO.writePartitionCsv(model.points, s"$out/partition")
    val part = spark.read.text(s"$out/partition").collect().map(_.getString(0))
    assert(part.length == 1 && part.head.split(",").length == 90)

    PointsIO.writeOutlierScoresCsv(model.points, s"$out/outliers")
    val outl = spark.read.text(s"$out/outliers").collect().map(_.getString(0))
    assert(outl.length == 90 && outl.forall(_.split(",").length == 2))
    val scores = outl.map(_.split(",")(0).toDouble)
    assert(scores.zip(scores.tail).forall { case (a, b) => a <= b }, "ascending by score")

    PointsIO.writeHierarchyCsv(model.levels, s"$out/hierarchy")
    val hier = spark.read.text(s"$out/hierarchy").collect().map(_.getString(0))
    assert(hier.last == "0", "reference's bare terminating 0 line")
    val levelLines = hier.dropRight(1)
    assert(levelLines.forall(_.split(",").length == 91)) // eps + 90 labels
    val epss = levelLines.map(_.split(",")(0).toDouble)
    assert(epss.zip(epss.tail).forall { case (a, b) => a > b }, "levels descending")
    // the last LEVEL line is all-noise
    assert(levelLines.last.split(",").drop(1).forall(_ == "0"))

    PointsIO.writeTreeCsv(model.tree, s"$out/tree", Some(model.levels))
    val tre = spark.read.text(s"$out/tree").collect().map(_.getString(0))
    assert(tre.forall(_.split(",").length == 8), "8 reference columns")

    PointsIO.writeVisualization(spark, compact = false, hier.length.toLong, s"$out/vis")
    val vis = spark.read.text(s"$out/vis").collect().map(_.getString(0))
    assert(vis.toSeq == Seq("0", hier.length.toString))

    // compact hierarchy: subset of the full level set, same terminator, and
    // every new-cluster birth level is present
    val compactModel = clusterer.fitModel(data, compactHierarchy = true)
    PointsIO.writeHierarchyCsv(compactModel.levels, s"$out/ch")
    val ch = spark.read.text(s"$out/ch").collect().map(_.getString(0))
    assert(ch.last == "0")
    assert(ch.length <= hier.length)
    val fullEps = levelLines.map(_.split(",")(0)).toSet
    val compactEps = ch.dropRight(1).map(_.split(",")(0)).toSet
    assert(compactEps.subsetOf(fullEps))
    val birthEps = model.tree.select("birth_eps").as[Double].collect().map(_.toString).toSet
    assert(birthEps.subsetOf(compactEps), s"missing birth levels: ${birthEps -- compactEps}")
  }

  test("fitModel: tree + hierarchy levels invariants on gaussian blobs") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val centers = Array.fill(3, 4)(rng.nextDouble() * 30.0)
    val data = (0 until 240).map { i =>
      (i.toLong, centers(i % 3).map(c => c + rng.nextGaussian() * 0.2))
    }
    val model = Hdbscan(minPts = 4, minClusterSize = 8, maxLocalSize = 100)
      .fitModel(data.toDF("id", "features"))
    val tree = model.tree.collect()
    assert(tree.exists(_.getAs[Int]("parent") == 0), "root present")
    val flatLabels = tree.map(_.getAs[Int]("flat_label")).filter(_ != 0).toSet
    assert(flatLabels == Set(1, 2, 3), s"flat labels in tree: $flatLabels")
    // stability finite and non-negative for selected clusters
    assert(tree.filter(_.getAs[Int]("flat_label") != 0)
      .forall(r => r.getAs[Double]("stability") >= 0))
    val levels = model.levels.orderBy(col("level_eps").desc).collect()
    assert(levels.length > 1)
    // top level: nothing is noise in more clusters than bottom; last level all noise
    val last = levels.last.getAs[String]("labels_csv").split(",").toSet
    assert(last == Set("0"), s"last level labels: $last")
    // labels agree between model.points and a plain fit
    val fitLabels = Hdbscan(minPts = 4, minClusterSize = 8, maxLocalSize = 100)
      .fit(data.toDF("id", "features"))
      .select("id", "label").as[(Long, Int)].collect().toMap
    val modelLabels = model.points.select("id", "label").as[(Long, Int)].collect().toMap
    assert(fitLabels == modelLabels)
  }

  test("constraints: ml/cl satisfaction accounting") {
    import spark.implicits._
    val labels = Seq((0L, 1), (1L, 1), (2L, 2), (3L, 0)).toDF("id", "label")
    val cons = Seq((0L, 1L, "ml"), (0L, 2L, "ml"), (0L, 2L, "cl"), (0L, 1L, "cl"), (0L, 3L, "cl"))
      .toDF("point_a", "point_b", "ctype")
    val s = graft.operators.Constraints.summary(cons, labels).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(s("ml") == ((2L, 1L))) // only (0,1) same non-noise cluster
    assert(s("cl") == ((3L, 2L))) // (0,2) differ OK, (0,1) same BAD, (0,3) noise OK
  }
}
