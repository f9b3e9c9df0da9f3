package graft.hdbscan

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** End-to-end fidelity proof on the system being rebuilt: the reference's
  * own shipped dataset (`数据集/dataset.txt`, 150×4) clustered under the
  * reference's default configuration (`源代码/main/Main.java:71-73`:
  * minPts=4, minClSize=4, euclidean, compact=true) — SURVEY §5 test-plan
  * item 3. Flat partition, outlier-score ranking, and the reference's own
  * CSV output formats are compared against committed goldens produced by
  * the exact kernel; core distances are independently hash-checked against
  * DuckDB by the q_ref_dataset oracle.
  *
  * Regenerate goldens with: GRAFT_REGEN=1 sbt "testOnly *RefDatasetSpec"
  * (writes to src/test/resources/golden/, then inspect + commit).
  */
class RefDatasetSpec extends SparkTestBase {

  private val goldenDir = "src/test/resources/golden"

  private def readGolden(name: String): String = {
    val res = getClass.getResourceAsStream(s"/golden/$name")
    assert(res != null, s"missing golden resource /golden/$name — run with GRAFT_REGEN=1 first")
    try scala.io.Source.fromInputStream(res, "UTF-8").mkString finally res.close()
  }

  private def readPartFile(dir: String, ext: String): String = {
    val d = new java.io.File(dir)
    val part = d.listFiles().filter(f => f.getName.startsWith("part-")).sortBy(_.getName)
    part.map(f => new String(Files.readAllBytes(f.toPath), "UTF-8")).mkString
  }

  private lazy val fitted = {
    val pts = graft.io.PointsIO.readPointsText(spark, graft.SparkEntry.refDatasetPath())
    assert(pts.count() == 150, "reference dataset.txt is 150 points (149 newlines, no trailing one)")
    Hdbscan(minPts = 4, minClusterSize = 4).fit(pts)
      .select(col("id"), col("label"), round(col("outlier_score"), 6).as("outlier_score"),
        round(col("core_dist"), 6).as("core_dist"))
      .orderBy(col("id"))
      .cache()
  }

  private def pointsCsv: String = fitted.collect()
    .map(r => s"${r.getLong(0)},${r.getInt(1)},${r.getDouble(2)},${r.getDouble(3)}")
    .mkString("", "\n", "\n")

  private def partitionCsv: String = {
    val dir = Files.createTempDirectory("ref_partition").toString
    graft.io.PointsIO.writePartitionCsv(fitted, dir)
    readPartFile(dir, "txt")
  }

  private def outliersCsv: String = {
    val dir = Files.createTempDirectory("ref_outliers").toString
    graft.io.PointsIO.writeOutlierScoresCsv(fitted, dir)
    readPartFile(dir, "csv")
  }

  test("reference dataset golden: flat partition + outlier scores + CSV writers") {
    if (sys.env.contains("GRAFT_REGEN")) {
      Files.createDirectories(Paths.get(goldenDir))
      Files.write(Paths.get(goldenDir, "ref_dataset_points.csv"), pointsCsv.getBytes("UTF-8"))
      Files.write(Paths.get(goldenDir, "ref_dataset_partition.csv"), partitionCsv.getBytes("UTF-8"))
      Files.write(Paths.get(goldenDir, "ref_dataset_outliers.csv"), outliersCsv.getBytes("UTF-8"))
      fail(s"GRAFT_REGEN set: goldens regenerated into $goldenDir — inspect and commit, then rerun without GRAFT_REGEN")
    }
    assert(pointsCsv == readGolden("ref_dataset_points.csv"))
    assert(partitionCsv == readGolden("ref_dataset_partition.csv"))
    assert(outliersCsv == readGolden("ref_dataset_outliers.csv"))
  }

  test("reference dataset structure: real clusters, sane scores") {
    val rows = fitted.collect()
    val labels = rows.map(_.getInt(1))
    val clusters = labels.filter(_ > 0).distinct
    assert(clusters.length >= 2, s"expected >=2 clusters on the iris-like data, got ${clusters.toSeq}")
    // the first 50 points are the well-separated species: they must land in
    // ONE cluster together (no split, no noise majority)
    val first50 = labels.take(50)
    val dominant = first50.groupBy(identity).maxBy(_._2.length)
    assert(dominant._1 > 0 && dominant._2.length >= 48,
      s"first 50 points should share one real cluster, got ${first50.toSeq.distinct}")
    assert(rows.forall(r => r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
    assert(rows.forall(_.getDouble(3) > 0.0), "150 distinct-ish points: core distances positive")
  }
}
