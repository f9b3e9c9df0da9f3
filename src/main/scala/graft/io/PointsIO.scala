package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reference-native IO: whitespace/delimited point matrices, constraints
  * files, and the five result-CSV writers (formats per FIXTURES.md §2,
  * reference `main/Main.java:552-612` + `hdbscanstar/HDBSCANStar.java:567-686`).
  *
  * Unlike the reference's parser (a per-JVM mutable row counter that
  * miscounts under >1 partition, `mappers/MapperDataset_github.java:12-21`),
  * ids here come from `zipWithIndex` — deterministic in file order at any
  * parallelism.
  */
object PointsIO {

  /** Read a delimited text point matrix → (id BIGINT, features ARRAY<DOUBLE>).
    * Default delimiter splits on any whitespace run, which also fixes the
    * reference's inability to read its own tab-separated Skin_NonSkin.txt
    * (`split(" ")`, MapperDataset_github.java:13).
    *
    * @param labelCol if set, the LAST column is split off under this name
    *                 (ground-truth labels, e.g. Skin_NonSkin) */
  def readPointsText(
      spark: SparkSession,
      path: String,
      delimiter: String = "\\s+",
      labelCol: Option[String] = None): DataFrame = {
    import spark.implicits._
    val raw = spark.sparkContext.textFile(path)
      .map(_.trim).filter(_.nonEmpty)
      .zipWithIndex()
      .map { case (line, id) => (id, line.split(delimiter).map(_.toDouble)) }
      .toDF("id", "all")
    labelCol match {
      case None => raw.select(col("id"), col("all").as("features"))
      case Some(lc) => raw.select(col("id"),
        slice(col("all"), lit(1), size(col("all")) - 1).as("features"),
        element_at(col("all"), -1).cast("int").as(lc))
    }
  }

  /** Constraints CSV `pointA,pointB,{ml|cl}` → (point_a, point_b, ctype). */
  def readConstraints(spark: SparkSession, path: String): DataFrame =
    spark.read.schema("point_a LONG, point_b LONG, ctype STRING").csv(path)

  /** `label,birthLevel,deathLevel,stability,parent` per cluster-tree node. */
  def writeTreeCsv(tree: DataFrame, path: String): Unit =
    tree.select(col("label"), col("birth_eps"), col("death_eps"),
        col("stability"), col("parent"))
      .orderBy(col("label"))
      .coalesce(1).write.mode("overwrite").option("header", "false").csv(path)

  /** Flat partition: ONE line `<label obj 1>,...,<label obj n>` in id order. */
  def writePartitionCsv(points: DataFrame, path: String): Unit = {
    val line = points.orderBy(col("id"))
      .agg(array_join(collect_list(col("label")), ",").as("line"))
    line.coalesce(1).write.mode("overwrite").text(path)
  }

  /** Outlier scores: `score,id` ascending by (score, core_dist, id) —
    * `hdbscanstar/OutlierScore.java:36-50` sort order. */
  def writeOutlierScoresCsv(points: DataFrame, path: String): Unit =
    points.select(col("outlier_score"), col("core_dist"), col("id"))
      .orderBy(col("outlier_score"), col("core_dist"), col("id"))
      .select(col("outlier_score"), col("id"))
      .coalesce(1).write.mode("overwrite").option("header", "false").csv(path)

  /** Hierarchy: per line `<epsilon level>,<label 1>,...,<label n>`. */
  def writeHierarchyCsv(levels: DataFrame, path: String): Unit =
    levels.select(concat_ws(",", col("level_eps"), col("labels_csv")))
      .coalesce(1).write.mode("overwrite").text(path)

  /** Visualization sidecar: `{0|1}\n<hierarchy line count>`. */
  def writeVisualization(spark: SparkSession, compact: Boolean, lineCount: Long, path: String): Unit = {
    import spark.implicits._
    Seq((if (compact) "1" else "0") + "\n" + lineCount.toString)
      .toDF("v").coalesce(1).write.mode("overwrite").text(path)
  }
}
