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

  /** S9: split multi-line string values into one record per line (the
    * reference's `flatmappers/ReaderDataset.java:18-20`) — declarative
    * explode(split), no flatMap closure. */
  def splitLines(df: DataFrame, textCol: String = "value"): DataFrame =
    df.select(explode(split(col(textCol), "\n")).as("line"))
      .filter(length(trim(col("line"))) > 0)

  /** Constraints CSV `pointA,pointB,{ml|cl}` → (point_a, point_b, ctype). */
  def readConstraints(spark: SparkSession, path: String): DataFrame =
    spark.read.schema("point_a LONG, point_b LONG, ctype STRING").csv(path)

  /** `label,birthLevel,deathLevel,stability,gamma,virtualChildGamma,charOffset,parent`
    * per cluster-tree node — all 8 reference columns
    * (`HDBSCANStar.java:445-469`, Main.java help text). The gamma pair is
    * `0.5 * numConstraintsSatisfied / |constraints|` when the tree carries
    * `gamma`/`vc_gamma` columns (constrained runs); otherwise 0, exactly as
    * the reference writes when constraints == null. charOffset is the byte
    * offset of the hierarchy-CSV line where the cluster first appears,
    * derived from `levels` (the frame [[writeHierarchyCsv]] consumes — the
    * reference tracks the offset while writing that file); 0 when no
    * hierarchy is written alongside. */
  def writeTreeCsv(tree: DataFrame, path: String, levels: Option[DataFrame] = None): Unit = {
    val spark = tree.sparkSession
    import spark.implicits._
    val offsets: Map[Int, Long] = levels match {
      case None => Map.empty
      case Some(lv) =>
        // hierarchy files are driver-renderable by design (≤ #levels lines;
        // the reference writes them single-threaded too)
        val lines = lv.orderBy(col("level_eps").desc)
          .select(concat_ws(",", col("level_eps"), col("labels_csv")))
          .as[String].collect()
        val first = scala.collection.mutable.Map[Int, Long]()
        var off = 0L
        for (line <- lines) {
          line.split(",").iterator.drop(1).foreach { s =>
            val l = s.toInt
            if (l != 0 && !first.contains(l)) first(l) = off
          }
          off += line.getBytes("UTF-8").length + 1
        }
        first.toMap
    }
    val gammaCol = if (tree.columns.contains("gamma")) col("gamma") else lit(0)
    val vcCol = if (tree.columns.contains("vc_gamma")) col("vc_gamma") else lit(0)
    val base = tree.select(col("label"), col("birth_eps"), col("death_eps"),
      col("stability"), gammaCol.as("gamma"), vcCol.as("vc_gamma"), col("parent"))
    val withOff =
      if (offsets.isEmpty) base.withColumn("char_offset", lit(0L))
      else base.join(broadcast(offsets.toSeq.toDF("label", "char_offset")), Seq("label"), "left")
        .withColumn("char_offset", coalesce(col("char_offset"), lit(0L)))
    withOff.select(col("label"), col("birth_eps"), col("death_eps"), col("stability"),
        col("gamma"), col("vc_gamma"), col("char_offset"), col("parent"))
      .orderBy(col("label"))
      .coalesce(1).write.mode("overwrite").option("header", "false").csv(path)
  }

  /** Flat partition: ONE line `<label obj 1>,...,<label obj n>` in id order.
    * The ordering happens INSIDE the aggregate (array_sort over (id, label)
    * structs): collect_list does NOT preserve input order when the final
    * single-group aggregate merges map-side partials from several
    * partitions, so a pre-aggregate orderBy is not enough (ADVICE r1). */
  def writePartitionCsv(points: DataFrame, path: String): Unit = {
    val line = points
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("id"), col("label")))),
          x => x.getField("label").cast("string")), ",").as("line"))
    line.coalesce(1).write.mode("overwrite").text(path)
  }

  /** Outlier scores: `score,id` ascending by (score, core_dist, id) —
    * `hdbscanstar/OutlierScore.java:36-50` sort order. */
  def writeOutlierScoresCsv(points: DataFrame, path: String): Unit =
    points.select(col("outlier_score"), col("core_dist"), col("id"))
      .orderBy(col("outlier_score"), col("core_dist"), col("id"))
      .select(col("outlier_score"), col("id"))
      .coalesce(1).write.mode("overwrite").option("header", "false").csv(path)

  /** Hierarchy: per line `<epsilon level>,<label 1>,...,<label n>`, levels
    * descending, terminated by the reference's bare `0` line
    * (`HDBSCANStar.java:441`). */
  def writeHierarchyCsv(levels: DataFrame, path: String): Unit = {
    val spark = levels.sparkSession
    import spark.implicits._
    levels.orderBy(col("level_eps").desc)
      .select(concat_ws(",", col("level_eps"), col("labels_csv")).as("line"))
      .unionAll(Seq("0").toDF("line"))
      .coalesce(1).write.mode("overwrite").text(path)
  }

  /** Visualization sidecar: `{0|1}\n<hierarchy line count>`; the line count
    * includes the trailing `0` line, as the reference counts it. */
  def writeVisualization(spark: SparkSession, compact: Boolean, lineCount: Long, path: String): Unit = {
    import spark.implicits._
    Seq((if (compact) "1" else "0") + "\n" + lineCount.toString)
      .toDF("v").coalesce(1).write.mode("overwrite").text(path)
  }
}
