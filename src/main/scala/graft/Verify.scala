package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Dump one query's result to `outDir/name` as parquet. On ANY failure
    * (analysis or runtime), dump a one-row parquet whose schema is the
    * sentinel column `graft_error` instead — a broken query must yield an
    * ERR ROW in the round artifact, not a silently missing key (round 6
    * lost 13 queries that way: the driver's compare reports the sentinel
    * as an explicit schema/hash mismatch carrying the failure text).
    * Returns the failure message, if any.
    */
  def dumpOne(spark: SparkSession, name: String,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
      sfDir: String, outDir: String): Option[String] =
    try {
      fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      None
    } catch { case e: Throwable =>
      val msg = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}"
      System.err.println(s"[verify] $name failed: $msg")
      try {
        import spark.implicits._
        Seq(msg).toDF("graft_error").coalesce(1)
          .write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e2: Throwable =>
        System.err.println(s"[verify] $name error-row dump also failed: ${e2.getMessage}")
      }
      Some(msg)
    }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, rest @ _*) = args: @unchecked
    // optional extra args: substring filters to dump a query subset (the
    // oracle_sql.json is always written in full)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local("graft-verify", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // drift guard: pinned-VALUES oracles are captured against ONE corpus;
    // a regenerated testdata turns them into confusing red rows (rounds
    // 5→6 lost a full round to exactly this). Diagnose it up front.
    val drift = try TestdataFingerprint.drift(spark, sfDir, "TESTDATA_FPRINT.json")
      catch { case e: Throwable =>
        System.err.println(s"[verify] fingerprint check failed: ${e.getMessage}"); Nil }
    if (drift.nonEmpty) {
      System.err.println("[verify] TESTDATA DRIFT vs committed TESTDATA_FPRINT.json — " +
        "pinned oracles may be stale; re-capture them and refresh the fingerprint:")
      drift.foreach(d => System.err.println(s"[verify]   $d"))
      Files.writeString(Paths.get(s"$outDir/testdata_drift.json"),
        drift.mkString("[\"", "\",\n \"", "\"]"))
    }
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries
      .filter(q => rest.isEmpty || rest.exists(q._1.contains))
      .foreach { case (name, fn) =>
      dumpOne(spark, name, fn, sfDir, outDir).foreach(failures(name) = _)
      SessionHygiene.sweep(spark)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // machine-readable failure summary next to the dumps (empty map = clean)
    val errJson = failures.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    spark.stop()
    if (failures.nonEmpty)
      System.err.println(s"[verify] ${failures.size} queries failed: ${failures.keys.mkString(", ")}")
  }
}
