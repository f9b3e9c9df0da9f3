package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The testdata-drift guard: pinned-VALUES oracles are captured against one
  * corpus, and regenerated testdata must be diagnosed loudly (rounds 5→6
  * lost a full round to a silent `events.ts` re-encoding). */
class TestdataFingerprintSpec extends SparkTestBase {

  test("fingerprint is order- and partitioning-independent, content-sensitive") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i, s"v$i")).toDF("id", "v")
    val a = TestdataFingerprint.fingerprint(df.repartition(7))
    val b = TestdataFingerprint.fingerprint(df.orderBy(col("v").desc).repartition(2))
    assert(a == b, "same content must fingerprint identically regardless of layout")
    val c = TestdataFingerprint.fingerprint(
      df.withColumn("v", when(col("id") === 500L, lit("CHANGED")).otherwise(col("v"))))
    assert(a != c, "a one-row change must move the fingerprint")
  }

  test("render/parse round-trips and drift reports exactly the changed table") {
    import spark.implicits._
    val all = Map("sf0.01" -> Map("region" -> (5L, 42L), "nation" -> (25L, -7L)))
    assert(TestdataFingerprint.parse(TestdataFingerprint.render(all)).contains(all))

    // synthetic sf dir with one standard-named table
    val sfDir = Files.createTempDirectory("fp").resolve("sf_test")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.parquet(sfDir.resolve("region.parquet").toString)
    val recorded = TestdataFingerprint.fingerprintDir(spark, sfDir.toString)
    val baseline = Files.createTempFile("fprint", ".json")
    Files.writeString(baseline,
      TestdataFingerprint.render(Map("sf_test" -> recorded)))
    assert(TestdataFingerprint.drift(spark, sfDir.toString, baseline.toString).isEmpty,
      "unchanged data must report no drift")

    // regenerate the table with different content → drift names it
    Seq((1L, "a"), (2L, "DIFFERENT")).toDF("k", "v")
      .write.mode("overwrite").parquet(sfDir.resolve("region.parquet").toString)
    val drift = TestdataFingerprint.drift(spark, sfDir.toString, baseline.toString)
    assert(drift.size == 1 && drift.head.startsWith("region:"), s"got $drift")

    // unknown sf key or missing baseline → silent (no false alarms)
    assert(TestdataFingerprint.drift(spark, sfDir.toString, "/nonexistent.json").isEmpty)
  }
}
