package graft.io

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** The round-6 regression class: the testdata's `events.ts` physical
  * encoding changed under the engine and took down every ts-touching query.
  * This spec pins [[EventsReader]]'s contract — whatever the physical
  * encoding (int64 epoch-nanos, TIMESTAMP_NTZ micros, or instant
  * timestamp), `ts` comes back as the SAME instant-semantics TimestampType
  * micros, batch and streaming alike (session timezone is pinned UTC).
  */
class EventsReaderSpec extends graft.SparkTestBase {

  // three instants (micros) off the epoch — stateful streaming drops
  // watermark-equal epoch rows (BASELINE round-5 lesson)
  private val micros = Seq(1704067200000000L, 1704067223456789L, 1704070000000001L)

  /** Write df as a single FILE at dir/events.parquet (the testdata layout —
    * the streaming reader's pathGlobFilter matches file names, so a
    * directory-style dataset would be invisible to it). */
  private def writeEventsFile(df: DataFrame, dir: Path): String = {
    val staging = dir.resolve("staging")
    df.coalesce(1).write.parquet(staging.toString)
    val part = Files.list(staging).filter(_.getFileName.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.move(part, dir.resolve("events.parquet"))
    dir.toString
  }

  private def encodings: Map[String, String] = {
    import spark.implicits._
    val base = micros.toDF("us")
    Map(
      "int64-nanos" -> writeEventsFile(
        base.select((col("us") * 1000L).as("ts"), col("us").as("event_id")),
        Files.createTempDirectory("ev_nanos")),
      "timestamp_ntz" -> writeEventsFile(
        base.select(timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"),
          col("us").as("event_id")),
        Files.createTempDirectory("ev_ntz")),
      "timestamp" -> writeEventsFile(
        base.select(timestamp_micros(col("us")).as("ts"), col("us").as("event_id")),
        Files.createTempDirectory("ev_ts")))
  }

  test("batch: ts normalizes to identical TimestampType micros under all three encodings") {
    encodings.foreach { case (enc, dir) =>
      val df = EventsReader.batch(spark, dir)
      assert(df.schema("ts").dataType == TimestampType, s"$enc: wrong type")
      val got = df.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).sorted.toSeq
      assert(got == micros, s"$enc: micros drifted: $got")
    }
  }

  test("batch: int64 ts that is NOT plausible epoch-nanos is rejected loudly") {
    import spark.implicits._
    // plain epoch-MICROS stored as int64: the nanos assumption would silently
    // mis-scale by 1000x (ADVICE r7) — the magnitude guard must throw instead
    val dir = writeEventsFile(
      micros.toDF("us").select(col("us").as("ts"), col("us").as("event_id")),
      Files.createTempDirectory("ev_micros_as_int64"))
    val e = intercept[IllegalArgumentException](EventsReader.batch(spark, dir))
    assert(e.getMessage.contains("not plausible epoch-nanos"), e.getMessage)
  }

  test("stream: the same normalization holds on the readStream path") {
    encodings.foreach { case (enc, dir) =>
      val stream = EventsReader.stream(spark, dir)
      assert(stream.isStreaming, s"$enc: not a streaming frame")
      assert(stream.schema("ts").dataType == TimestampType, s"$enc: wrong type")
      val name = s"ev_reader_${enc.replace('-', '_')}_${System.nanoTime()}"
      val q = stream.select(unix_micros(col("ts")).as("us")).writeStream
        .format("memory").queryName(name).outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      val got = spark.table(name).collect().map(_.getLong(0)).sorted.toSeq
      spark.catalog.dropTempView(name)
      assert(got == micros, s"$enc: streamed micros drifted: $got")
    }
  }
}
