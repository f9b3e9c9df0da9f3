package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming surface — additive over the reference (which has no
  * streaming, SURVEY §2.12). The `events` table is treated as a bounded
  * stream (Trigger.AvailableNow) so the same tumbling-window aggregation is
  * checkable against the batch oracle.
  */
object StreamingOps {

  /** Hourly tumbling-window counts/sums over the events stream. Runs the
    * stream to completion (AvailableNow) and returns the final result —
    * semantically identical to the batch `Relational.eventsHourly`.
    */
  def eventsHourlyStream(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    // nanosecond parquet timestamps: read as long, convert (see Relational.events)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(path).schema
    // file-stream sources need a directory: stream the sf dir, glob to events
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").format("parquet").load(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("raw_sum"))
    val name = s"events_hourly_${System.nanoTime()}"
    val q = stream.writeStream
      .format("memory").queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
      .select(col("window.start").as("hour"), col("event_type"),
        col("cnt"), round(col("raw_sum"), 3).as("sum_value"))
      .orderBy(col("hour"), col("event_type"))
  }
}
