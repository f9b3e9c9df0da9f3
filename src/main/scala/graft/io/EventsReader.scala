package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType, TimestampNTZType, TimestampType}

/** The single entry point for the `events` table, batch and streaming.
  *
  * The driver's testdata has shipped `events.parquet`'s `ts` column under two
  * physical encodings over time:
  *
  *   - parquet TIMESTAMP(NANOS), which Spark can only surface as int64 via
  *     `spark.sql.legacy.parquet.nanosAsLong` (rounds ≤5), and
  *   - parquet timestamp[us] (isAdjustedToUTC=false), which Spark reads
  *     natively as TIMESTAMP_NTZ (round 6 testdata regeneration).
  *
  * Hard-coding either encoding breaks the moment the data regenerates under
  * the other (round 6 lost 13 queries this way). So: inspect the loaded
  * schema ONCE and normalize `ts` to an instant-semantics TimestampType in
  * microseconds. The library pins the session timezone to UTC
  * ([[graft.GraftSession]]), so the NTZ→timestamp cast is an identity on the
  * stored micros value — exactly what DuckDB's `epoch_ms/epoch_ns` see when
  * the oracle reads the same file.
  */
object EventsReader {

  /** ts-normalizing projection for a raw events schema; `None` if `ts` is
    * already instant-semantics micros. */
  private def tsNormalizer(schema: StructType): Option[Column] =
    schema("ts").dataType match {
      case LongType          => Some(timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType  => Some(col("ts").cast(TimestampType))
      case TimestampType     => None
      case other => throw new IllegalArgumentException(
        s"events.ts has unsupported physical type $other " +
          "(expected int64 nanos, timestamp[us]/NTZ, or timestamp)")
    }

  private def normalize(df: DataFrame): DataFrame =
    tsNormalizer(df.schema).map(df.withColumn("ts", _)).getOrElse(df)

  /** Batch events scan with `ts` normalized to TimestampType micros. */
  def batch(spark: SparkSession, dir: String): DataFrame = {
    // harmless when ts is already a timestamp; required for legacy nanos data
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalize(spark.read.parquet(s"$dir/events.parquet"))
  }

  /** Streaming events scan (file source over the sf dir, globbed to the
    * events file) with the same `ts` normalization as [[batch]]. */
  def stream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    normalize(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").format("parquet").load(dir))
  }
}
