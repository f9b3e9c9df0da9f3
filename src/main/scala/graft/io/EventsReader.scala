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
    * already instant-semantics micros. `sampleTs` supplies one non-null raw
    * int64 value so the nanos assumption can be magnitude-checked instead of
    * silently mis-scaling by 1000x if the testdata regenerates as plain
    * micros/millis int64 (the round-6 drift class, quieter form). */
  private def tsNormalizer(schema: StructType, sampleTs: => Option[Long]): Option[Column] =
    schema("ts").dataType match {
      case LongType =>
        // epoch-nanos for any plausible event date (1973..2128) sit in
        // [1e17, 5e18]; epoch-micros/millis/seconds are orders of magnitude
        // smaller. Anything outside the band is NOT nanos — fail loudly.
        sampleTs.foreach { v =>
          if (v < 1e17.toLong || v > 5e18.toLong)
            throw new IllegalArgumentException(
              s"events.ts is int64 but a sampled value $v is not plausible " +
                "epoch-nanos (expected ~1e18); refusing to divide by 1000 — " +
                "the testdata encoding has drifted, update EventsReader")
        }
        Some(timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType  => Some(col("ts").cast(TimestampType))
      case TimestampType     => None
      case other => throw new IllegalArgumentException(
        s"events.ts has unsupported physical type $other " +
          "(expected int64 nanos, timestamp[us]/NTZ, or timestamp)")
    }

  private def normalize(df: DataFrame, sampleTs: => Option[Long]): DataFrame =
    tsNormalizer(df.schema, sampleTs).map(df.withColumn("ts", _)).getOrElse(df)

  /** One non-null raw ts value from a batch frame (tiny limit-1 job; only
    * ever invoked on the int64 branch). */
  private def probe(raw: DataFrame): Option[Long] =
    raw.select(col("ts")).where(col("ts").isNotNull).limit(1)
      .collect().headOption.map(_.getLong(0))

  /** Batch events scan with `ts` normalized to TimestampType micros. */
  def batch(spark: SparkSession, dir: String): DataFrame = {
    // harmless when ts is already a timestamp; required for legacy nanos data
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    normalize(raw, probe(raw))
  }

  /** Streaming events scan (file source over the sf dir, globbed to the
    * events file) with the same `ts` normalization as [[batch]]. */
  def stream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batchView = spark.read.parquet(s"$dir/events.parquet")
    normalize(
      spark.readStream.schema(batchView.schema)
        .option("pathGlobFilter", "events.parquet").format("parquet").load(dir),
      probe(batchView))
  }
}
