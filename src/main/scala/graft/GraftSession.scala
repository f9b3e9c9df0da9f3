package graft

import org.apache.spark.sql.SparkSession

/** The library's session entry point: a SparkSession builder pre-configured
  * for the engine's target regime (100 TB inputs, 1000-executor clusters),
  * with local-mode overrides for the test/bench harness.
  *
  * Why each knob (all standard Spark configuration, tuned not invented):
  *  - AQE on, with coalescing and skew-join splitting: runtime re-planning
  *    is the first line of defense against skew and over-partitioning at
  *    scale; the engine's salting operator covers keys hotter than AQE's
  *    split thresholds.
  *  - `shuffle.partitions` sized to total cores (driver default 32 locally)
  *    rather than Spark's legacy 200: AQE coalesces down, but the upper
  *    bound should track the cluster, not a constant.
  *  - `files.maxPartitionBytes` 256m: fewer, fuller scan tasks — parquet
  *    footer/dictionary overhead amortizes, and 256m × ~2 inflation stays
  *    inside executor memory at default 4-8 GiB/core.
  *  - broadcast threshold 64m: dimension tables (nation/part/centroids/
  *    constraint frames) should broadcast aggressively; anything bigger
  *    flows through sort-merge with AQE deciding.
  *  - parquet nanos-as-long: tolerated for legacy TIMESTAMP(NANOS) data
  *    (harmless otherwise); the events table's encoding drift is handled
  *    schema-adaptively in [[graft.io.EventsReader]].
  */
object GraftSession {

  def builder(appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64L * 1024 * 1024)
      .config("spark.sql.files.maxPartitionBytes", 256L * 1024 * 1024)
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** Harness variant: local master, core-count shuffle parallelism, the
    * engine's SQL functions injected. */
  def localBuilder(appName: String = "graft", cpus: Int = 32): SparkSession.Builder =
    builder(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)

  def local(appName: String = "graft", cpus: Int = 32): SparkSession =
    localBuilder(appName, cpus).getOrCreate()
}
