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
      // default: one shuffle partition per core (AQE coalesces down).
      // SPARK_GRAFT_SHUFFLE_PARTITIONS overrides for scale experiments —
      // past ~10× the gate SF, per-partition shuffle blocks outgrow the
      // local executor's storage fraction and spill; more (smaller)
      // partitions restore the in-memory regime, exactly as a real
      // cluster's core count would
      .config("spark.sql.shuffle.partitions",
        sys.env.get("SPARK_GRAFT_SHUFFLE_PARTITIONS").map(_.toInt).getOrElse(cpus))
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)

  def local(appName: String = "graft", cpus: Int = 32): SparkSession =
    localBuilder(appName, cpus).getOrCreate()

  /** Run `body` with `spark.sql.shuffle.partitions` scoped to `n`,
    * restoring the previous value after.
    *
    * Primary use: sizing the STATE-SHARD count of streaming queries
    * started inside `body` (state partitioning is fixed to the shuffle
    * partition count at a checkpoint's first batch). A stateful
    * micro-batch pays a fixed per-shard state-store open/commit/file cost
    * per batch, so when each shard would hold only a few thousand rows the
    * shard count IS the latency: the sf0.1 attribution replay measures
    * 5.6 s at 32 shards vs 2.1 s at 8 for identical results. On a real
    * cluster the session default (sized to executors × cores) applies —
    * pick `n` to give each shard meaningful state, exactly like sizing
    * shuffle partitions for batch. */
  def withShufflePartitions[T](spark: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, prev)
  }
}
