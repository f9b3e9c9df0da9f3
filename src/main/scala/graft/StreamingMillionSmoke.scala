package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Synthetic 1M-event streaming smoke — the streaming analogue of
  * [[DedupMillionSmoke]]/[[TextCurationMillionSmoke]]. The toy-SF streaming
  * specs prove state *semantics* (eviction, null emission, cross-batch
  * matching); this smoke proves state *boundedness* and batch-equivalence
  * at a size where unbounded buffering would be visible: 1M events spread
  * over 48 hours of event time, written as 24 time-ordered 2-hour parquet
  * slices and replayed file-by-file (`maxFilesPerTrigger=1`, AvailableNow)
  * so the watermark genuinely advances across 24 micro-batches instead of
  * jumping once.
  *
  * Three stateful pipelines, each asserting (a) exact equality with its
  * batch oracle computed on the same frame and (b) max state rows (from
  * `StreamingQueryProgress.stateOperators`) bounded by the watermark
  * horizon — a fraction of the stream — never by stream length:
  *
  *  1. `dropDuplicatesWithinWatermark` (1% planted dups, +2 min) chained
  *     into an hourly event-time window count — the multi-stateful-operator
  *     append path. Closed windows must equal the batch distinct-per-hour
  *     counts; dedup state ≈ watermark horizon of ids (2-hour slices ⇒
  *     ≲ 2 slices buffered), not 1M.
  *  2. `session_window` per user (30 min gap; per-user bursts ≥ 40 min
  *     apart ⇒ 4 sessions × 5 events per user). Closed sessions must equal the
  *     batch gaps-and-islands sessionization (strict `diff >= gap` break
  *     rule, matching the engine) under the finalization cutoff.
  *  3. the production stream-stream attribution join
  *     ([[streaming.StreamingOps.attributionJoin]]): every 10th event
  *     yields a purchase 0.5–7.5 h later (second time-ordered source);
  *     the inner join must equal the batch time-range join EXACTLY, with
  *     both sides' buffers bounded by delay + horizon of arrivals.
  */
object StreamingMillionSmoke {
  private val SliceHours = 2
  private val Slices = 24

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rmrf)
    f.delete(): Unit
  }

  private def maxStateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
    q.recentProgress.flatMap(p => Option(p.stateOperators).toSeq.flatten.map(_.numRowsTotal))
      .foldLeft(0L)(math.max)

  private def runAppend(df: DataFrame, name: String)(spark: SparkSession): (DataFrame, Long) = {
    val sink = s"${name}_${System.nanoTime()}"
    val q = df.writeStream.format("memory").queryName(sink)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val state = maxStateRows(q)
    val (out, _) = org.apache.spark.sql.GraftShim.materialize(spark.table(sink))
    spark.catalog.dropTempView(sink)
    (out, state)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = GraftSession.localBuilder("graft-streaming-million", 32)
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, n)
    spark.stop()
  }

  /** Body shared by [[main]] and the opt-in SmokeSuite. */
  def run(spark: SparkSession, n: Long): Unit = {
    import spark.implicits._

    val base = s"/tmp/graft_stream_million_$n"
    val eventsDir = s"$base/events"
    val purchDir = s"$base/purchases"
    rmrf(new java.io.File(base))

    // ---- generate: 50k users, 20 events each in 4 bursts ----
    // burst b of user u starts at 12h·b + (hash(u,b) mod 11h) — uniform
    // load over the whole 48h, while consecutive bursts of one user stay
    // ≥ 40 min apart (12h − 11h − 20min burst length) so the 30-min
    // session gap always breaks between bursts and never within (5-min
    // within-burst spacing).
    val users = 50000L
    val id = col("id")
    val user = pmod(id, lit(users))
    val seq0 = (id / users).cast("long")            // 0..19 per user
    val burst = (seq0 / 5).cast("long")             // 0..3
    val within = pmod(seq0, lit(5L))                // 0..4, 5min apart
    // +1 s base: a row whose event time EQUALS the initial watermark (epoch
    // 0) is dropped as late by stateful operators — a generator artifact,
    // not engine behavior worth testing
    val tsUs = (burst * 12L * 3600L + pmod(xxhash64(user, burst), lit(11L * 3600L)) +
      within * 300L + 1L) * 1000000L
    val gen = spark.range(n).select(
      id.as("event_id"), user.as("user_id"), tsUs.as("ts_us"),
      (rand(7) * 100).as("value"))
    // planted duplicates: every 100th event re-emitted 2 minutes later —
    // capped inside the original's hour, because dropDuplicatesWithinWatermark
    // keeps the arbitrary FIRST ARRIVAL and a survivor in the next hour
    // window would (correctly, but unhelpfully) shift two hourly cells
    val hourStart = col("ts_us") - pmod(col("ts_us"), lit(3600000000L))
    val dups = gen.where(pmod(col("event_id"), lit(100L)) === 7)
      .withColumn("ts_us",
        least(col("ts_us") + 120L * 1000000L, hourStart + 3599000000L))
    val events = gen.unionAll(dups)
      .select(col("event_id"), col("user_id"),
        timestamp_micros(col("ts_us")).as("ets"), col("value"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // purchases: every 10th event converts 0.5–7.5h later
    val purchases = gen.where(pmod(col("event_id"), lit(10L)) === 3)
      .select((col("event_id") + 10000000L).as("purchase_id"),
        col("user_id").as("p_user"),
        timestamp_micros(col("ts_us") +
          (pmod(xxhash64(col("event_id")), lit(25200L)) + 1800L) * 1000000L).as("purchase_ts"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    var t0 = System.nanoTime()
    // FileStreamSource replays oldest-mtime-first, and slice order must
    // follow event time or the watermark drops whole slices as late. Sleep
    // spacing between writes is not enough on a filesystem with coarse
    // (e.g. 1 s) mtime granularity — ties there let slices replay out of
    // order (round-5 review finding) — so every slice's files get an
    // EXPLICIT strictly-increasing mtime, 1 s apart, regardless of what
    // the filesystem recorded at write time.
    val mtimeBase = (System.currentTimeMillis() / 1000L) * 1000L - (Slices + 5).toLong * 1000L
    val stamped = scala.collection.mutable.Set[String]()
    def stampSlice(dir: String, i: Int): Unit =
      Option(new java.io.File(dir).listFiles()).toSeq.flatten
        .filter(f => f.getName.startsWith("part-") && !stamped.contains(f.getPath))
        .foreach { f =>
          require(f.setLastModified(mtimeBase + i.toLong * 1000L), s"setLastModified failed: $f")
          stamped += f.getPath
        }
    (0 until Slices + 4).foreach { i =>
      val lo = i.toLong * SliceHours * 3600 * 1000000L
      val hi = (i + 1).toLong * SliceHours * 3600 * 1000000L
      if (i < Slices) {
        events.where(unix_micros(col("ets")) >= lo && unix_micros(col("ets")) < hi)
          .repartition(1).write.mode("append").parquet(eventsDir)
        stampSlice(eventsDir, i)
      }
      purchases.where(unix_micros(col("purchase_ts")) >= lo && unix_micros(col("purchase_ts")) < hi)
        .repartition(1).write.mode("append").parquet(purchDir)
      stampSlice(purchDir, i)
    }
    val nEvents = events.count()
    println(f"generated $nEvents events (${nEvents - n} planted dups) + " +
      f"${purchases.count()} purchases in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    def stream(dir: String, schema: org.apache.spark.sql.types.StructType) =
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .format("parquet").load(dir)

    val eSchema = spark.read.parquet(eventsDir).schema
    val pSchema = spark.read.parquet(purchDir).schema

    // ---- 1. watermarked dedup chained into hourly windows ----
    t0 = System.nanoTime()
    val dedupHourly = stream(eventsDir, eSchema)
      .withWatermark("ets", "30 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(window(col("ets"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("h_us"), col("n"))
    val (hourly, dedupState) = runAppend(dedupHourly, "dedup_hourly")(spark)
    val wall1 = (System.nanoTime() - t0) / 1e9
    // closed windows only (append emits windows passed by the watermark)
    val maxH = hourly.agg(max(col("h_us"))).as[Long].head()
    val batchHourly = events.dropDuplicates("event_id")
      .groupBy((unix_micros(col("ets")) - pmod(unix_micros(col("ets")), lit(3600000000L))).as("h_us"))
      .agg(count(lit(1)).as("n"))
      .where(col("h_us") <= maxH)
    val diff1 = hourly.unionAll(batchHourly)
      .groupBy(col("h_us"), col("n")).agg(count(lit(1)).as("c"))
      .where(col("c") =!= 2)
    val mismatch1 = diff1.count()
    if (mismatch1 > 0) diff1.orderBy(col("h_us")).show(20, false)
    val streamed1 = hourly.agg(sum(col("n"))).as[Long].head()
    println(f"[dedup→hourly] $streamed1 events in ${hourly.count()} closed windows, " +
      f"max state $dedupState rows, $wall1%.1f s (${nEvents / wall1}%.0f ev/s)")
    assert(mismatch1 == 0, s"$mismatch1 hourly cells differ from the batch distinct-per-hour oracle")
    assert(dedupState < 200000, s"dedup state $dedupState not horizon-bounded (stream is $nEvents)")

    // ---- 2. native session windows vs batch gaps-and-islands ----
    t0 = System.nanoTime()
    val sess = stream(eventsDir, eSchema)
      .withWatermark("ets", "30 minutes")
      .groupBy(col("user_id"), session_window(col("ets"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), unix_micros(col("session_window.start")).as("s_us"),
        unix_micros(col("session_window.end")).as("e_us"), col("n_events"))
    val (sessions, sessState) = runAppend(sess, "sessions")(spark)
    val wall2 = (System.nanoTime() - t0) / 1e9
    // finalization cutoff: sessions closed under the end-of-stream watermark
    val maxTs = events.agg(max(unix_micros(col("ets")))).as[Long].head()
    val cutoff = maxTs - (1800L + 2L * 1800L) * 1000000L
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("t"))
    val batchSessions = events.select(col("user_id"), unix_micros(col("ets")).as("t"))
      .distinct() // session_window collapses equal timestamps (dup events)
      .withColumn("brk", when(col("t") - lag(col("t"), 1).over(w) >= 1800000000L
        || lag(col("t"), 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("sid", sum(col("brk")).over(w.rowsBetween(Long.MinValue, 0)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("t")).as("s_us"), (max(col("t")) + 1800000000L).as("e_us"))
      .where(col("e_us") <= cutoff)
    val nStream2 = sessions.where(col("e_us") <= cutoff).count()
    val nBatch2 = batchSessions.count()
    // dup events fall on identical timestamps → n_events differs by design;
    // compare the session SET (user, start, end)
    val diff2 = sessions.where(col("e_us") <= cutoff)
      .select(col("user_id"), col("s_us"), col("e_us"))
      .unionAll(batchSessions.select(col("user_id"), col("s_us"), col("e_us")))
      .groupBy(col("user_id"), col("s_us"), col("e_us")).agg(count(lit(1)).as("c"))
      .where(col("c") =!= 2)
    val mismatch2 = diff2.count()
    if (mismatch2 > 0) diff2.orderBy(col("user_id"), col("s_us")).show(20, false)
    println(f"[session_window] $nStream2 closed sessions (batch $nBatch2), " +
      f"max state $sessState rows, $wall2%.1f s")
    assert(mismatch2 == 0 && nStream2 == nBatch2,
      s"$mismatch2 session cells differ from the gaps-and-islands oracle")
    assert(sessState < 400000, s"session state $sessState not horizon-bounded")

    // ---- 3. stream-stream attribution join ----
    t0 = System.nanoTime()
    val views = stream(eventsDir, eSchema)
      .select(col("event_id").as("view_id"), col("user_id"), col("ets").as("view_ts"))
    val purch = stream(purchDir, pSchema)
    val joined = streaming.StreamingOps.attributionJoin(views, purch, horizonHours = 8)
      .select(col("view_id"), col("purchase_id"))
    val (matches, joinState) = runAppend(joined, "attribution")(spark)
    val wall3 = (System.nanoTime() - t0) / 1e9
    val batchMatches = events
      .select(col("event_id").as("view_id"), col("user_id"), col("ets").as("view_ts"))
      .join(purchases, expr("user_id = p_user AND purchase_ts > view_ts" +
        " AND purchase_ts <= view_ts + INTERVAL 8 HOURS"))
      .select(col("view_id"), col("purchase_id"))
    val nStream3 = matches.count()
    val nBatch3 = batchMatches.count()
    // duplicated view events make a pair legitimately appear twice on BOTH
    // sides — compare (pair → multiplicity) maps, not pair sets
    def paired(df: DataFrame) = df.groupBy(col("view_id"), col("purchase_id"))
      .agg(count(lit(1)).as("m"))
    val diff3 = paired(matches).unionAll(paired(batchMatches))
      .groupBy(col("view_id"), col("purchase_id"), col("m")).agg(count(lit(1)).as("c"))
      .where(col("c") =!= 2)
    val mismatch3 = diff3.count()
    if (mismatch3 > 0) diff3.orderBy(col("view_id")).show(20, false)
    println(f"[attribution] $nStream3 matches (batch $nBatch3), " +
      f"max state $joinState rows, $wall3%.1f s")
    assert(mismatch3 == 0 && nStream3 == nBatch3,
      s"stream-stream join differs from the batch time-range join: $mismatch3 cells")
    assert(joinState < 600000, s"join state $joinState not horizon-bounded (streams total " +
      s"${nEvents + 100000})")

    events.unpersist(blocking = false); purchases.unpersist(blocking = false)
    rmrf(new java.io.File(base))
    println("[streaming-million] all assertions passed")
  }
}
