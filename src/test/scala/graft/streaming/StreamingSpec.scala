package graft.streaming

import graft.SparkTestBase
import graft.queries.Relational

class StreamingSpec extends SparkTestBase {
  test("streamed hourly aggregation equals batch aggregation") {
    val streamRes = StreamingOps.eventsHourlyStream(spark, sf()).collect()
    val batchRes = Relational.eventsHourly(spark, sf()).collect()
    assert(streamRes.length == batchRes.length && streamRes.nonEmpty)
    assert(streamRes.map(_.toString).sorted.sameElements(batchRes.map(_.toString).sorted))
  }

  test("running max: cross-batch state, change-only emission over real micro-batches") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("runmax").toString
    // two files = two micro-batches (maxFilesPerTrigger=1). Batch 2 brings
    // no improvement for user 1 (4 < 5) and an improvement for user 2.
    Seq((1L, 5.0), (1L, 3.0), (2L, 10.0)).toDF("user_id", "value")
      .coalesce(1).write.parquet(s"$dir/b1")
    Seq((1L, 4.0), (2L, 11.0)).toDF("user_id", "value")
      .coalesce(1).write.parquet(s"$dir/b2")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true").format("parquet").load(dir)
      .as[(Long, Double)]
    val name = s"runmax_test_${System.nanoTime()}"
    val q = StreamingOps.runningMaxChanges(stream).toDF("user_id", "run_max")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val emitted = spark.table(name).as[(Long, Double)].collect().toSeq
    spark.catalog.dropTempView(name)
    // exactly three emissions: (1,5) and (2,10) in batch 1, (2,11) in
    // batch 2 — and crucially NO (1,4): state survived the batch boundary
    assert(emitted.sorted == Seq((1L, 5.0), (2L, 10.0), (2L, 11.0)),
      s"got $emitted")
  }

  test("streaming EMA ring survives micro-batch boundaries and equals the batch lag chain") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("streamema").toString
    // rows: (event_id, user_id, ts_us, value); 3 files = 3 micro-batches
    // in event-time order per user — the cross-batch window for user 1's
    // 4th event must reach back through TWO batch boundaries
    Seq((1L, 1L, 100L, 8.0), (2L, 1L, 200L, 4.0), (10L, 2L, 100L, 1.0))
      .toDF("event_id", "user_id", "ts_us", "value").coalesce(1).write.parquet(s"$dir/b1")
    Seq((3L, 1L, 300L, 2.0), (11L, 2L, 200L, 3.0))
      .toDF("event_id", "user_id", "ts_us", "value").coalesce(1).write.parquet(s"$dir/b2")
    Seq((4L, 1L, 400L, 6.0))
      .toDF("event_id", "user_id", "ts_us", "value").coalesce(1).write.parquet(s"$dir/b3")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true").format("parquet").load(dir)
      .as[(Long, Long, Long, Double)]
    val name = s"ema_test_${System.nanoTime()}"
    val q = StreamingOps.emaChanges(stream, depth = 8)
      .toDF("event_id", "user_id", "value", "ema")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table(name).select("event_id", "ema")
      .as[(Long, Double)].collect().toMap
    spark.catalog.dropTempView(name)
    // hand-computed truncated EMA, newest-first weights 1, 1/2, 1/4, ...
    def ema(xs: Double*): Double = { // xs newest first
      val n = xs.zipWithIndex.map { case (x, k) => x * math.pow(0.5, k) }.sum
      val d = xs.indices.map(k => math.pow(0.5, k)).sum
      n / d
    }
    assert(got(1L) == 8.0 && got(10L) == 1.0)
    assert(got(2L) == ema(4.0, 8.0))
    assert(got(11L) == ema(3.0, 1.0), "user 2's ring must survive batch 1→2")
    assert(got(3L) == ema(2.0, 4.0, 8.0), "user 1's ring must survive batch 1→2")
    assert(got(4L) == ema(6.0, 2.0, 4.0, 8.0), "the window must span two batch boundaries")
  }

  test("streaming EMA rejects cross-batch event-time disorder loudly") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("streamemaooo").toString
    // batch 2 delivers a LATE event for user 1 (ts 150 < batch 1's 200):
    // the ring's weights would silently skew, so the operator must throw
    // (ADVICE r8) instead of letting only the oracle gate catch it.
    Seq((1L, 1L, 100L, 8.0), (2L, 1L, 200L, 4.0))
      .toDF("event_id", "user_id", "ts_us", "value").coalesce(1).write.parquet(s"$dir/b1")
    Seq((3L, 1L, 150L, 2.0))
      .toDF("event_id", "user_id", "ts_us", "value").coalesce(1).write.parquet(s"$dir/b2")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true").format("parquet").load(dir)
      .as[(Long, Long, Long, Double)]
    val name = s"ema_ooo_test_${System.nanoTime()}"
    val q = StreamingOps.emaChanges(stream, depth = 8)
      .toDF("event_id", "user_id", "value", "ema")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    spark.catalog.dropTempView(name)
    def rootChain(t: Throwable): List[Throwable] =
      t :: Option(t.getCause).map(rootChain).getOrElse(Nil)
    assert(rootChain(err).exists(c =>
      String.valueOf(c.getMessage).contains("out-of-order event")),
      s"expected the loud out-of-order failure, got: ${err.getMessage}")
  }

  test("streaming dedup state spans micro-batches: repeats in batch 2 emit nothing") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dedup").toString
    Seq("alpha", "beta").toDF("text").coalesce(1).write.parquet(s"$dir/b1")
    Seq("alpha", "gamma").toDF("text").coalesce(1).write.parquet(s"$dir/b2")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true").format("parquet").load(dir)
      .select(md5(col("text")).as("content_hash"))
      .dropDuplicates("content_hash")
    val name = s"dedup_test_${System.nanoTime()}"
    val q = stream.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val emitted = spark.table(name).as[String].collect().toSeq
    spark.catalog.dropTempView(name)
    // "alpha" reappears in batch 2 but the state store already has it:
    // exactly 3 distinct hashes emitted, no duplicates
    assert(emitted.length == 3 && emitted.distinct.length == 3, s"got $emitted")
  }

  test("watermark drops late data and finalizes windows across micro-batches") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wm").toString
    // watermark timeline: after batch 1 (max 13:00, 1h delay) the watermark
    // is 12:00; DURING batch 2 it passes the [10:00,11:00) window's end, so
    // that window is emitted and its state evicted. Batch 3's 10:15
    // straggler then arrives behind cleaned-up state — the case where the
    // watermark contract GUARANTEES the drop (a straggler whose window is
    // still live may legally still merge; that is not a drop scenario).
    Seq("2024-01-01 10:00:00", "2024-01-01 10:30:00", "2024-01-01 13:00:00")
      .toDF("s").select(to_timestamp(col("s")).as("ts"))
      .coalesce(1).write.parquet(s"$dir/b1")
    Seq("2024-01-01 13:30:00")
      .toDF("s").select(to_timestamp(col("s")).as("ts"))
      .coalesce(1).write.parquet(s"$dir/b2")
    Seq("2024-01-01 10:15:00", "2024-01-01 14:00:00")
      .toDF("s").select(to_timestamp(col("s")).as("ts"))
      .coalesce(1).write.parquet(s"$dir/b3")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val counts = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true").format("parquet").load(dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour")).agg(count(lit(1)).as("cnt"))
    val name = s"wm_test_${System.nanoTime()}"
    // append mode: a window row is emitted exactly once, when the watermark
    // passes its end — the mode where watermark semantics are load-bearing
    // (complete mode would retain and re-emit everything)
    val q = counts.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val droppedByWatermark = q.recentProgress
      .flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
    val emitted = spark.table(name)
      .select(col("window.start").cast("string"), col("cnt"))
      .as[(String, Long)].collect().toSeq.sorted
    spark.catalog.dropTempView(name)
    assert(droppedByWatermark == 1L,
      s"exactly the 10:15 straggler should be dropped by the watermark, got $droppedByWatermark")
    // the finalized 10:00 window counts 2 rows — NOT 3: the late row never
    // entered it. Later windows stay open at stream end (watermark 13:00 <
    // their ends) and are correctly unemitted.
    assert(emitted == Seq(("2024-01-01 10:00:00", 2L)), s"got $emitted")
  }

  test("stream-stream attribution join buffers state across micro-batches") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("attr").toString
    Seq((10L, 1L, "2024-01-01 10:00:00"), (11L, 2L, "2024-01-01 10:00:00"))
      .toDF("view_id", "user_id", "s")
      .select(col("view_id"), col("user_id"), to_timestamp(col("s")).as("view_ts"))
      .coalesce(1).write.parquet(s"$dir/views/b1")
    // purchases arrive over two micro-batches: user 2 in batch 1 (in
    // horizon), user 1 in batch 2 — its matching view is a batch behind, so
    // the join only fires if view-side state survived the boundary. The
    // 20:00 purchase is beyond the 6h horizon and must not match.
    Seq((20L, 2L, "2024-01-01 11:00:00"))
      .toDF("purchase_id", "p_user", "s")
      .select(col("purchase_id"), col("p_user"), to_timestamp(col("s")).as("purchase_ts"))
      .coalesce(1).write.parquet(s"$dir/purch/b1")
    Seq((21L, 1L, "2024-01-01 12:00:00"), (22L, 1L, "2024-01-01 20:00:00"))
      .toDF("purchase_id", "p_user", "s")
      .select(col("purchase_id"), col("p_user"), to_timestamp(col("s")).as("purchase_ts"))
      .coalesce(1).write.parquet(s"$dir/purch/b2")
    val vSchema = spark.read.parquet(s"$dir/views/b1").schema
    val pSchema = spark.read.parquet(s"$dir/purch/b1").schema
    val views = spark.readStream.schema(vSchema)
      .option("recursiveFileLookup", "true").format("parquet").load(s"$dir/views")
    val purchases = spark.readStream.schema(pSchema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true").format("parquet").load(s"$dir/purch")
    val name = s"attr_test_${System.nanoTime()}"
    val q = StreamingOps.attributionJoin(views, purchases, horizonHours = 6)
      .select(col("view_id"), col("purchase_id"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val nBatches = q.recentProgress.count(_.numInputRows > 0)
    val emitted = spark.table(name).as[(Long, Long)].collect().toSeq.sorted
    spark.catalog.dropTempView(name)
    assert(nBatches >= 2, s"expected the purchases to span micro-batches, got $nBatches")
    assert(emitted == Seq((10L, 21L), (11L, 20L)), s"got $emitted")
  }

  test("attribution join state is watermark-bounded: expired views evict") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("attr_wm").toString
    // the GLOBAL watermark is the MIN across both inputs' watermarks, so the
    // view side must advance too: the unrelated 20:30 view keeps the view
    // watermark from pinning the global one at 9:00
    Seq((10L, 1L, "2024-01-01 10:00:00"), (99L, 8L, "2024-01-01 20:30:00"))
      .toDF("view_id", "user_id", "s")
      .select(col("view_id"), col("user_id"), to_timestamp(col("s")).as("view_ts"))
      .coalesce(1).write.parquet(s"$dir/views/b1")
    // watermark timeline (same 3-batch shape as the aggregation watermark
    // test — cleanup runs a batch AFTER the watermark passes, and only a
    // straggler arriving behind CLEANED-UP state is guaranteed dropped):
    // batch 1 (purchase 20:00) → watermark 19:00, past the 10:00 view's
    // horizon end (16:00); batch 2 (purchase 20:05) runs under it and
    // evicts the view's state; batch 3's 15:00 purchase would have matched
    // inside the horizon but arrives behind evicted state — no pair emits.
    Seq((20L, 9L, "2024-01-01 20:00:00"))
      .toDF("purchase_id", "p_user", "s")
      .select(col("purchase_id"), col("p_user"), to_timestamp(col("s")).as("purchase_ts"))
      .coalesce(1).write.parquet(s"$dir/purch/b1")
    Thread.sleep(1200) // distinct mtimes: the file source orders batches by them
    Seq((22L, 9L, "2024-01-01 20:05:00"))
      .toDF("purchase_id", "p_user", "s")
      .select(col("purchase_id"), col("p_user"), to_timestamp(col("s")).as("purchase_ts"))
      .coalesce(1).write.parquet(s"$dir/purch/b2")
    Thread.sleep(1200)
    Seq((21L, 1L, "2024-01-01 15:00:00"))
      .toDF("purchase_id", "p_user", "s")
      .select(col("purchase_id"), col("p_user"), to_timestamp(col("s")).as("purchase_ts"))
      .coalesce(1).write.parquet(s"$dir/purch/b3")
    val vSchema = spark.read.parquet(s"$dir/views/b1").schema
    val pSchema = spark.read.parquet(s"$dir/purch/b1").schema
    val views = spark.readStream.schema(vSchema)
      .option("recursiveFileLookup", "true").format("parquet").load(s"$dir/views")
    val purchases = spark.readStream.schema(pSchema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true").format("parquet").load(s"$dir/purch")
    val name = s"attr_wm_${System.nanoTime()}"
    val q = StreamingOps.attributionJoin(views, purchases, horizonHours = 6)
      .select(col("view_id"), col("purchase_id"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val emitted = spark.table(name).as[(Long, Long)].collect().toSeq
    val progress = q.recentProgress
    val dropped = progress.flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
    val finalState = progress.flatMap(_.stateOperators).map(_.numRowsTotal).lastOption
    spark.catalog.dropTempView(name)
    assert(emitted.isEmpty, s"evicted view must not match: $emitted")
    assert(dropped >= 1, s"the late 15:00 purchase should be watermark-dropped, got $dropped")
    // 5 input rows entered; the evicted 10:00 view and the dropped purchase
    // must not sit in the store — at most the live 20:30 view + two live
    // purchases remain
    assert(finalState.exists(_ <= 3), s"join state not bounded: $finalState")
  }

  test("left-outer attribution: unconverted view emits its null row exactly once") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("attr_outer").toString
    // views: 10 converts; 11 never converts (null row must fire once its
    // 6h window is below the final watermark); 99 never converts but sits
    // in the unfinalized tail (window 20:30+6h is past the final global
    // watermark 19:30 = min(20:30, 23:30) - 1h) → must NOT emit
    Seq((10L, 1L, "2024-01-01 10:00:00"), (11L, 2L, "2024-01-01 10:05:00"),
      (99L, 8L, "2024-01-01 20:30:00"))
      .toDF("view_id", "user_id", "s")
      .select(col("view_id"), col("user_id"), to_timestamp(col("s")).as("view_ts"))
      .coalesce(1).write.parquet(s"$dir/views/b1")
    // purchases span three micro-batches: the match for 10, then two
    // watermark pushers — the null row for 11 can only appear after b2
    // advances the global watermark past 16:05, and b3 runs another batch
    // to prove it doesn't re-emit
    Seq((20L, 1L, "2024-01-01 11:00:00")).toDF("purchase_id", "p_user", "s")
      .select(col("purchase_id"), col("p_user"), to_timestamp(col("s")).as("purchase_ts"))
      .coalesce(1).write.parquet(s"$dir/purch/b1")
    Seq((21L, 9L, "2024-01-01 23:00:00")).toDF("purchase_id", "p_user", "s")
      .select(col("purchase_id"), col("p_user"), to_timestamp(col("s")).as("purchase_ts"))
      .coalesce(1).write.parquet(s"$dir/purch/b2")
    Seq((22L, 9L, "2024-01-01 23:30:00")).toDF("purchase_id", "p_user", "s")
      .select(col("purchase_id"), col("p_user"), to_timestamp(col("s")).as("purchase_ts"))
      .coalesce(1).write.parquet(s"$dir/purch/b3")
    val vSchema = spark.read.parquet(s"$dir/views/b1").schema
    val pSchema = spark.read.parquet(s"$dir/purch/b1").schema
    val views = spark.readStream.schema(vSchema)
      .option("recursiveFileLookup", "true").format("parquet").load(s"$dir/views")
    val purchases = spark.readStream.schema(pSchema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true").format("parquet").load(s"$dir/purch")
    val name = s"attr_outer_test_${System.nanoTime()}"
    val q = StreamingOps.attributionJoinOuter(views, purchases, horizonHours = 6)
      .select(col("view_id"), col("purchase_id"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val nBatches = q.recentProgress.count(_.numInputRows > 0)
    val emitted = spark.table(name)
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSeq.sorted
    spark.catalog.dropTempView(name)
    assert(nBatches >= 3, s"expected purchases to span micro-batches, got $nBatches")
    assert(emitted == Seq((10L, 20L), (11L, -1L)),
      s"expected one match and EXACTLY ONE null row for view 11, none for tail view 99; got $emitted")
  }

  test("dropDuplicatesWithinWatermark: in-horizon repeats drop, evicted keys re-emit") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    // the bounded-state twin of dedupStream's dropDuplicates: state for a
    // key lives only while the watermark allows a duplicate to arrive.
    // b1: key A at 10:00 (+ watermark pusher 12:00)
    // b2: key A again at 10:30 — inside the 1h horizon → dropped;
    //     pusher 23:00 advances the watermark to 22:00, evicting A's state
    // b3: key A at 22:30 — after eviction → EMITS AGAIN (proof state died)
    val dir = java.nio.file.Files.createTempDirectory("dedup_wm").toString
    Seq(("A", "2024-01-01 10:00:00"), ("zz1", "2024-01-01 12:00:00"))
      .toDF("k", "s").select(col("k"), to_timestamp(col("s")).as("ts"))
      .coalesce(1).write.parquet(s"$dir/b1")
    Seq(("A", "2024-01-01 10:30:00"), ("zz2", "2024-01-01 23:00:00"))
      .toDF("k", "s").select(col("k"), to_timestamp(col("s")).as("ts"))
      .coalesce(1).write.parquet(s"$dir/b2")
    Seq(("A", "2024-01-01 22:30:00"))
      .toDF("k", "s").select(col("k"), to_timestamp(col("s")).as("ts"))
      .coalesce(1).write.parquet(s"$dir/b3")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val name = s"dedup_wm_test_${System.nanoTime()}"
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true").format("parquet").load(dir)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("k")
      .select(col("k"), col("ts").cast("string").as("t"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val nBatches = q.recentProgress.count(_.numInputRows > 0)
    val emittedA = spark.table(name).as[(String, String)].collect().toSeq
      .filter(_._1 == "A").map(_._2).sorted
    spark.catalog.dropTempView(name)
    assert(nBatches >= 3, s"expected 3 micro-batches, got $nBatches")
    assert(emittedA == Seq("2024-01-01 10:00:00", "2024-01-01 22:30:00"),
      s"expected the in-horizon repeat dropped and the post-eviction one re-emitted; got $emittedA")
  }

  test("session_window merges a session that spans micro-batches, emits it once closed") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sesswin").toString
    // user 1's session: events at 10:00 and (next batch) 10:20 — inside the
    // 30 min gap, so the state store must MERGE across the batch boundary.
    // The 20:00 event (both batches' tail) pushes the watermark to 19:00,
    // closing user 1's session (ends 10:50) but NOT user 9's (ends 20:30).
    Seq((1L, "2024-01-01 10:00:00")).toDF("user_id", "s")
      .select(col("user_id"), to_timestamp(col("s")).as("ets"))
      .coalesce(1).write.parquet(s"$dir/b1")
    Seq((1L, "2024-01-01 10:20:00"), (9L, "2024-01-01 20:00:00"))
      .toDF("user_id", "s")
      .select(col("user_id"), to_timestamp(col("s")).as("ets"))
      .coalesce(1).write.parquet(s"$dir/b2")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val events = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true").format("parquet").load(dir)
    val name = s"sesswin_test_${System.nanoTime()}"
    val q = events.withWatermark("ets", "1 hour")
      .groupBy(col("user_id"), session_window(col("ets"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.start").cast("string").as("st"), col("n"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val nBatches = q.recentProgress.count(_.numInputRows > 0)
    val emitted = spark.table(name).as[(Long, String, Long)].collect().toSeq.sorted
    spark.catalog.dropTempView(name)
    assert(nBatches >= 2, s"expected events to span micro-batches, got $nBatches")
    assert(emitted == Seq((1L, "2024-01-01 10:00:00", 2L)),
      s"expected ONE merged 2-event session for user 1 and nothing for user 9; got $emitted")
  }

  test("streaming CMS == batch CMS byte-for-byte (linearity across micro-batches)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val depth = 4
    val width = 512
    // streamed sketch over the events user_id stream
    val toks = graft.io.EventsReader.stream(spark, sf())
      .select(col("user_id").cast("string").as("tok")).as[String]
    val name = s"cms_spec_${System.nanoTime()}"
    val q = toks.select(new graft.operators.Sketches.CountMin(depth, width).toColumn)
      .writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table(name).head().getSeq[Long](0).toArray
    spark.catalog.dropTempView(name)
    // batch sketch over the identical rows
    val batch = graft.io.EventsReader.batch(spark, sf())
      .select(col("user_id").cast("string").as("tok")).as[String]
      .select(new graft.operators.Sketches.CountMin(depth, width).toColumn)
      .head()
    assert(streamed.sameElements(batch),
      "linear sketch must be identical whether merged across micro-batches or partitions")
    // and the check frame's guarantees hold on the gate corpus
    val out = StreamingOps.countMinStream(spark, sf()).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getBoolean(2) && r.getBoolean(3), s"guarantee broken for ${r.getString(0)}")
    }
  }

  test("transformWithState running max is emission-equivalent to flatMapGroupsWithState") {
    // the legacy and Spark-4 replacement state APIs must agree row-for-row
    val legacy = StreamingOps.runningMaxStream(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val tws = StreamingOps.runningMaxStreamTws(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(tws.nonEmpty && tws == legacy)
    // and the provider conf was restored (TWS forces RocksDB only while running)
    assert(!spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      .exists(_.contains("RocksDB")),
      "RocksDB provider must not leak into the session after the query")
  }

  test("streaming Misra-Gries keeps the heavy-membership guarantee under eviction") {
    import org.apache.spark.sql.functions._
    // k=12 < 15 distinct user_ids at sf0.001, so counter eviction runs
    // across micro-batch merges, and the heavy set is nonempty (max user
    // count 86 ≥ 1000/12) — the guarantee is checked where it can fail
    val out = StreamingOps.heavyHittersStream(spark, sf(), k = 12).collect()
    assert(out.nonEmpty, "expected a nonempty heavy set at k=12 on sf0.001")
    out.foreach { r =>
      assert(r.getBoolean(2),
        s"heavy token ${r.getString(0)} (${r.getLong(1)}) missing from merged summary")
    }
    // and the sketch stays bounded: at most k counters survive (reduce
    // inserts while size < k, decrements at k; merge trims back to ≤ k)
    val toks = graft.io.EventsReader.batch(spark, sf())
      .select(col("user_id").cast("string").as("tok"))
    import spark.implicits._
    val summary = toks.as[String]
      .select(new graft.operators.Sketches.MisraGries(12).toColumn).head()
    assert(summary.size <= 12, s"MG summary must hold <= k counters, had ${summary.size}")
  }

  test("streaming funnel matches batch funnel depths on the gate corpus") {
    import org.apache.spark.sql.functions._
    val streamed = StreamingOps.funnelStream(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val batch = Relational.funnel(spark, sf())
      .select(col("user_id"), col("funnel_depth"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("stateful streaming sessionization matches batch session counts") {
    import org.apache.spark.sql.functions._
    val streamed = StreamingOps.sessionizeStream(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val batch = Relational.sessionize(spark, sf())
      .groupBy(col("user_id")).agg(max(col("session_idx")).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("streaming z-score moment state survives micro-batch boundaries") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("streamz").toString
    // minN = 3 warm-up rows in batch 1; batch 2's spike must be scored
    // against moments accumulated ACROSS the boundary
    Seq((1L, "a", 100L, 1.0), (2L, "a", 200L, 2.0), (3L, "a", 300L, 3.0))
      .toDF("event_id", "event_type", "ts_us", "value")
      .coalesce(1).write.parquet(s"$dir/b1")
    Seq((4L, "a", 400L, 100.0), (5L, "a", 500L, 2.0))
      .toDF("event_id", "event_type", "ts_us", "value")
      .coalesce(1).write.parquet(s"$dir/b2")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true").format("parquet").load(dir)
      .as[(Long, String, Long, Double)]
    val name = s"z_test_${System.nanoTime()}"
    val q = StreamingOps.zscoreChanges(stream, minN = 3)
      .toDF("event_type", "event_id", "z")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table(name).select("event_id", "z")
      .as[(Long, Double)].collect().toMap
    spark.catalog.dropTempView(name)
    // prior to event 4: n=3, mean=2, var=(1+4+9)/3-4=2/3 → z=(100-2)/sqrt(2/3)
    val z4 = (100.0 - 2.0) / math.sqrt(14.0 / 3.0 - 4.0)
    assert(got.keySet == Set(4L), s"only the planted spike alerts, got $got")
    assert(math.abs(got(4L) - z4) < 1e-9)
    // event 5 is scored against moments INCLUDING the spike (n=4), where
    // z is small — its absence proves the state updated across batch 2
  }

  test("streaming disorder counts survive micro-batch boundaries and reject sequence violations") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("streamdis").toString
    // user 1: ts walk 100, 300, 200 (disordered), then cross-batch 250
    // (disordered vs max 300) and 400 (in order) — 2 disordered total,
    // ONE of them only detectable with state carried across the boundary
    Seq((1L, 1L, 100L), (2L, 1L, 300L), (3L, 1L, 200L), (4L, 2L, 50L))
      .toDF("event_id", "user_id", "ts_ms")
      .coalesce(1).write.parquet(s"$dir/b1")
    Seq((5L, 1L, 250L), (6L, 1L, 400L), (7L, 2L, 60L))
      .toDF("event_id", "user_id", "ts_ms")
      .coalesce(1).write.parquet(s"$dir/b2")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true").format("parquet").load(dir)
      .as[(Long, Long, Long)]
    val name = s"dis_test_${System.nanoTime()}"
    val q = StreamingOps.disorderChanges(stream)
      .toDF("user_id", "n_events", "n_disordered")
      .writeStream.format("memory").queryName(name)
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table(name).groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n"), max(col("n_disordered")).as("d"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    spark.catalog.dropTempView(name)
    assert(got === Map(1L -> ((5L, 2L)), 2L -> ((2L, 0L))))
    // a replayed / out-of-sequence event_id must fail loudly, not corrupt
    val err = intercept[Exception] {
      val bad = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Long)]
      val q2 = StreamingOps.disorderChanges(bad.toDS())
        .toDF("user_id", "n_events", "n_disordered")
        .writeStream.format("memory").queryName(s"bad_$name")
        .outputMode("update").start()
      bad.addData((10L, 7L, 100L))
      q2.processAllAvailable()
      bad.addData((9L, 7L, 200L)) // event_id goes BACKWARD
      q2.processAllAvailable()
      q2.stop()
    }
    val chain = Iterator.iterate[Throwable](err)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(chain.contains("sequence violated"), chain)
  }

  test("CF-bubble stream: multi-batch snapshot equals the batch CF algebra") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // two micro-batches of 3-dim vectors over 2 cells: the streaming
    // CFAggregator state must carry (n, LS, SS) across the batch boundary
    // so the final snapshot equals the batch fold over the union — the
    // incremental contract q_stream_cf_bubbles pins on the gate corpus
    val dir = java.nio.file.Files.createTempDirectory("cfb").toString
    val rng = new scala.util.Random(11)
    def rows(ids: Range): Seq[(Long, Array[Double])] =
      ids.map(i => (i.toLong, Array.fill(3)(rng.nextGaussian())))
    val b1 = rows(0 until 40); val b2 = rows(40 until 100)
    b1.toDF("vec_id", "vec").coalesce(1).write.parquet(s"$dir/b1")
    b2.toDF("vec_id", "vec").coalesce(1).write.parquet(s"$dir/b2")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true").format("parquet").load(dir)
    def cf(df: org.apache.spark.sql.DataFrame) =
      df.select(pmod(col("vec_id"), lit(2)).cast("int").as("cell"), col("vec"))
        .as[(Int, Array[Double])]
        .groupByKey(_._1).mapValues(_._2)
        .agg(graft.operators.CFAggregator.toColumn.name("cf"))
    val name = s"cfb_test_${System.nanoTime()}"
    val q = cf(src).toDF("cell", "cf").writeStream
      .format("memory").queryName(name)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
      "expected at least two non-empty micro-batches")
    val streamed = spark.table(name).as[(Int, graft.operators.CF)]
      .collect().map(t => t._1 -> t._2).toMap
    spark.catalog.dropTempView(name)
    val batch = cf((b1 ++ b2).toDF("vec_id", "vec"))
      .collect().map(t => t._1 -> t._2).toMap
    assert(streamed.keySet == batch.keySet)
    batch.foreach { case (cell, b) =>
      val s = streamed(cell)
      assert(s.n == b.n, s"cell $cell n")
      s.ls.indices.foreach { i =>
        assert(math.abs(s.ls(i) - b.ls(i)) <= 1e-9 * math.max(1.0, math.abs(b.ls(i))))
        assert(math.abs(s.ss(i) - b.ss(i)) <= 1e-9 * math.max(1.0, math.abs(b.ss(i))))
      }
      assert(math.abs(s.extent - b.extent) <= 1e-9)
    }
  }

  test("streaming-clustering loop: fitSketch labels refresh across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // VERDICT r11 #2: the end-to-end loop (CF state → foreachBatch snapshot
    // → fitSketch labels) must re-cluster PER TRIGGER. Batch 1 streams two
    // well-separated blob groups (cells 0-9 near origin, 10-19 at +50);
    // batch 2 adds a third group (cells 20-29 at +100) and more mass to the
    // first. The second snapshot must see the new bubbles and refresh
    // labels; the final snapshot must equal a direct batch fitSketch over
    // the union.
    val rng = new scala.util.Random(23)
    def blob(cells: Range, center: Double, perCell: Int): Seq[(Long, Array[Double])] =
      cells.flatMap(c => (0 until perCell).map(_ =>
        (c.toLong, Array.fill(3)(center + rng.nextGaussian() * 0.3))))
    val b1 = blob(0 until 10, 0.0, 8) ++ blob(10 until 20, 50.0, 8)
    val b2 = blob(20 until 30, 100.0, 8) ++ blob(0 until 10, 0.0, 4)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Double])]
    val model = graft.hdbscan.Hdbscan(minPts = 2, minClusterSize = 4)
    val loop = StreamingOps.startClusterLoop(
      mem.toDS().toDF("cell", "vec"), model,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      mem.addData(b1)
      loop.query.processAllAvailable()
      val after1 = loop.snapshots
      assert(after1.nonEmpty, "no snapshot after batch 1")
      assert(after1.last.rows.map(_._1).toSet == (0L until 20L).toSet)
      mem.addData(b2)
      loop.query.processAllAvailable()
      val after2 = loop.snapshots
      assert(after2.size > after1.size, "labels did not refresh on batch 2")
      val fin = after2.last.rows
      assert(fin.map(_._1).toSet == (0L until 30L).toSet)
      // the refreshed masses include batch 2's extra rows on cells 0-9
      assert(fin.filter(_._1 < 10).forall(_._5 == 12L), s"masses not refreshed: $fin")
      // three separated groups → three clusters in the refreshed labels
      val byLabel = fin.filter(_._2 != 0).groupBy(_._2)
      assert(byLabel.size == 3, s"expected 3 clusters, got ${byLabel.keySet}")
      // final snapshot == direct batch fitSketch over the union
      val batchSketch = (b1 ++ b2).toDF("cell", "vec")
        .select(col("cell"), col("vec").cast("array<double>"))
        .as[(Long, Array[Double])]
        .groupByKey(_._1).mapValues(_._2)
        .agg(graft.operators.CFAggregator.toColumn.name("cf"))
      val want = model.fitSketch(batchSketch)
        .select(col("bubble_id"), col("label"), col("mass"))
        .as[(Long, Int, Long)].collect().sortBy(_._1).toSeq
      assert(fin.map(t => (t._1, t._2, t._5)) == want,
        "final streamed labels differ from the batch fitSketch")
    } finally if (loop.query.isActive) loop.query.stop()
  }
}
