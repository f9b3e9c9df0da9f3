package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The r15 operational-posture contracts (VERDICT r14 #2–#5 + ADVICE
  * r14): O(crash) recovery over the seq-partitioned layout, marker
  * roll-up, v1→v2 layout migration, the loud legacy/object-store/param
  * rejections, and the production knobs reaching the index THROUGH the
  * sink. */
class NearDupIndexOpsSpec extends SparkTestBase {

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-ndi-ops").toString

  private def localFs = org.apache.hadoop.fs.FileSystem.getLocal(
    spark.sparkContext.hadoopConfiguration)

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

  private def writeMarker(pairsDir: String, id: Long, watermark: Long): Unit = {
    val fs = localFs
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$pairsDir/_batches"))
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$pairsDir/_batches/$id"), true)
    try out.write(watermark.toString.getBytes("UTF-8")) finally out.close()
  }

  /** Every data file under `root`, as (path, mtime, length) — the
    * fingerprint repair must leave untouched for committed shards. */
  private def fileFingerprints(root: String): Set[(String, Long, Long)] = {
    val fs = localFs
    val p = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(p)) Set.empty
    else {
      val it = fs.listFiles(p, true)
      val buf = scala.collection.mutable.Set.empty[(String, Long, Long)]
      while (it.hasNext) {
        val st = it.next()
        buf += ((st.getPath.toString, st.getModificationTime, st.getLen))
      }
      buf.toSet
    }
  }

  test("repair is O(crash): committed seq partitions byte-untouched, crashed dirs deleted") {
    // a 10-shard committed history with per-shard markers, then one
    // crashed ingest (index appended, no marker) — the VERDICT r14 #2
    // done-criterion: repairing must touch ONLY the crashed shard's files
    import spark.implicits._
    val root = freshDir()
    val indexDir = s"$root/index"
    val pairsDir = s"$root/pairs"
    val index = new NearDupIndex(spark, indexDir, blockCol = "source",
      textCol = "text", idCol = "doc_id")
    val ten = (0 until 10).map(i =>
      slice.filter(col("doc_id") >= i * 30 && col("doc_id") < (i + 1) * 30))
    ten.zipWithIndex.foreach { case (s, i) =>
      index.ingest(s)
        .select(lit(i.toLong).as("batch_id"), col("block"),
          col("id_a"), col("id_b"), col("jaccard"))
        .write.mode("append").parquet(pairsDir)
      index.release()
      writeMarker(pairsDir, i.toLong, index.nextSeq)
    }
    // crash: an 11th ingest lands in the index but never reaches its pair
    // append or marker
    val crashed = spark.read.parquet(s"${sf()}/documents.parquet")
      .filter(col("doc_id") >= 300 && col("doc_id") < 330)
    index.ingest(crashed); index.release()
    val (_, postingsPath, docsPath) = NearDupIndex.livePaths(spark, indexDir)
    def committedFiles = (fileFingerprints(docsPath) ++ fileFingerprints(postingsPath))
      .filterNot(_._1.contains("seq=10"))
    val before = committedFiles
    assert(before.nonEmpty)
    assert(fileFingerprints(docsPath).exists(_._1.contains("seq=10")),
      "fixture broken: crashed ingest left no seq=10 partition")
    val (droppedDocs, droppedPostings, scrubbed) =
      NearDupIndex.repairToLastMarker(spark, indexDir, pairsDir)
    assert(droppedDocs == 30L, s"expected the 30 crashed docs dropped, got $droppedDocs")
    assert(droppedPostings > 0L)
    assert(scrubbed == 0L)
    // O(crash), not O(history): every committed shard's file is untouched
    // down to mtime and length, and the crashed partitions are GONE
    assert(committedFiles == before,
      "repair rewrote committed shards' files — recovery is not O(crash)")
    assert(!fileFingerprints(docsPath).exists(_._1.contains("seq=10")) &&
      !fileFingerprints(postingsPath).exists(_._1.contains("seq=10")),
      "crashed seq=10 partitions survived the repair")
    // and the index is consistent: the replayed crashed shard ingests
    // cleanly, and (sunk history + replay) = the one-shot truth over the
    // whole corpus
    val replayPairs = collectPairs(index.ingest(crashed))
    index.release()
    val full = spark.read.parquet(s"${sf()}/documents.parquet")
      .filter(col("doc_id") < 330)
    val wantFull = collectPairs(Dedup.ngramJaccardPairsPrefix(full, "source"))
    val sunk = collectPairs(spark.read.parquet(pairsDir))
    assert(sunk.nonEmpty && replayPairs.nonEmpty, "vacuous replay fixture")
    assert((sunk ++ replayPairs).sorted == wantFull,
      "post-repair replay does not complete the one-shot truth")
  }

  test("rebuild compacts seq partitions: postings always, docs past the threshold; repair + fold stay exact") {
    // the directory count must not grow O(history) under 1-minute triggers
    // for a month (~43k dirs): the rebuild coalesces seqs <= nextSeq-2
    // into one partition — safe because the sink marker protocol keeps any
    // future repair watermark >= nextSeq-1
    import spark.implicits._
    val prevThreshold = NearDupIndex.compactDocsAboveSeqDirs
    NearDupIndex.compactDocsAboveSeqDirs = 3
    try {
      val root = freshDir()
      val indexDir = s"$root/index"
      val pairsDir = s"$root/pairs"
      val index = new NearDupIndex(spark, indexDir, blockCol = "source",
        textCol = "text", idCol = "doc_id")
      val six = (0 until 6).map(i =>
        slice.filter(col("doc_id") >= i * 50 && col("doc_id") < (i + 1) * 50))
      six.zipWithIndex.foreach { case (s, i) =>
        index.ingest(s)
          .select(lit(i.toLong).as("batch_id"), col("block"),
            col("id_a"), col("id_b"), col("jaccard"))
          .write.mode("append").parquet(pairsDir)
        index.release()
        writeMarker(pairsDir, i.toLong, index.nextSeq)
      }
      index.rebuildOrder()
      index.release() // reap the superseded (incl. pre-compaction docs) dirs
      def seqDirCount(table: String): Int =
        localFs.listStatus(new org.apache.hadoop.fs.Path(table))
          .count(_.getPath.getName.startsWith("seq="))
      val (_, postP, docsP) = NearDupIndex.livePaths(spark, indexDir)
      assert(docsP.endsWith("docs-1"), s"doc store not compacted-swapped: $docsP")
      assert(seqDirCount(postP) <= 2, s"postings not coalesced: ${seqDirCount(postP)} dirs")
      assert(seqDirCount(docsP) <= 2, s"docs not coalesced: ${seqDirCount(docsP)} dirs")
      // a crash after the compaction still repairs O(crash) and replays
      val crashed = spark.read.parquet(s"${sf()}/documents.parquet")
        .filter(col("doc_id") >= 300 && col("doc_id") < 330)
      index.ingest(crashed); index.release()
      val (droppedDocs, _, _) = NearDupIndex.repairToLastMarker(spark, indexDir, pairsDir)
      assert(droppedDocs == 30L, s"expected 30 crashed docs dropped, got $droppedDocs")
      val replay = collectPairs(index.ingest(crashed))
      index.release()
      val full = spark.read.parquet(s"${sf()}/documents.parquet")
        .filter(col("doc_id") < 330)
      val wantFull = collectPairs(Dedup.ngramJaccardPairsPrefix(full, "source"))
      val sunk = collectPairs(spark.read.parquet(pairsDir))
      assert((sunk ++ replay).sorted == wantFull,
        "fold across a compacting rebuild + repair differs from the one-shot truth")
    } finally NearDupIndex.compactDocsAboveSeqDirs = prevThreshold
  }

  test("marker roll-up through the sink bounds the live marker set; repair honors the rollup") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = slice.select(col("source").as("block"), col("doc_id").as("id"), col("text"))
      .as[(String, Long, String)].collect()
    val batches = rows.grouped((rows.length + 5) / 6).toSeq // 6 micro-batches
    val root = freshDir()
    val pairsDir = s"$root/pairs"
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long, String)]
    val q = graft.streaming.StreamingOps.startNearDupSink(
      mem.toDS().toDF("block", "id", "text"), 0.3,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(0),
      s"$root/index", pairsDir, markerRollEvery = 2)
    try batches.foreach { b => mem.addData(b.toSeq); q.processAllAvailable() }
    finally q.stop()
    // 6 batches, roll-every-2: live markers stay bounded, _rollup exists
    val live = NearDupIndex.liveMarkerCount(spark, pairsDir)
    assert(live <= 3, s"marker roll-up did not bound the live set: $live files")
    assert(localFs.exists(new org.apache.hadoop.fs.Path(s"$pairsDir/_batches/_rollup")),
      "no _rollup file after crossing markerRollEvery")
    assert(collectPairs(spark.read.parquet(pairsDir)) == want)
    // repair over the rolled-up history: a no-op that reads the rollup
    // boundary, not 6 plan literals
    val res = NearDupIndex.repairToLastMarker(spark, s"$root/index", pairsDir)
    assert(res == ((0L, 0L, 0L)), s"repair over a healthy rolled-up sink: $res")
    assert(collectPairs(spark.read.parquet(pairsDir)) == want)
  }

  test("repair against a 10k-marker history: compaction collapses it; scrub is an anti-join, not 10k literals") {
    import spark.implicits._
    val root = freshDir()
    val pairsDir = s"$root/pairs"
    // committed pairs across 3 early batches + orphans from batch 20000
    (0L until 3L).foreach { b =>
      Seq((b, "src0", b, b + 1000L, 0.5))
        .toDF("batch_id", "block", "id_a", "id_b", "jaccard")
        .write.mode("append").parquet(pairsDir)
    }
    Seq((20000L, "src0", 7L, 8L, 0.9), (20000L, "src0", 9L, 10L, 0.9))
      .toDF("batch_id", "block", "id_a", "id_b", "jaccard")
      .write.mode("append").parquet(pairsDir)
    val t0 = System.nanoTime()
    (0L until 10000L).foreach(i => writeMarker(pairsDir, i, 0L))
    println(f"  [10k markers] wrote in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    NearDupIndex.compactMarkers(spark, pairsDir)
    assert(NearDupIndex.liveMarkerCount(spark, pairsDir) == 0,
      "compaction left live markers behind")
    val (_, _, scrubbed) =
      NearDupIndex.repairToLastMarker(spark, s"$root/index", pairsDir)
    assert(scrubbed == 2L, s"expected the 2 orphaned rows scrubbed, got $scrubbed")
    val left = spark.read.parquet(pairsDir)
    assert(left.count() == 3L && left.filter(col("batch_id") >= 3L).count() == 0L)
    // idempotent rerun stays a no-op against the rollup alone
    assert(NearDupIndex.repairToLastMarker(spark, s"$root/index", pairsDir) ==
      ((0L, 0L, 0L)))
  }

  test("a v1 (flat-layout) index migrates on first write; fold equals all-pairs") {
    import spark.implicits._
    val root = freshDir()
    // forge an r14-shaped index: build shard 1 with the CURRENT code, then
    // flatten its tables (seq as a data column, no partition dirs) and
    // point a v1 manifest at them
    val stage = new NearDupIndex(spark, s"$root/stage")
    val s0 = collectPairs(stage.ingest(shards(0)))
    stage.release()
    val (orderP, postP, docsP) = NearDupIndex.livePaths(spark, s"$root/stage")
    val dir = s"$root/index"
    val v1Docs = spark.read.schema(NearDupIndex.docsSchema).parquet(docsP)
    val v1Post = spark.read.schema(NearDupIndex.postingsSchema).parquet(postP)
    v1Docs.write.parquet(s"$dir/docs-0")       // flat: seq stays a data column
    v1Post.write.parquet(s"$dir/postings-0")
    spark.read.parquet(orderP).write.parquet(s"$dir/order-0")
    val total = v1Docs.count()
    val fs = localFs
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$dir/manifest"), true)
    try out.write(s"v1 0 order-0 postings-0 docs-0 $total $total 1".getBytes("UTF-8"))
    finally out.close()
    // sanity: the flat files really carry seq in-data
    assert(!fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/docs-0"))
      .exists(_.getPath.getName.startsWith("seq=")))
    // first write migrates (epoch bump, partitioned rewrite, v2 manifest),
    // then the fold continues exactly
    val reopened = new NearDupIndex(spark, dir)
    val s1 = collectPairs(reopened.ingest(shards(1)))
    assert(reopened.epoch == 1L, "migration did not bump the epoch")
    val (_, postP2, docsP2) = NearDupIndex.livePaths(spark, dir)
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(docsP2))
      .exists(_.getPath.getName.startsWith("seq=")),
      "migrated doc store is not seq-partitioned")
    assert(docsP2.endsWith("docs-1") && postP2.endsWith("postings-1"))
    val s2 = collectPairs(reopened.ingest(shards(2)))
    val (docsN, _, _) = reopened.stats()
    reopened.release()
    assert(docsN == 300L)
    assert((s0 ++ s1 ++ s2).sorted == want,
      "fold across a v1->v2 migration differs from all-pairs")
  }

  test("a pre-manifest (r13) layout is rejected loudly, never treated as empty") {
    // ADVICE r14 medium: silently starting fresh over a legacy index means
    // old-corpus-vs-new pairs are never emitted and the duplicate guard is
    // blind — the failure is silence, so the fix is a loud error
    val dir = freshDir()
    val fs = localFs
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/docs"))
    fs.create(new org.apache.hadoop.fs.Path(s"$dir/meta"), true).close()
    val ex = intercept[IllegalStateException] {
      new NearDupIndex(spark, dir).epoch
    }
    assert(ex.getMessage.contains("pre-manifest"), ex.getMessage)
  }

  test("an empty/legacy marker body is rejected loudly, not parsed as watermark 0") {
    // ADVICE r14 low: a pre-watermark marker is an EMPTY file; defaulting
    // to 0 would make repair drop every committed row
    import spark.implicits._
    val root = freshDir()
    val pairsDir = s"$root/pairs"
    Seq((0L, "src0", 1L, 2L, 0.5)).toDF("batch_id", "block", "id_a", "id_b", "jaccard")
      .write.mode("append").parquet(pairsDir)
    val fs = localFs
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$pairsDir/_batches"))
    fs.create(new org.apache.hadoop.fs.Path(s"$pairsDir/_batches/0"), true).close() // empty
    val ex = intercept[IllegalStateException] {
      NearDupIndex.repairToLastMarker(spark, s"$root/index", pairsDir)
    }
    assert(ex.getMessage.contains("pre-watermark"), ex.getMessage)
  }

  test("object-store schemes are rejected loudly at every WRITE entry point; reads construct; the conf opts out") {
    // ADVICE r15 low: the contract check moved off the constructor — only
    // writes need rename atomicity, so an index object CAN be constructed
    // against an object-store path (read-only inspection); every write
    // entry still fails loudly at entry, before touching the store.
    val idx = new NearDupIndex(spark, "s3a://bucket/neardup-index") // constructs
    val ex1 = intercept[IllegalArgumentException] { idx.ingest(shards(0)) }
    assert(ex1.getMessage.contains("atomic rename"), ex1.getMessage)
    val ex1b = intercept[IllegalArgumentException] { idx.rebuildOrder() }
    assert(ex1b.getMessage.contains("atomic rename"), ex1b.getMessage)
    val ex1c = intercept[IllegalArgumentException] { idx.migrateLayout() }
    assert(ex1c.getMessage.contains("atomic rename"), ex1c.getMessage)
    val ex2 = intercept[IllegalArgumentException] {
      NearDupIndex.repairToLastMarker(spark, "s3://bucket/idx", freshDir())
    }
    assert(ex2.getMessage.contains("atomic"), ex2.getMessage)
    val ex3 = intercept[IllegalArgumentException] {
      NearDupIndex.maintain(spark, "abfss://container@acct/idx")
    }
    assert(ex3.getMessage.contains("atomic"), ex3.getMessage)
    // a deployment that KNOWS its store renames atomically can opt out:
    // the write proceeds past the contract check and fails on the missing
    // s3a driver instead — a DIFFERENT error, proving the check stood down
    spark.conf.set("spark.graft.neardup.assumeAtomicRename", "true")
    try {
      val ex4 = intercept[Throwable] {
        new NearDupIndex(spark, "s3a://bucket/neardup-index").ingest(shards(0))
      }
      assert(!String.valueOf(ex4.getMessage).contains("atomic rename"),
        s"opt-out conf ignored: ${ex4.getMessage}")
    } finally spark.conf.unset("spark.graft.neardup.assumeAtomicRename")
  }

  test("a crashed rebuild retried after further ingests leaves no orphan epoch rows (ADVICE r15 high)") {
    // a rebuild that crashes AFTER its epoch-(e+1) table writes but BEFORE
    // the manifest swap leaves postings-(e+1)/docs-(e+1) behind; a retry
    // after more ingests writes the SAME dirs under a different coalesce
    // bound, so without the pre-clean the crashed attempt's other seq=
    // partitions survive into the live table at the swap — duplicated doc
    // rows multiplying every later verify join
    val prevThreshold = NearDupIndex.compactDocsAboveSeqDirs
    NearDupIndex.compactDocsAboveSeqDirs = 0 // every rebuild also swaps the docs dir
    try {
      val slice400 = spark.read.parquet(s"${sf()}/documents.parquet")
        .filter(col("doc_id") < 400)
      val four = (0 until 4).map(i =>
        slice400.filter(col("doc_id") >= i * 100 && col("doc_id") < (i + 1) * 100))
      val want400 = collectPairs(Dedup.ngramJaccardPairsPrefix(slice400, "source"))
      // posting-row count is order-independent (prefix LENGTH doesn't
      // depend on the frozen order), so a clean fold over the same corpus
      // gives the exact expected count for the crash-retry fold
      val control = new NearDupIndex(spark, freshDir())
      four.foreach(control.ingest)
      control.rebuildOrder()
      val controlPostings = control.stats()._2
      control.release()

      val index = new NearDupIndex(spark, freshDir())
      val p0 = collectPairs(index.ingest(four(0)))
      val p1 = collectPairs(index.ingest(four(1)))
      // crash between the epoch-1 writes and the swap: at nextSeq=2 the
      // coalesce bound is 0, so the crashed attempt wrote seqs {0,1}
      index.onBeforeRebuildCommit =
        () => throw new RuntimeException("simulated crash before swap")
      val ex = intercept[RuntimeException] { index.rebuildOrder() }
      assert(ex.getMessage.contains("simulated crash"))
      index.onBeforeRebuildCommit = () => ()
      assert(index.epoch == 0L, "crashed rebuild must not have swapped")
      // one more ingest moves the retry's coalesce bound to 1: the retry
      // writes seqs {1,2} — the crashed attempt's seq=0 dirs are exactly
      // the orphans the pre-clean must remove
      val p2 = collectPairs(index.ingest(four(2)))
      index.rebuildOrder()
      val p3 = collectPairs(index.ingest(four(3)))
      val (docsN, postingsN, _) = index.stats()
      index.release()
      assert(docsN == 400L,
        s"doc rows duplicated/lost across the crash-retry: $docsN")
      assert(postingsN == controlPostings,
        s"posting rows $postingsN != control $controlPostings — the crashed " +
          "attempt's orphan seq partitions survived the retry")
      assert((p0 ++ p1 ++ p2 ++ p3).sorted == want400,
        "fold across a crashed-then-retried rebuild differs from all-pairs")
    } finally NearDupIndex.compactDocsAboveSeqDirs = prevThreshold
  }

  test("re-opening with mismatched prefix geometry fails loudly") {
    val dir = freshDir()
    val index = new NearDupIndex(spark, dir, threshold = 0.3)
    index.ingest(shards(0)); index.release()
    val ex = intercept[IllegalStateException] {
      new NearDupIndex(spark, dir, threshold = 0.5).ingest(shards(1))
    }
    assert(ex.getMessage.contains("prefix geometry"), ex.getMessage)
    val ex2 = intercept[IllegalStateException] {
      new NearDupIndex(spark, dir, n = 5).ingest(shards(1))
    }
    assert(ex2.getMessage.contains("prefix geometry"), ex2.getMessage)
    // matching params keep working
    val again = new NearDupIndex(spark, dir, threshold = 0.3)
    again.ingest(shards(1)); again.release()
    assert(again.stats()._1 == 200L)
  }

  test("the budget guard trips THROUGH the sink (VERDICT r14 #3 done-criterion)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = freshDir()
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long, String)]
    val q = graft.streaming.StreamingOps.startNearDupSink(
      mem.toDS().toDF("block", "id", "text"), 0.3,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(0),
      s"$root/index", s"$root/pairs", maxCandidateBudget = 50000L)
    // 400 docs collapsing onto one shared shingle: pdf² = 160k > 50k
    val hot = (0L until 400L).map(i => ("hotsrc", i, "aaaaaaaaaaaaaaaaaaaaaaaa"))
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      mem.addData(hot); q.processAllAvailable()
    }
    try {
      def hasBudget(t: Throwable): Boolean = t != null &&
        (Option(t.getMessage).exists(_.contains("maxCandidateBudget")) ||
          hasBudget(t.getCause))
      assert(hasBudget(ex), s"sink failure did not carry the budget message: ${ex.getMessage}")
    } finally if (q.isActive) q.stop()
  }

  test("clusteredWrites through the sink: output exact; posting files key-sorted within partitions") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = slice.select(col("source").as("block"), col("doc_id").as("id"), col("text"))
      .as[(String, Long, String)].collect()
    val batches = rows.grouped((rows.length + 2) / 3).toSeq
    val root = freshDir()
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long, String)]
    val q = graft.streaming.StreamingOps.startNearDupSink(
      mem.toDS().toDF("block", "id", "text"), 0.3,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(0),
      s"$root/index", s"$root/pairs", clusteredWrites = true)
    try batches.foreach { b => mem.addData(b.toSeq); q.processAllAvailable() }
    finally q.stop()
    assert(collectPairs(spark.read.parquet(s"$root/pairs")) == want,
      "clustered-layout sink differs from all-pairs")
    // the flag reached the index: inside one posting part file, rows are
    // sorted by the probe key (block, h) — the row-group-skippable layout
    val (_, postP, _) = NearDupIndex.livePaths(spark, s"$root/index")
    val fs = localFs
    // the growth policy may have rebuilt (coalescing early seqs) — probe
    // the smallest live seq partition, whichever it is
    val seqDir = fs.listStatus(new org.apache.hadoop.fs.Path(postP))
      .map(_.getPath).filter(_.getName.startsWith("seq="))
      .minBy(_.getName.drop(4).toLong)
    val partFile = fs.listStatus(seqDir)
      .map(_.getPath).find(_.getName.endsWith(".parquet"))
    assert(partFile.nonEmpty, s"no parquet part under $seqDir")
    val inFile = spark.read.parquet(partFile.get.toString)
      .select("block", "h").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(inFile.length > 1, "degenerate part file")
    assert(inFile.sameElements(inFile.sortBy(identity)),
      "clusteredWrites posting file is not sorted by (block, h)")
  }
}
