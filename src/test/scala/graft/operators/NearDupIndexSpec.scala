package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The incrementally-maintained near-dup index's three contracts
  * (VERDICT r12 #1):
  *   1. exactness — folding shards through [[NearDupIndex.ingest]]
  *      reproduces the full all-pairs set, with and without an exact
  *      [[NearDupIndex.rebuildOrder]] in the middle of the fold;
  *   2. completeness under staleness — the candidate stage never misses a
  *      true pair no matter how far the frozen df spectrum has drifted
  *      (the AllPairs prefix theorem holds under ANY single global order);
  *   3. rebuild neutrality — prefix lengths are order-independent, so a
  *      rebuild re-ranks postings without changing their count or any
  *      emitted result.
  */
class NearDupIndexSpec extends SparkTestBase {

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-ndi-spec").toString

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

  test("shard fold through the index equals the full all-pairs set") {
    val index = new NearDupIndex(spark, freshDir())
    val got = shards.flatMap(s => collectPairs(index.ingest(s))).sorted
    index.release()
    assert(want.nonEmpty, "vacuous comparison")
    assert(got == want, s"index fold (${got.size}) differs from all-pairs (${want.size})")
    // the fold must produce cross-shard pairs, not just within-shard ones
    assert(want.exists(p => p._2 / 100 != p._3 / 100),
      "no cross-shard pair in the fixture — weak corpus slice")
  }

  test("mid-fold rebuildOrder: emitted results unchanged, posting count invariant") {
    val index = new NearDupIndex(spark, freshDir())
    val step1 = collectPairs(index.ingest(shards(0)))
    val (_, postingsBefore, orderBefore) = index.stats()
    index.rebuildOrder() // frozen spectrum now exact for shard 1's corpus
    val (_, postingsAfter, orderAfter) = index.stats()
    // prefix length nsh − ⌈t·nsh⌉ + 1 does not depend on the order, so a
    // rebuild re-RANKS the posting table without growing or shrinking it
    assert(postingsAfter == postingsBefore,
      s"rebuild changed posting count: $postingsBefore -> $postingsAfter")
    // the seed order (shard 1's own spectrum) was already exact for shard 1,
    // so the rebuilt spectrum covers at least the same shingles
    assert(orderAfter >= orderBefore, s"order shrank: $orderBefore -> $orderAfter")
    val rest = shards.drop(1).flatMap(s => collectPairs(index.ingest(s)))
    index.release()
    assert((step1 ++ rest).sorted == want,
      "fold with a mid-fold rebuild differs from all-pairs")
  }

  test("stale frozen order: candidates remain a superset of the true pairs") {
    // seed the order from shard 1 ONLY, then never rebuild: by shard 3 the
    // frozen spectrum is badly stale (two thirds of the corpus unseen, all
    // its new shingles ranked df=0). Candidates must STILL contain every
    // true pair touching the incoming shard — staleness widens the
    // candidate set, never punches holes in it.
    val index = new NearDupIndex(spark, freshDir())
    index.ingest(shards(0))
    index.ingest(shards(1))
    index.release()
    val candidates = index.candidatesFor(shards(2))
      .select("block", "id_a", "id_b")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val trueTouching = want.filter(p => p._2 >= 200 || p._3 >= 200)
      .map(p => (p._1, p._2, p._3)).toSet
    assert(trueTouching.nonEmpty, "vacuous: no shard-3-touching true pairs")
    assert(trueTouching.subsetOf(candidates),
      s"stale-order candidates missed ${(trueTouching -- candidates).size} true pairs")
  }

  test("incrementalNearDup delegates to the index and matches all-pairs") {
    val got = collectPairs(Dedup.incrementalNearDup(shards, "source"))
    assert(got == want)
  }

  test("maybeRebuild: fires once the corpus doubles past the frozen spectrum, then rests") {
    val index = new NearDupIndex(spark, freshDir())
    val s0 = collectPairs(index.ingest(shards(0)))  // seeds order at n0
    assert(!index.maybeRebuild(), "rebuild must not fire at 1.0x growth")
    val s1 = collectPairs(index.ingest(shards(1))) // ~2.0x the seed corpus
    assert(index.maybeRebuild(1.5), "rebuild due past the growth factor")
    assert(!index.maybeRebuild(1.5), "rebuild must rest after running")
    val s2 = collectPairs(index.ingest(shards(2)))
    index.release()
    assert((s0 ++ s1 ++ s2).sorted == want,
      "fold with policy-driven rebuild differs from all-pairs")
  }

  test("re-ingesting a (block,id) key is rejected loudly, not silently multiplied") {
    val index = new NearDupIndex(spark, freshDir())
    index.ingest(shards(0))
    index.release()
    val ex = intercept[IllegalArgumentException] { index.ingest(shards(0)) }
    assert(ex.getMessage.contains("already in the index"), ex.getMessage)
  }

  test("a delta carrying the same (block,id) twice is rejected, and the index stays clean") {
    // ADVICE r13 medium: the r13 guard only semi-joined against STORED
    // docs, so an intra-batch replay (same doc twice in one micro-batch)
    // passed silently and multiplied every pair touching the doc forever.
    val index = new NearDupIndex(spark, freshDir())
    val s0 = collectPairs(index.ingest(shards(0)))
    val doubled = shards(1).unionAll(shards(1).limit(5))
    val ex = intercept[IllegalArgumentException] { index.ingest(doubled) }
    assert(ex.getMessage.contains("WITHIN itself"), ex.getMessage)
    // the rejection happens BEFORE any append (and unpersists its frames,
    // ADVICE r13 low) — the clean shards then fold to the exact all-pairs
    // set as if the bad delta never happened
    val rest = Seq(shards(1), shards(2)).flatMap(s => collectPairs(index.ingest(s)))
    val nDocs = index.stats()._1
    index.release()
    assert(nDocs == 300L, s"doc store not clean after rejected delta: $nDocs")
    assert((s0 ++ rest).sorted == want,
      "fold around a rejected delta differs from all-pairs")
  }

  test("crash between a rebuild's table writes and its manifest swap leaves the old consistent set live") {
    // VERDICT r13 #3: the r13 in-place overwrite could strand order/ and
    // postings/ under DIFFERENT orders — breaking the one-global-order
    // invariant the candidate-completeness proof needs. The manifest
    // design makes the swap the single commit point: kill the rebuild
    // right before it and the index must behave as if the rebuild never
    // started.
    val index = new NearDupIndex(spark, freshDir())
    val s0 = collectPairs(index.ingest(shards(0)))
    val s1 = collectPairs(index.ingest(shards(1)))
    val epochBefore = index.epoch
    val (_, postingsBefore, orderBefore) = index.stats()
    index.onBeforeRebuildCommit =
      () => throw new RuntimeException("injected crash before manifest swap")
    val ex = intercept[RuntimeException] { index.rebuildOrder() }
    assert(ex.getMessage.contains("injected crash"))
    index.onBeforeRebuildCommit = () => ()
    // live set unchanged: same epoch, same order + postings contents
    assert(index.epoch == epochBefore, "crashed rebuild advanced the epoch")
    val (_, postingsAfter, orderAfter) = index.stats()
    assert((postingsAfter, orderAfter) == (postingsBefore, orderBefore),
      s"crashed rebuild mutated the live tables: " +
        s"($postingsBefore,$orderBefore) -> ($postingsAfter,$orderAfter)")
    // and the fold still completes exactly — ingest ranks under the OLD
    // order that the OLD postings were written with
    val s2 = collectPairs(index.ingest(shards(2)))
    index.release()
    assert((s0 ++ s1 ++ s2).sorted == want,
      "fold after a crashed rebuild differs from all-pairs")
    // a retried rebuild then commits normally
    index.rebuildOrder()
    assert(index.epoch == epochBefore + 1)
  }

  test("ingest budget guard: a hot-shingle delta trips pre-flight; a generous budget changes nothing") {
    // VERDICT r13 #6: the stored frozen spectrum IS the priced df table —
    // the guard costs one delta-sized join, never a corpus scan.
    import spark.implicits._
    // the estimate's floor is ~2x the delta's prefix postings (pdf² keeps
    // self-matches a join can exclude but a spectrum cannot), so the budget
    // must sit above the normal slice's floor and below the hot delta's
    // pdfΔ² blow-up
    val dir = freshDir()
    val guarded = new NearDupIndex(spark, dir, maxCandidateBudget = 100000L)
    guarded.ingest(slice.filter(col("doc_id") < 100))
    guarded.release()
    // 400 docs collapsing to ONE shared shingle: pdfΔ² alone = 160k > 100k
    val hot = (1000L until 1400L).map(i => ("hotsrc", i, "aaaaaaaaaaaaaaaaaaaaaaaa"))
      .toDF("source", "doc_id", "text")
    val ex = intercept[IllegalStateException] { guarded.ingest(hot) }
    assert(ex.getMessage.contains("maxCandidateBudget"), ex.getMessage)
    guarded.release()
    // generous budget: output identical to the unguarded fold
    val generous = new NearDupIndex(spark, freshDir(), maxCandidateBudget = 100000000L)
    val got = shards.flatMap(s => collectPairs(generous.ingest(s))).sorted
    generous.release()
    assert(got == want, "budget-guarded fold differs from all-pairs")
  }

  test("clusteredWrites layout: fold equals all-pairs; postings files sorted by the probe key") {
    val dir = freshDir()
    val index = new NearDupIndex(spark, dir, clusteredWrites = true)
    val got = shards.flatMap(s => collectPairs(index.ingest(s))).sorted
    index.rebuildOrder() // the rewrite path must use the layout too
    val rest = index.stats() // readable post-rebuild
    index.release()
    assert(got == want, "clustered-layout fold differs from all-pairs")
    assert(rest._1 == 300L)
  }

  test("sink policy: a long bounded stream triggers a rebuild MID-stream; output still equals all-pairs") {
    // VERDICT r13 #1 done-criterion: the production entry points must
    // invoke maybeRebuild themselves — r13 shipped the policy but nothing
    // production-shaped called it, so a month-long crawl stream kept its
    // day-one frozen order forever.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = slice.select(col("source").as("block"), col("doc_id").as("id"), col("text"))
      .as[(String, Long, String)].collect()
    val batches = rows.grouped((rows.length + 2) / 3).toSeq
    val indexDir = freshDir()
    val pairsDir = freshDir() + "/pairs"
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long, String)]
    val q = graft.streaming.StreamingOps.startNearDupSink(
      mem.toDS().toDF("block", "id", "text"), 0.3,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(0),
      indexDir, pairsDir, growthFactor = 1.5)
    def epochNow = new NearDupIndex(spark, indexDir).epoch
    try {
      mem.addData(batches(0).toSeq); q.processAllAvailable()
      assert(epochNow == 0L, "rebuild fired before any growth")
      mem.addData(batches(1).toSeq); q.processAllAvailable()
      // 2x the seed corpus > 1.5x → the policy must have rebuilt, with the
      // stream still LIVE (mid-stream, not a shutdown pass)
      assert(q.isActive && epochNow >= 1L,
        s"no policy-driven rebuild after doubling (epoch=$epochNow)")
      mem.addData(batches(2).toSeq); q.processAllAvailable()
    } finally q.stop()
    val got = collectPairs(spark.read.parquet(pairsDir))
    assert(got == want,
      s"sunk pairs with mid-stream rebuild (${got.size}) differ from all-pairs (${want.size})")
  }

  test("mid-batch crash: replay is rejected loudly, repairToLastMarker recovers, replay then succeeds") {
    // VERDICT r13 #7: this codes the recovery that was previously a
    // comment — "restore the index tables to the last marker".
    import spark.implicits._
    val root = freshDir()
    val indexDir = s"$root/index"
    val pairsDir = s"$root/pairs"
    val ckpt = s"$root/ckpt"
    val in = s"$root/in"
    new java.io.File(in).mkdirs()
    val rows = slice.select(col("source").as("block"), col("doc_id").as("id"), col("text"))
    def part(lo: Long, hi: Long) = rows.filter(col("id") >= lo && col("id") < hi)
    def addFile(name: String, lo: Long, hi: Long): Unit =
      part(lo, hi).coalesce(1).write.mode("overwrite").parquet(s"$in/$name")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "block STRING, id LONG, text STRING")
    def runSink(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true").parquet(in)
      val q = graft.streaming.StreamingOps.startNearDupSink(stream, 0.3,
        org.apache.spark.sql.streaming.Trigger.AvailableNow(),
        indexDir, pairsDir, checkpointDir = Some(ckpt))
      try q.awaitTermination() finally if (q.isActive) q.stop()
    }
    addFile("b1", 0, 100); addFile("b2", 100, 200)
    runSink() // batches 0 and 1 committed (markers + watermarks)
    // CRASH SIMULATION: batch 3's docs reach the index, but the pairs
    // append and the marker never happen (killed mid-batch). Also leave an
    // orphaned pair append from the same kind of window one batch later.
    val crashed = new NearDupIndex(spark, indexDir, blockCol = "block",
      textCol = "text", idCol = "id")
    crashed.ingest(part(200, 250)); crashed.release()
    Seq(("src0", 1L, 2L, 0.9))
      .toDF("block", "id_a", "id_b", "jaccard")
      .select(lit(99L).as("batch_id"), col("block"), col("id_a"), col("id_b"), col("jaccard"))
      .write.mode("append").parquet(pairsDir)
    // the replay of the crashed shard MUST abort loudly (not corrupt)
    addFile("b3", 200, 250)
    val replayEx = intercept[org.apache.spark.sql.streaming.StreamingQueryException] { runSink() }
    assert(replayEx.getMessage.contains("already in the index") ||
      Option(replayEx.getCause).exists(_.getMessage.contains("already in the index")),
      s"replay did not trip the duplicate-key rejection: ${replayEx.getMessage}")
    // recover: drop the crashed ingest's index rows + scrub orphaned pairs
    val (droppedDocs, droppedPostings, scrubbedPairs) =
      NearDupIndex.repairToLastMarker(spark, indexDir, pairsDir)
    assert(droppedDocs == 50L, s"expected the 50 crashed docs dropped, got $droppedDocs")
    assert(droppedPostings > 0L)
    assert(scrubbedPairs == 1L, s"expected the 1 orphaned pair row scrubbed, got $scrubbedPairs")
    // the replay now succeeds, and the rest of the corpus flows through
    runSink()
    addFile("b4", 250, 300)
    runSink()
    val got = collectPairs(spark.read.parquet(pairsDir))
    assert(got == want,
      s"post-repair pairs (${got.size}) differ from all-pairs (${want.size})")
    // repair is idempotent: a second run finds nothing to do
    val again = NearDupIndex.repairToLastMarker(spark, indexDir, pairsDir)
    assert(again == ((0L, 0L, 0L)), s"second repair was not a no-op: $again")
  }

  test("pairs scrub survives a crash before its commit: no committed row lost or duplicated") {
    // The scrub rewrites the pairs table; a naive delete-then-move window
    // would LOSE committed rows and a rerun would silently skip the
    // scrub. Kill the scrub at its failpoint (old files parked, new files
    // half-live, commit not reached) and prove the rerun converges.
    import spark.implicits._
    val root = freshDir()
    val pairsDir = s"$root/pairs"
    def pairRows(batchId: Long, n: Int) =
      (0 until n).map(i => (batchId, "src0", i.toLong, i + 1000L, 0.5))
        .toDF("batch_id", "block", "id_a", "id_b", "jaccard")
    pairRows(0L, 20).write.mode("append").parquet(pairsDir)
    pairRows(99L, 3).write.mode("append").parquet(pairsDir) // orphaned batch
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$pairsDir/_batches"))
    // marker for batch 0 only; watermark content irrelevant here (no index
    // rows) but must parse
    val mk = fs.create(new org.apache.hadoop.fs.Path(s"$pairsDir/_batches/0"), true)
    mk.write("0".getBytes("UTF-8")); mk.close()
    // a minimal consistent index dir (empty manifest state)
    val indexDir = s"$root/index"
    NearDupIndex.onBeforePairsScrubCommit =
      () => throw new RuntimeException("injected crash before scrub commit")
    val ex = intercept[RuntimeException] {
      NearDupIndex.repairToLastMarker(spark, indexDir, pairsDir)
    }
    assert(ex.getMessage.contains("injected crash"))
    NearDupIndex.onBeforePairsScrubCommit = () => ()
    // rerun converges: orphan scrubbed exactly once, committed rows intact
    val (_, _, scrubbed) = NearDupIndex.repairToLastMarker(spark, indexDir, pairsDir)
    assert(scrubbed == 3L, s"rerun scrubbed $scrubbed, expected the 3 orphaned rows")
    val left = spark.read.parquet(pairsDir)
    assert(left.count() == 20L, s"committed rows lost/duplicated: ${left.count()}")
    assert(left.filter(col("batch_id") =!= 0L).count() == 0L)
    // and no protocol residue under the table
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(pairsDir))
      .map(_.getPath.getName).toSet
    assert(!names.contains(".repair-old") && !names.exists(_.startsWith("repaired-")),
      s"scrub residue left behind: $names")
  }

  test("production sink: per-batch parquet appends union to the all-pairs set") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = slice.select(col("source").as("block"), col("doc_id").as("id"), col("text"))
      .as[(String, Long, String)].collect()
    val batches = rows.grouped((rows.length + 2) / 3).toSeq
    val pairsDir = freshDir() + "/pairs"
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long, String)]
    val q = graft.streaming.StreamingOps.startNearDupSink(
      mem.toDS().toDF("block", "id", "text"), 0.3,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(0),
      freshDir(), pairsDir)
    try batches.foreach { b => mem.addData(b.toSeq); q.processAllAvailable() }
    finally q.stop()
    val sunk = spark.read.parquet(pairsDir)
    val got = collectPairs(sunk)
    assert(got == want, s"sunk pairs (${got.size}) differ from all-pairs (${want.size})")
    // the sink is the production artifact: batch ids must span >1 trigger
    assert(sunk.select("batch_id").distinct().count() >= 2,
      "all pairs landed in one micro-batch — loop state untested")
    // retry idempotency: one marker per committed batch, hidden from the
    // parquet reader (underscore path), so a re-delivered batch skips whole
    val markers = new java.io.File(s"$pairsDir/_batches").list()
    assert(markers != null && markers.length >= 2, s"missing batch markers: $markers")
  }
}
