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
