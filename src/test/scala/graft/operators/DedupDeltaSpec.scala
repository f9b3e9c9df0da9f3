package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The shard-append delta operator's contract: exactly the full-corpus
  * pair set restricted to delta-touching pairs — nothing missed by the
  * one-sided prefix bound, nothing invented. */
class DedupDeltaSpec extends SparkTestBase {

  private def check(sfDir: String, t: Double): Unit = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val isDelta = col("doc_id") >= 400
    val got = Dedup.ngramJaccardDelta(
        docs.filter(!isDelta), docs.filter(isDelta), "source", threshold = t)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sorted.toSeq
    val want = Dedup.ngramJaccardPairsPrefix(docs, "source", threshold = t)
      .filter(col("id_a") >= 400 || col("id_b") >= 400)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sorted.toSeq
    assert(got == want, s"t=$t: delta pair set differs from the filtered full set " +
      s"(got ${got.size}, want ${want.size})")
    assert(want.nonEmpty, s"t=$t: vacuous comparison")
    // the delta set must include history–delta pairs, not just delta–delta
    assert(want.exists(p => (p._2 >= 400) != (p._3 >= 400)),
      s"t=$t: no cross (history, delta) pair in the fixture — weak corpus slice")
  }

  test("delta near-dup equals the filtered full-corpus pair set (two thresholds)") {
    for (t <- Seq(0.3, 0.5)) check(s"${sf()}", t)
  }

  test("streaming ingestion loop: three micro-batches reproduce the full all-pairs set") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val slice = spark.read.parquet(s"${sf()}/documents.parquet")
      .filter(col("doc_id") < 300)
      .select(col("source").as("block"), col("doc_id").as("id"), col("text"))
    val rows = slice.as[(String, Long, String)].collect()
    val batches = rows.grouped((rows.length + 2) / 3).toSeq
    assert(batches.size == 3)
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long, String)]
    // drive each shard through its own micro-batch so the loop's history
    // state crosses real batch boundaries (asserted via distinct batch ids)
    val loop = graft.streaming.StreamingOps.startNearDupLoop(
      mem.toDS().toDF("block", "id", "text"), 0.3,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    val emissions = try {
      batches.foreach { b => mem.addData(b.toSeq); loop.query.processAllAvailable() }
      loop.emissions
    } finally loop.close()
    val got = emissions.toDF("batch_id", "block", "id_a", "id_b", "jaccard")
    val gotPairs = got.select("block", "id_a", "id_b", "jaccard")
      .as[(String, Long, Long, Double)].collect().sorted.toSeq
    val want = Dedup.ngramJaccardPairsPrefix(
        slice.withColumnRenamed("block", "source")
          .withColumnRenamed("id", "doc_id"), "source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sorted.toSeq
    assert(gotPairs == want,
      s"streamed union (${gotPairs.size}) differs from batch all-pairs (${want.size})")
    assert(want.nonEmpty, "vacuous comparison")
    val batchIds = got.select("batch_id").distinct().as[Long].collect().toSet
    assert(batchIds.size >= 2, s"pairs all landed in one micro-batch: $batchIds")
  }

  test("empty delta: no pairs; empty history: delta-internal pairs only") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val none = docs.filter(col("doc_id") < 0)
    assert(Dedup.ngramJaccardDelta(docs, none, "source").count() == 0L)
    val deltaOnly = Dedup.ngramJaccardDelta(none, docs.filter(col("doc_id") < 300), "source")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val full = Dedup.ngramJaccardPairsPrefix(docs.filter(col("doc_id") < 300), "source")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(deltaOnly == full, "history-free delta must equal the full join on the delta")
  }
}
