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
