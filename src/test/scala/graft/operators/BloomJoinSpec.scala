package graft.operators

import org.apache.spark.sql.functions._

/** Bloom-prefiltered joins must be EXACTLY the plain semi/anti joins —
  * the filter only prunes (one-sided error), the confirm join removes the
  * false-positive sliver. */
class BloomJoinSpec extends graft.SparkTestBase {

  private def docs = spark.read.parquet(s"${sf()}/documents.parquet")
    .select(col("doc_id"), md5(col("text")).as("content_hash"))

  test("bloomAntiJoin equals plain left_anti on the real corpus") {
    val keys = docs.filter(col("doc_id") % 7 === 0).select(col("content_hash"))
    val got = BloomJoin.bloomAntiJoin(docs, keys, "content_hash", expectedKeys = 1000L)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    val want = docs.join(keys.distinct(), Seq("content_hash"), "left_anti")
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    assert(got.toSeq === want.toSeq)
    assert(want.nonEmpty && want.length < docs.count())
  }

  test("bloomSemiJoin equals plain left_semi on the real corpus") {
    val keys = docs.filter(col("doc_id") % 5 === 0).select(col("content_hash"))
    val got = BloomJoin.bloomSemiJoin(docs, keys, "content_hash", expectedKeys = 1000L)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    val want = docs.join(keys.distinct(), Seq("content_hash"), "left_semi")
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    assert(got.toSeq === want.toSeq)
    assert(want.nonEmpty)
  }

  test("empty key set: anti keeps everything, semi keeps nothing") {
    import spark.implicits._
    val big = (0L until 100L).toDF("k")
    val none = big.filter(col("k") < 0)
    assert(BloomJoin.bloomAntiJoin(big, none, "k", expectedKeys = 10L).count() === 100L)
    assert(BloomJoin.bloomSemiJoin(big, none, "k", expectedKeys = 10L).count() === 0L)
  }

  test("overloaded filter (nonempty survivor frame): still exact, schema preserved") {
    import spark.implicits._
    // the r12 sf1 failure class: when the key count outgrows expectedKeys,
    // bloom FALSE POSITIVES materialize the survivor branch — which must
    // union onto the clean branch with big's exact column order (a USING
    // join emits the key first; positional unionAll would pair doc ids
    // with content hashes under ANSI casts). Force survivors with a
    // deliberately undersized filter over string keys and a NON-key-first
    // column order.
    val big = (0L until 4000L).map(i => (i, s"k_$i")).toDF("id", "key")
    val keys = (0L until 4000L by 3L).map(i => s"k_$i").toDF("key")
    val anti = BloomJoin.bloomAntiJoin(big, keys, "key", expectedKeys = 16L, fpp = 0.2)
    assert(anti.columns.toSeq == Seq("id", "key"), s"schema: ${anti.columns.toSeq}")
    val gotAnti = anti.select(col("id")).collect().map(_.getLong(0)).sorted
    val wantAnti = big.join(keys.distinct(), Seq("key"), "left_anti")
      .select(col("id")).collect().map(_.getLong(0)).sorted
    assert(gotAnti.toSeq === wantAnti.toSeq)
    // the survivor branch really fired: with 1334 keys in a 16-key filter
    // the probe passes nearly everything, so clean ∪ survivors both exist
    val bf = BloomJoin.buildFilter(keys, "key", 16L, 0.2)
    val passed = big.filter(BloomJoin.mightContain(bf, col("key"))).count()
    assert(passed > 1334, s"expected false positives, probe passed only $passed")
    val semi = BloomJoin.bloomSemiJoin(big, keys, "key", expectedKeys = 16L, fpp = 0.2)
    assert(semi.columns.toSeq == Seq("id", "key"))
    val gotSemi = semi.select(col("id")).collect().map(_.getLong(0)).sorted
    val wantSemi = big.join(keys.distinct(), Seq("key"), "left_semi")
      .select(col("id")).collect().map(_.getLong(0)).sorted
    assert(gotSemi.toSeq === wantSemi.toSeq)
  }

  test("probe has no false negatives even at high fpp") {
    import spark.implicits._
    // tiny filter (64 expected, 20% fpp) over 5000 keys: lots of false
    // positives by construction, but every true member must still pass
    val keys = (0L until 5000L by 13L).toDF("k")
    val bf = BloomJoin.buildFilter(keys, "k", expectedKeys = 64L, fpp = 0.2)
    val big = (0L until 5000L).toDF("k")
    val passed = big.filter(BloomJoin.mightContain(bf, col("k")))
      .collect().map(_.getLong(0)).toSet
    val members = (0L until 5000L by 13L).toSet
    assert((members -- passed).isEmpty, "bloom filter dropped a true member")
    assert(passed.size < 5000, "probe should prune at least something")
  }
}
