package graft.operators

import graft.SparkTestBase

/** BPE training semantics on the textbook example (hug/pug/pun/bun/hugs
  * word frequencies), plus determinism and stop conditions. */
class BpeTrainSpec extends SparkTestBase {

  private def corpusOf(wordCounts: (String, Int)*) = {
    import spark.implicits._
    wordCounts.zipWithIndex.map { case ((w, n), i) =>
      (i.toLong, Seq.fill(n)(w).mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("learns the textbook merge sequence with non-increasing frequencies") {
    val docs = corpusOf("hug" -> 10, "pug" -> 5, "pun" -> 12, "bun" -> 4, "hugs" -> 5)
    val got = BpeTrain.train(docs, nMerges = 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .sortBy(_._1)
    assert(got.toSeq === Seq(
      (1, "u", "g", "ug", 20L),
      (2, "u", "n", "un", 16L),
      (3, "h", "ug", "hug", 15L),
      (4, "p", "un", "pun", 12L)))
    // the invariant the scaladoc claims: merge frequencies never increase
    assert(got.map(_._5).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("frequency ties break lexicographically on (left, right)") {
    val docs = corpusOf("zx" -> 3, "ab" -> 3)
    val got = BpeTrain.train(docs, nMerges = 1).collect()
    assert(got.length === 1)
    assert((got(0).getString(1), got(0).getString(2)) === (("a", "b")))
  }

  test("stops below minPairFreq; parallelism-invariant on a real corpus slice") {
    import org.apache.spark.sql.functions._
    val none = BpeTrain.train(corpusOf("ab" -> 1, "cd" -> 1), nMerges = 5, minPairFreq = 2L)
    assert(none.count() === 0L)
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .filter(col("doc_id") < 100)
    val a = BpeTrain.train(docs, nMerges = 8).collect().map(_.toSeq).toSeq
    val b = BpeTrain.train(docs.repartition(13), nMerges = 8).collect().map(_.toSeq).toSeq
    assert(a === b, "merge list must not depend on partitioning")
    assert(a.length === 8)
  }

  test("mergePair: greedy leftmost non-overlapping") {
    assert(BpeTrain.mergePair(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
    assert(BpeTrain.mergePair(Seq("a", "b", "a", "b"), "a", "b") === Seq("ab", "ab"))
    assert(BpeTrain.mergePair(Seq("x"), "a", "b") === Seq("x"))
  }
}
