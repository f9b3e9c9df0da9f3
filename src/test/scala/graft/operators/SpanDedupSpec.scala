package graft.operators

import org.apache.spark.sql.functions._

class SpanDedupSpec extends graft.SparkTestBase {

  private def run(docs: Seq[(Long, String)], n: Int): Map[String, (Long, Long, Long)] = {
    import spark.implicits._
    TextOps.duplicateSpans(docs.toDF("doc_id", "text"), n = n)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
  }

  test("counts docs, occurrences and first carrier per shared span") {
    val docs = Seq(
      1L -> "the quick brown fox jumps",
      2L -> "a lazy dog saw the quick brown fox yawn", // shares "the quick brown fox"
      3L -> "the quick brown fox jumps high and the quick brown fox jumps", // 2 occurrences
      4L -> "nothing in common here at all")
    val out = run(docs, n = 4)
    assert(out("the quick brown fox") === ((3L, 4L, 1L)))
    assert(out("quick brown fox jumps") === ((2L, 3L, 1L)))
    assert(!out.keys.exists(_.contains("lazy dog")), "unshared spans must not appear")
  }

  test("docs shorter than n contribute their whole text as one span") {
    val docs = Seq(1L -> "tiny doc", 2L -> "tiny doc", 3L -> "other text")
    val out = run(docs, n = 8)
    assert(out === Map("tiny doc" -> ((2L, 2L, 1L))))
  }

  test("hash-keyed production variant agrees with the string-keyed oracle form") {
    val docs = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
    val byString = TextOps.duplicateSpans(docs, n = 8)
      .select(xxhash64(col("span")).as("span_hash"), col("n_docs"),
        col("n_occurrences"), col("first_doc")).collect().toSet
    val byHash = TextOps.duplicateSpanHashes(docs, n = 8).collect().toSet
    assert(byHash === byString && byHash.nonEmpty)
  }

  test("parallelism-independent") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, s"shared prefix span here plus tail ${i % 9}")).toDF("doc_id", "text")
    val a = TextOps.duplicateSpans(docs.repartition(1), n = 5).collect().toSet
    val b = TextOps.duplicateSpans(docs.repartition(7), n = 5).collect().toSet
    assert(a === b && a.nonEmpty)
  }
}
