package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The candidate-budget guard (VERDICT r12 #3): the exact n-gram joins can
  * be told to PRICE themselves before running — a hot-shingle corpus whose
  * prefix-candidate estimate exceeds the budget must fail loudly with the
  * remediation menu, and a generous budget must be a pure no-op (identical
  * output, guard pass included). */
class CandidateBudgetSpec extends SparkTestBase {

  import spark.implicits._

  /** 80 docs sharing one long hot substring — every doc's prefix keeps
    * shingles with df ≈ 80, so candidates ≈ C(80,2) per shared prefix
    * shingle: exactly the shape that detonates at crawl scale. */
  private lazy val hotCorpus = (0 until 80).map { i =>
    val hot = "the quick brown fox jumps over the lazy dog again and again"
    (i.toLong, s"$hot tail$i", "web")
  }.toDF("doc_id", "text", "source")

  test("hot-shingle corpus trips the guard with the remediation message") {
    val ex = intercept[IllegalStateException] {
      Dedup.ngramJaccardPairsPrefix(hotCorpus, "source", maxCandidateBudget = 100)
    }
    assert(ex.getMessage.contains("maxCandidateBudget"), ex.getMessage)
    assert(ex.getMessage.contains("minhashNearDup"), ex.getMessage)
    val exDelta = intercept[IllegalStateException] {
      Dedup.ngramJaccardDelta(
        hotCorpus.filter(col("doc_id") < 40), hotCorpus.filter(col("doc_id") >= 40),
        "source", maxCandidateBudget = 100)
    }
    assert(exDelta.getMessage.contains("ngramJaccardDelta"), exDelta.getMessage)
  }

  test("generous budget: guard passes and output is identical to the unguarded join") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .filter(col("doc_id") < 300)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .sorted.toSeq
    val unguarded = pairs(Dedup.ngramJaccardPairsPrefix(docs, "source"))
    val guarded = pairs(Dedup.ngramJaccardPairsPrefix(docs, "source",
      maxCandidateBudget = 100_000_000L))
    assert(unguarded.nonEmpty && guarded == unguarded)
  }
}
