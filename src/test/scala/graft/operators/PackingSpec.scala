package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class PackingSpec extends SparkTestBase {

  private def mkDocs(sizes: Seq[Int]) = {
    import spark.implicits._
    sizes.zipWithIndex.map { case (n, i) =>
      (i.toLong, Seq.fill(n)("tok").mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("packSequences: every doc packed once, budget respected, totals preserved") {
    import spark.implicits._
    val sizes = Seq(500, 300, 300, 200, 120, 100, 50, 10, 10, 2)
    val packed = Packing.packSequences(mkDocs(sizes), budget = 512, numPartitions = 2)
    val rows = packed.as[(Long, Long, Long)].collect()
    // every doc exactly once
    assert(rows.map(_._1).sorted.toSeq == (0L until sizes.length).toSeq)
    // token counts survived the pipeline
    assert(rows.map(_._2).sum == sizes.sum)
    // no bin over budget (no doc here exceeds it)
    val binTotals = rows.groupBy(_._3).view.mapValues(_.map(_._2).sum)
    assert(binTotals.values.forall(_ <= 512), s"over-budget bins: $binTotals")
    // packing actually packs: fewer bins than docs
    assert(binTotals.size < sizes.length)
  }

  test("packSequences: oversized doc becomes a singleton overflow bin") {
    import spark.implicits._
    val packed = Packing.packSequences(mkDocs(Seq(600, 100, 100)), budget = 512,
      numPartitions = 1)
    val rows = packed.as[(Long, Long, Long)].collect()
    val big = rows.find(_._1 == 0L).get
    // the 600-token doc is alone in its bin
    assert(rows.count(_._3 == big._3) == 1)
    // the two small docs share one
    assert(rows.filter(_._1 != 0L).map(_._3).distinct.length == 1)
  }

  test("packSequences is deterministic across runs") {
    val docs = mkDocs(Seq.tabulate(80)(i => 20 + (i * 37) % 200))
    val a = Packing.packSequences(docs, budget = 256, numPartitions = 4).collect()
    val b = Packing.packSequences(docs, budget = 256, numPartitions = 4).collect()
    assert(a.map(_.toString).sorted.toSeq == b.map(_.toString).sorted.toSeq)
  }

  test("binSummary: totals and fill ratio") {
    val docs = mkDocs(Seq(250, 250, 250, 250))
    val s = Packing.binSummary(
      Packing.packSequences(docs, budget = 512, numPartitions = 1), budget = 512)
      .collect()(0)
    assert(s.getAs[Long]("n_docs") == 4L)
    assert(s.getAs[Long]("total_tokens") == 1000L)
    assert(s.getAs[Long]("n_bins") == 2L)
    assert(s.getAs[Long]("max_bin_tokens") == 500L)
    assert(math.abs(s.getAs[Double]("fill_ratio") - 500.0 / 512) < 1e-6)
  }

  test("tfidf top terms: planted rare term outranks common terms") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common zebra zebra"),
      (2L, "common common filler filler"),
      (3L, "common filler other words")).toDF("doc_id", "text")
    val top = TextOps.tfidfTopTerms(docs, k = 2)
      .filter(col("doc_id") === 1L).orderBy(col("rank"))
      .select("term").as[String].collect()
    // zebra: tf=2, df=1 → 2·(ln(4/2)+1) ≈ 3.39; common: tf=1, df=3 → 1.0
    assert(top.toSeq == Seq("zebra", "common"), s"got ${top.toSeq}")
  }

  test("redactPii counts and redacts planted email/phone") {
    import spark.implicits._
    val docs = Seq(
      (1L, "write to alice@example.com or bob@test.org, call 555-123-4567"),
      (2L, "no pii here")).toDF("doc_id", "text")
    val r = TextOps.redactPii(docs).orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_emails") == 2L)
    assert(r(0).getAs[Long]("n_phones") == 1L)
    assert(r(1).getAs[Long]("n_emails") == 0L)
    assert(r(1).getAs[Long]("n_phones") == 0L)
    // the redacted text actually loses the PII
    val redacted = Seq((1L, "write to alice@example.com, call 555-123-4567"))
      .toDF("doc_id", "text")
      .select(regexp_replace(regexp_replace(col("text"), TextOps.emailRegex, "<EMAIL>"),
        TextOps.phoneRegex, "<PHONE>").as("t")).as[String].collect()(0)
    assert(redacted == "write to <EMAIL>, call <PHONE>")
  }
}
