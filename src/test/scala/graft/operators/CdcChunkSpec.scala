package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CdcChunkSpec extends SparkTestBase {

  private def chunksOf(texts: Seq[String]) = {
    import spark.implicits._
    TextOps.cdcChunks(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text"))
  }

  test("chunks tile the document exactly; empty docs yield none") {
    val text = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do " * 20).trim
    val rows = chunksOf(Seq(text, "")).collect()
    assert(rows.forall(_.getLong(0) == 0L), "empty doc must yield no chunks")
    val sorted = rows.sortBy(_.getInt(1))
    assert(sorted.head.getInt(2) == 0)
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getInt(2) + a.getInt(3) == b.getInt(2), "chunks must tile with no gap")
      case _ =>
    }
    assert(sorted.map(_.getString(4)).mkString == text, "concatenated chunks = document")
  }

  test("shift-resistance: a prefix insertion leaves downstream chunks identical") {
    val rng = new scala.util.Random(3)
    val base = Seq.fill(600)(('a' + rng.nextInt(26)).toChar).mkString
    val shifted = "INSERTED-PREFIX-" + base
    val rows = chunksOf(Seq(base, shifted)).collect()
    val c0 = rows.filter(_.getLong(0) == 0L).map(_.getString(4)).toSet
    val c1 = rows.filter(_.getLong(0) == 1L).map(_.getString(4)).toSet
    // fixed-size chunking would share ~0 chunks after a 16-char shift;
    // content-defined boundaries re-align after the first cut past the edit
    val shared = c0.intersect(c1).size
    assert(shared >= c0.size - 2,
      s"expected all but the first chunk(s) to survive the shift: shared $shared of ${c0.size}")
    // and the fixed-size control genuinely does NOT survive: same corpus
    // through 64-char fixed windows shares nothing after the offset
    val fixed0 = base.grouped(64).toSet
    val fixed1 = shifted.grouped(64).toSet
    assert(fixed0.intersect(fixed1).isEmpty, "fixed-size control should share no chunks")
  }

  test("boundary predicate matches the documented hash exactly") {
    val text = "the quick brown fox jumps over the lazy dog and keeps running onward"
    val rows = chunksOf(Seq(text)).collect().sortBy(_.getInt(1))
    val M = TextOps.CdcMod
    val pw = TextOps.cdcPowers(16)
    val cps = text.codePoints().toArray
    val bounds = (16 to cps.length).filter { ii =>
      val h = (0 until 16).map(j => cps(ii - 1 - j).toLong * pw(j) % M).sum
      h % M % 64 == 0
    }
    val expectedStarts = (0 +: bounds.toList).distinct
    assert(rows.map(_.getInt(2)).toList ==
      expectedStarts.filter(s => s < cps.length).map(identity),
      "engine chunk starts must equal the hand-computed boundary list")
  }
}
