package graft.operators

import org.apache.spark.sql.functions._

class ChunkingSpec extends graft.SparkTestBase {

  private def chunks(text: String, size: Int, overlap: Int): Seq[(Long, Long, String)] = {
    import spark.implicits._
    TextOps.chunkTokens(Seq((1L, text)).toDF("doc_id", "text"), size, overlap)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3))).toSeq
      .sortBy(_._1)
  }

  test("chunk boundaries, overlap and tail behavior") {
    val text = (1 to 10).map(i => s"t$i").mkString(" ")
    // size 4, overlap 1, step 3: [t1..t4], [t4..t7], [t7..t10]
    assert(chunks(text, 4, 1) === Seq(
      (0L, 4L, "t1 t2 t3 t4"), (1L, 4L, "t4 t5 t6 t7"), (2L, 4L, "t7 t8 t9 t10")))
    // a start whose chunk adds no new tokens is dropped: 5 tokens, size 4,
    // overlap 2 (step 2): [t1..t4], [t3..t5] — start 4 covers only t5 which
    // is new, kept; start beyond last token never generated
    assert(chunks("a b c d e", 4, 2) === Seq(
      (0L, 4L, "a b c d"), (1L, 3L, "c d e")))
  }

  test("every token is covered exactly once by the non-overlap portions") {
    // reconstruction: chunk 0 whole, later chunks minus their leading
    // overlap, concatenated = the token stream
    val text = (1 to 53).map(i => s"w$i").mkString(" ")
    val cs = chunks(text, 8, 3)
    val rebuilt = cs.map { case (cid, _, t) =>
      val toks = t.split(" ").toSeq
      if (cid == 0) toks else toks.drop(3)
    }.reduce(_ ++ _)
    assert(rebuilt === (1 to 53).map(i => s"w$i"))
  }

  test("empty and whitespace docs yield no chunks") {
    assert(chunks("", 8, 2).isEmpty)
    assert(chunks("   ", 8, 2).isEmpty)
  }
}
