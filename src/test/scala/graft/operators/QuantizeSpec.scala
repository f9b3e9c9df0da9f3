package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkTestBase {

  test("int8Quantize: codes in [0,255], extremes map to 0/255, constant dim to 0") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Array(0.0, 5.0, 7.0)),
      (2L, Array(10.0, 5.0, 3.0)),
      (3L, Array(4.0, 5.0, 11.0))
    ).toDF("cid", "cv")
    val out = Similarity.int8Quantize(corpus).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // dim 0 spans [0,10]: 0→0, 10→255, 4→floor(4*25.5+0.5)=102
    assert(out(1L)(0) == 0 && out(2L)(0) == 255 && out(3L)(0) == 102)
    // dim 1 constant → 0 everywhere
    assert(Seq(1L, 2L, 3L).forall(out(_)(1) == 0))
    // dim 2 spans [3,11]: 7 is midway → 128 (floor(127.5+0.5))
    assert(out(2L)(2) == 0 && out(3L)(2) == 255 && out(1L)(2) == 128)
    assert(out.values.flatten.forall(c => c >= 0 && c <= 255))
  }

  test("int8Quantize: dequantization error bounded by (max-min)/510 per dim") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val corpus = (0 until 200).map(i =>
      (i.toLong, Array.fill(8)(rng.nextDouble() * 20 - 10))).toDF("cid", "cv")
    val codes = Similarity.int8Quantize(corpus)
    val joined = corpus.join(codes, "cid").collect()
    val mins = Array.fill(8)(Double.MaxValue)
    val maxs = Array.fill(8)(Double.MinValue)
    joined.foreach { r =>
      val v = r.getSeq[Double](1)
      for (d <- 0 until 8) { mins(d) = math.min(mins(d), v(d)); maxs(d) = math.max(maxs(d), v(d)) }
    }
    joined.foreach { r =>
      val v = r.getSeq[Double](1); val c = r.getSeq[Int](2)
      for (d <- 0 until 8) {
        val deq = mins(d) + c(d) * (maxs(d) - mins(d)) / 255.0
        val bound = (maxs(d) - mins(d)) / 510.0 + 1e-12
        assert(math.abs(v(d) - deq) <= bound,
          s"dim $d err ${math.abs(v(d) - deq)} > $bound")
      }
    }
  }
}
