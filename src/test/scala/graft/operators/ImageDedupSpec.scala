package graft.operators

import org.apache.spark.sql.functions._

class ImageDedupSpec extends graft.SparkTestBase {

  private def patternImage(pattern: Long, noiseSeed: Long): Array[Byte] =
    Array.tabulate(32 * 32 * 3) { p =>
      val pix = p / 3
      val k = (pix / 32 / 4) * 8 + (pix % 32 / 4)
      val base = if (((pattern >> k) & 1L) == 1L) 200 else 40
      (base + ((noiseSeed * 7 + p) % 3 - 1)).toInt.toByte
    }

  test("aHash64 is noise-invariant within margin and recovers the cell pattern") {
    // patterns must mix bright and dark cells so the mean separates them
    val patterns = Seq(0x0F0F0F0FL, 0x3A5C963AL, (1L << 40) | 0xFFL)
    for (pat <- patterns; seed <- 0L until 5L) {
      val h = Multimodal.aHash64(32, 32, patternImage(pat, seed))
      assert(h === pat, s"pattern ${pat.toHexString} seed $seed → ${h.toHexString}")
    }
  }

  test("aHash survives a PNG encode/decode round trip") {
    val img = patternImage(0x123456789AL, 3L)
    val png = PngCodec.encode(32, 32, img, row => row % 5)
    val (w, h, dec) = PngCodec.decode(png).get
    assert(Multimodal.aHash64(w, h, dec) === Multimodal.aHash64(32, 32, img))
  }

  test("signatureNearDup: chains identical signatures, bands near ones, drops far ones") {
    import spark.implicits._
    val sigs = Seq(
      (1L, 0xF0L), (2L, 0xF0L), (3L, 0xF0L), // identical → chain 1-2, 2-3
      (4L, 0xF1L),                           // hamming 1 from the leader (id 1)
      (5L, 0xFFFF00L)                        // far from everything
    ).toDF("id", "sig")
    val out = Dedup.signatureNearDup(sigs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out === Set((1L, 2L, 0), (2L, 3L, 0), (1L, 4L, 1)))
  }
}
