package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class AviCodecSpec extends AnyFunSuite {

  private def frames(sizes: Int*): Seq[Array[Byte]] =
    sizes.zipWithIndex.map { case (n, i) =>
      Array.tabulate[Byte](n)(j => ((i * 31 + j) % 251).toByte)
    }

  test("wrap → sniff round-trips dimensions and frame count") {
    val fs = frames(48, 64, 80, 17)
    val blob = AviCodec.wrap(320, 240, fs)
    assert(AviCodec.sniff(blob) === Some((320, 240, 4)))
    // real RIFF container: 'RIFF' + size + 'AVI ', size covers the file
    assert(new String(blob.take(4), "US-ASCII") == "RIFF")
    assert(new String(blob.slice(8, 12), "US-ASCII") == "AVI ")
    val riffSize = java.nio.ByteBuffer.wrap(blob, 4, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    assert(riffSize + 8 == blob.length, "RIFF size must cover the whole file")
  }

  test("frames walk finds REAL chunk boundaries, odd sizes word-aligned") {
    val fs = frames(47, 1, 80, 33) // odd sizes force pad bytes
    val blob = AviCodec.wrap(64, 64, fs)
    val got = AviCodec.frames(blob).get
    assert(got.length == 4)
    got.zip(fs).foreach { case ((off, len), expect) =>
      assert(len == expect.length)
      assert(blob.slice(off, off + len).toSeq == expect.toSeq,
        "chunk data must be the original frame bytes")
    }
    // payload = concatenated frames, exactly
    assert(AviCodec.payload(blob).get.toSeq == fs.flatten.toSeq)
  }

  test("idx1 disagreement fails loudly instead of yielding drifted frames") {
    val blob = AviCodec.wrap(64, 64, frames(48, 48))
    // corrupt the second idx1 entry's length field (last entry, bytes -4..)
    val bad = blob.clone()
    bad(bad.length - 4) = 99.toByte
    val e = intercept[IllegalArgumentException](AviCodec.frames(bad))
    assert(e.getMessage.contains("idx1"))
  }

  test("zero-frame and single-odd-frame containers stay consistent") {
    val empty = AviCodec.wrap(16, 16, Nil)
    assert(AviCodec.sniff(empty) === Some((16, 16, 0)))
    assert(AviCodec.frames(empty).get.isEmpty)
    assert(AviCodec.payload(empty).get.isEmpty)
    val one = AviCodec.wrap(16, 16, frames(7))
    assert(AviCodec.frames(one).get.map(_._2) == Seq(7))
  }

  test("resize patches avih/strh/strf dims; frames and payload untouched") {
    val fs = frames(48, 64)
    val blob = AviCodec.wrap(320, 240, fs)
    val resized = AviCodec.resize(blob, 40, 24).get
    assert(AviCodec.sniff(resized) === Some((40, 24, 2)))
    assert(AviCodec.payload(resized).get.toSeq == fs.flatten.toSeq)
    assert(resized.length == blob.length, "header rewrite must not reframe")
    // strf BITMAPINFOHEADER dims patched too (what an image tool reads)
    val strfIdx = {
      def find(b: Array[Byte], s: String): Int =
        (0 until b.length - 4).find(i => new String(b.slice(i, i + 4), "US-ASCII") == s).get
      find(resized, "strf")
    }
    val bb = java.nio.ByteBuffer.wrap(resized, strfIdx + 8 + 4, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(bb.getInt == 40 && bb.getInt == 24)
    // non-AVI input → None
    assert(AviCodec.resize(Array[Byte](1, 2, 3), 4, 4).isEmpty)
  }

  test("Multimodal.frameSlices: variable sizes replay the (id+f) mod 3 formula") {
    val payload = Array.tabulate[Byte](300)(i => (i % 127).toByte)
    val slices = Multimodal.frameSlices(7L, payload)
    // id=7: phases (7+f)%3 = 1,2,0,1,... → nominal 64,80,48,64,...
    assert(slices.map(_.length).take(4) == Seq(64, 80, 48, 64))
    assert(slices.map(_.length).sum == 300)
    assert(slices.flatten.toSeq == payload.toSeq)
    assert(Multimodal.frameSlices(7L, Array.emptyByteArray).isEmpty)
  }
}
