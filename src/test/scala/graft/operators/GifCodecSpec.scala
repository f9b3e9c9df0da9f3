package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class GifCodecSpec extends AnyFunSuite {

  private def pattern(w: Int, h: Int, f: Int => Int): Array[Byte] =
    Array.tabulate(w * h)(i => (f(i) & 0xff).toByte)

  test("arbitrary pixels round-trip BIT-EXACTLY (LZW is lossless)") {
    val w = 37; val h = 23
    val px = pattern(w, h, i => (i * 31 + (i * i) % 97) % 256)
    val blob = GifCodec.encode(w, h, px)
    val (dw, dh, out) = GifCodec.decode(blob).get
    assert(dw == w && dh == h)
    assert(out.toSeq == px.toSeq, "LZW round trip must be exact")
  }

  test("single-pixel and single-row images round-trip") {
    for ((w, h) <- Seq((1, 1), (7, 1), (1, 9))) {
      val px = pattern(w, h, i => i * 53 + 11)
      val (dw, dh, out) = GifCodec.decode(GifCodec.encode(w, h, px)).get
      assert(dw == w && dh == h && out.toSeq == px.toSeq)
    }
  }

  test("code-width growth past 9/10/11 bits survives (constant-free image)") {
    // a long non-repeating-ish sequence forces the LZW table past 512,
    // 1024 and 2048 entries so the variable-width bump paths all run
    val w = 64; val h = 64
    val px = pattern(w, h, i => (i * 131 + (i / 7) * 17 + (i % 13) * 41) % 256)
    val (_, _, out) = GifCodec.decode(GifCodec.encode(w, h, px)).get
    assert(out.toSeq == px.toSeq)
  }

  test("table reset at 4096 entries survives (large image)") {
    val w = 200; val h = 120
    val px = pattern(w, h, i => (i * 197 + (i / 11) * 89 + (i % 29) * 7) % 256)
    val (_, _, out) = GifCodec.decode(GifCodec.encode(w, h, px)).get
    assert(out.toSeq == px.toSeq)
  }

  test("highly repetitive input (KwKwK path) round-trips") {
    val w = 48; val h = 48
    val px = pattern(w, h, i => if ((i / 5) % 2 == 0) 17 else 17) // constant
    val (_, _, out) = GifCodec.decode(GifCodec.encode(w, h, px)).get
    assert(out.toSeq == px.toSeq)
    val px2 = pattern(w, h, i => (i % 3) * 40) // short cycle → KwKwK codes
    val (_, _, out2) = GifCodec.decode(GifCodec.encode(w, h, px2)).get
    assert(out2.toSeq == px2.toSeq)
  }

  test("cross-validation: javax.imageio reads our stream to the same pixels") {
    val w = 31; val h = 19
    val px = pattern(w, h, i => (i * 73 + 5) % 256)
    val blob = GifCodec.encode(w, h, px)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
    assert(img != null, "the JDK decoder must accept our GIF89a stream")
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
      val want = px(y * w + x) & 0xff
      assert(r == want && g == want && b == want,
        s"JDK disagrees at ($x,$y): got ($r,$g,$b), want $want")
    }
  }

  test("cross-validation: we decode a JDK-encoded GIF like the JDK does") {
    val w = 40; val h = 25
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 6 + y * 11) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", bos))
    val blob = bos.toByteArray
    val (dw, dh, ours) = GifCodec.decode(blob).get
    assert(dw == w && dh == h)
    val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = jdk.getRGB(x, y)
      val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
      val luma = (299 * r + 587 * g + 114 * b + 500) / 1000
      assert((ours(y * w + x) & 0xff) == luma,
        s"decoders disagree at ($x,$y)")
    }
  }

  test("perceptual hash reaches real GIF pixels: aHash survives the round trip") {
    val w = 32; val h = 32
    val gray = pattern(w, h, i => ((i % w) * 8 + (i / w) * 3) % 256)
    def rgb(g: Array[Byte]): Array[Byte] = g.flatMap(b => Array(b, b, b))
    val original = Multimodal.aHash64(w, h, rgb(gray))
    val (_, _, dec) = GifCodec.decode(GifCodec.encode(w, h, gray)).get
    assert(Multimodal.aHash64(w, h, rgb(dec)) == original,
      "GIF round trip must preserve the perceptual hash")
  }

  test("unsupported/garbage streams yield None, never wrong pixels") {
    assert(GifCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(GifCodec.decode(Array.fill[Byte](64)(0x55)).isEmpty)
    // a real PNG is not a GIF
    val png = PngCodec.encode(8, 8, Array.fill[Byte](8 * 8 * 3)(7))
    assert(GifCodec.decode(png).isEmpty)
    // the raw-payload gifWrap from the synthetic corpus has no valid LZW
    // stream behind its (absent) image descriptor — must not decode
    val wrap = Multimodal.ImageHeaders.gifWrap(16, 16, "payload-bytes".getBytes)
    assert(GifCodec.decode(wrap).isEmpty)
    // truncated mid-LZW: drop the last 10 bytes of a valid stream
    val ok = GifCodec.encode(20, 20, pattern(20, 20, i => i * 7))
    assert(GifCodec.decode(ok.dropRight(10)).isEmpty)
  }
}
