package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class PngCodecSpec extends AnyFunSuite {

  private def pix(id: Long, w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h * 3)(j => ((id * 7 + j * 13) % 256).toByte)

  test("encode→decode roundtrips exactly under every scanline filter") {
    for (f <- 0 to 4; (w, h) <- Seq((1, 1), (4, 3), (16, 9), (31, 17))) {
      val p = pix(f * 100 + w, w, h)
      val png = PngCodec.encode(w, h, p, _ => f)
      val Some((dw, dh, dp)) = PngCodec.decode(png): @unchecked
      assert((dw, dh) == (w, h), s"filter $f dims")
      assert(dp.sameElements(p), s"filter $f ${w}x$h pixels drifted")
    }
  }

  test("mixed per-row filters (the query's row-cycling chooser) roundtrip") {
    val (w, h) = (13, 11)
    val p = pix(42, w, h)
    val png = PngCodec.encode(w, h, p, row => (row + 3) % 5)
    assert(PngCodec.decode(png).exists(_._3.sameElements(p)))
  }

  test("the encoder emits standards-compliant PNGs: javax.imageio reads identical pixels") {
    val (w, h) = (16, 9)
    val p = pix(7, w, h)
    val png = PngCodec.encode(w, h, p, row => row % 5)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img != null, "ImageIO could not parse the encoded PNG")
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val off = (y * w + x) * 3
      assert(((rgb >> 16) & 0xff) == (p(off) & 0xff), s"R at ($x,$y)")
      assert(((rgb >> 8) & 0xff) == (p(off + 1) & 0xff), s"G at ($x,$y)")
      assert((rgb & 0xff) == (p(off + 2) & 0xff), s"B at ($x,$y)")
    }
  }

  test("corrupted or out-of-subset blobs are rejected, not mis-decoded") {
    val good = PngCodec.encode(4, 3, pix(1, 4, 3))
    assert(PngCodec.decode(good).isDefined)
    // flipped payload byte → IDAT CRC mismatch
    val bad = good.clone(); bad(good.length - 20) = (bad(good.length - 20) ^ 0x5a).toByte
    assert(PngCodec.decode(bad).isEmpty)
    // truncated stream
    assert(PngCodec.decode(good.take(good.length - 13)).isEmpty)
    // not a PNG at all / header-only synthetic container (no IDAT)
    assert(PngCodec.decode("GRFTnope".getBytes("UTF-8")).isEmpty)
    assert(PngCodec.decode(Multimodal.ImageHeaders.pngWrap(4, 3, Array[Byte](1, 2, 3))).isEmpty)
  }

  test("ImageIO-written PNGs decode through our inflater+unfilter path") {
    val (w, h) = (12, 7)
    val p = pix(9, w, h)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val off = (y * w + x) * 3
      img.setRGB(x, y, ((p(off) & 0xff) << 16) | ((p(off + 1) & 0xff) << 8) | (p(off + 2) & 0xff))
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val dec = PngCodec.decode(bos.toByteArray)
    assert(dec.isDefined, "our decoder rejected an ImageIO-written truecolor PNG")
    assert(dec.get._3.sameElements(p), "pixels drifted through the ImageIO→our-decoder path")
  }

  test("resampleNearest: identity at same dims, exact index map on downscale") {
    val sw = 8; val sh = 6
    val px = Array.tabulate(sw * sh * 3)(j => (j * 17 % 256).toByte)
    assert(Multimodal.resampleNearest(sw, sh, px, sw, sh, 3).sameElements(px),
      "same-dims resample must be the identity")
    val out = Multimodal.resampleNearest(sw, sh, px, 4, 3, 3)
    for (y <- 0 until 3; x <- 0 until 4; c <- 0 until 3) {
      val sx = x * sw / 4; val sy = y * sh / 3
      assert(out((y * 4 + x) * 3 + c) == px((sy * sw + sx) * 3 + c),
        s"wrong source pixel at ($x,$y,$c)")
    }
  }

  test("resizeImages takes the REAL decode→resample→re-encode path for valid PNGs") {
    val spark0 = graft.SparkTestBase.session
    import spark0.implicits._
    val sw = 10; val sh = 8
    val px = Array.tabulate(sw * sh * 3)(j => (j * 7 % 256).toByte)
    val blob = PngCodec.encode(sw, sh, px, _ => 2)
    val resized = Multimodal.resizeImages(Seq((1L, blob)).toDF("doc_id", "blob"), 5, 4)
      .collect()(0).getAs[Array[Byte]]("blob")
    val (dw, dh, dec) = PngCodec.decode(resized).get
    assert(dw == 5 && dh == 4)
    assert(dec.sameElements(Multimodal.resampleNearest(sw, sh, px, 5, 4, 3)),
      "resized PNG must carry genuinely resampled pixels, not a rewritten header")
  }
}
