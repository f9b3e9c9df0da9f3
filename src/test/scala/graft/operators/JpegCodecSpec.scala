package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class JpegCodecSpec extends AnyFunSuite {

  private def flatBlocks(w: Int, h: Int, v: (Int, Int) => Int): Array[Byte] =
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      (v(x / 8, y / 8) & 0xff).toByte
    }

  test("flat 8x8 blocks round-trip EXACTLY (quant 1, DC-only blocks)") {
    val w = 32; val h = 24
    val px = flatBlocks(w, h, (bx, by) => (37 * bx + 91 * by + 13) % 256)
    val blob = JpegCodec.encode(w, h, px)
    val (dw, dh, out) = JpegCodec.decode(blob).get
    assert(dw == w && dh == h)
    assert(out.toSeq == px.toSeq, "flat blocks must survive bit-exactly")
  }

  test("arbitrary pixels round-trip within the float-DCT tolerance") {
    val w = 40; val h = 16
    val px = Array.tabulate(w * h)(i => ((i * 31 + (i * i) % 97) % 256).toByte)
    val blob = JpegCodec.encode(w, h, px)
    val (_, _, out) = JpegCodec.decode(blob).get
    val maxErr = px.zip(out).map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.max
    assert(maxErr <= 2, s"quant-1 round trip should be near-lossless, max err $maxErr")
  }

  test("non-multiple-of-8 dimensions crop correctly") {
    val w = 13; val h = 9
    val px = flatBlocks(w, h, (bx, by) => 50 + 60 * bx + 20 * by)
    val (dw, dh, out) = JpegCodec.decode(JpegCodec.encode(w, h, px)).get
    assert(dw == 13 && dh == 9 && out.length == 13 * 9)
    assert(out.toSeq == px.toSeq)
  }

  test("cross-validation: javax.imageio reads our stream to the same pixels") {
    val w = 24; val h = 24
    val px = flatBlocks(w, h, (bx, by) => (80 * bx + 40 * by + 30) % 256)
    val blob = JpegCodec.encode(w, h, px)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
    assert(img != null, "the JDK decoder must accept our baseline stream")
    assert(img.getWidth == w && img.getHeight == h)
    var maxErr = 0
    for (y <- 0 until h; x <- 0 until w) {
      val jdk = img.getRaster.getSample(x, y, 0)
      val ours = JpegCodec.decode(blob).get._3(y * w + x) & 0xff
      maxErr = math.max(maxErr, math.abs(jdk - ours))
    }
    assert(maxErr <= 1, s"JDK and graft decoders disagree by $maxErr")
  }

  test("cross-validation: we decode a JDK-encoded grayscale JPEG like the JDK does") {
    val w = 32; val h = 16
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 8 + y * 3) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpeg", bos))
    val blob = bos.toByteArray
    val (dw, dh, ours) = JpegCodec.decode(blob).get
    assert(dw == w && dh == h)
    val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
    var maxErr = 0
    for (y <- 0 until h; x <- 0 until w)
      maxErr = math.max(maxErr,
        math.abs(jdk.getRaster.getSample(x, y, 0) - (ours(y * w + x) & 0xff)))
    assert(maxErr <= 2,
      s"independent IDCTs of the same quantized stream disagree by $maxErr")
  }

  test("perceptual hash reaches real JPEG pixels: aHash survives the round trip") {
    // the JPEG leg of the image-dedup story (PNG has this via PngCodec):
    // a decoded re-encode must collide in aHash with the original
    val w = 32; val h = 32
    val gray = flatBlocks(w, h, (bx, by) => (60 * bx + 25 * by) % 256)
    def rgb(g: Array[Byte]): Array[Byte] = g.flatMap(b => Array(b, b, b))
    val original = Multimodal.aHash64(w, h, rgb(gray))
    val (_, _, dec) = JpegCodec.decode(JpegCodec.encode(w, h, gray)).get
    assert(Multimodal.aHash64(w, h, rgb(dec)) == original,
      "JPEG round trip must preserve the perceptual hash")
  }

  test("DRI/RSTn streams decode to the same pixels as the unrestarted stream") {
    // restart markers byte-align the entropy stream and reset the DC
    // predictor; the decoder must ALSO drop its buffered pad bits at the
    // realign (ADVICE r9: stale pre-restart bits corrupted every MCU
    // after the first RSTn). Interval 3 on a 5×3-MCU image forces
    // restarts at every alignment phase.
    val w = 40; val h = 24
    val px = Array.tabulate(w * h)(i => ((i * 29 + (i * i) % 83) % 256).toByte)
    val plain = JpegCodec.decode(JpegCodec.encode(w, h, px)).get
    for (interval <- Seq(1, 2, 3, 7)) {
      val blob = JpegCodec.encode(w, h, px, restartInterval = interval)
      val dri = JpegCodec.decode(blob)
      assert(dri.isDefined, s"DRI=$interval stream must decode")
      assert(dri.get._3.toSeq == plain._3.toSeq,
        s"DRI=$interval pixels must match the unrestarted decode")
      // cross-validate the restarted stream against the JDK decoder too
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
      assert(img != null && img.getWidth == w && img.getHeight == h,
        s"JDK must accept our DRI=$interval stream")
      var maxErr = 0
      for (y <- 0 until h; x <- 0 until w)
        maxErr = math.max(maxErr, math.abs(
          img.getRaster.getSample(x, y, 0) - (dri.get._3(y * w + x) & 0xff)))
      assert(maxErr <= 2, s"DRI=$interval: JDK disagrees by $maxErr")
    }
  }

  test("SOS before SOF returns None instead of crashing the task") {
    // splice the SOS+scan of a valid stream directly after SOI, dropping
    // SOF/DQT/DHT — comps is still null at SOS (ADVICE r9: NPE escaped
    // the catch and killed the executor task)
    val blob = JpegCodec.encode(16, 16, Array.fill[Byte](256)(55))
    def findMarker(m: Int, from: Int): Int = {
      var i = from
      while (!((blob(i) & 0xff) == 0xff && (blob(i + 1) & 0xff) == m)) i += 1
      i
    }
    val sos = findMarker(0xda, 2)
    val malformed = Array[Byte](0xff.toByte, 0xd8.toByte) ++ blob.drop(sos)
    assert(JpegCodec.decode(malformed).isEmpty)
  }

  test("unsupported/garbage streams yield None, never wrong pixels") {
    assert(JpegCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(JpegCodec.decode(Array.fill[Byte](64)(0x55)).isEmpty)
    // a real PNG is not a JPEG
    val png = PngCodec.encode(8, 8, Array.fill[Byte](8 * 8 * 3)(7))
    assert(JpegCodec.decode(png).isEmpty)
    // the header-only jpegWrap (no scan data) must not decode
    val hdrOnly = Multimodal.ImageHeaders.jpegWrap(16, 16, "payload".getBytes)
    assert(JpegCodec.decode(hdrOnly).isEmpty)
  }
}
