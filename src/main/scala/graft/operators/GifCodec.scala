package graft.operators

import java.io.ByteArrayOutputStream
import scala.collection.mutable

/** JDK-only GIF codec — the third pixel-decode leg beside [[PngCodec]]
  * and [[JpegCodec]], straight from the public GIF89a specification:
  * real variable-width LZW entropy coding, palette resolution, sub-block
  * framing. No media library.
  *
  * Scope (documented, not hidden): single-image GIFs, interlaced or
  * not, with a global or local color table — including the interlaced
  * form `javax.imageio` writes by default (GifCodecSpec round-trips
  * both directions against the JDK coder). Animations decode to their
  * first frame; malformed streams fall back to None, never to wrong
  * pixels.
  *
  * The encoder writes an 8-bit grayscale ramp palette (entry i =
  * (i,i,i)), so pixel index == gray value; LZW is lossless, so unlike
  * JPEG the round trip is bit-exact for ARBITRARY images, and
  * q_gif_pixels pins a closed-form DuckDB oracle against any planted
  * pattern. The decoder maps palette entries to luma with the exact
  * integer ITU-R 601 weights ((299r+587g+114b+500)/1000), which is the
  * identity on the gray ramp.
  *
  * Scale shape: encode/decode are pure per-blob byte kernels — they run
  * partition-local with zero shuffle, like the PNG/JPEG/AVI codecs.
  *
  * Reference capability anchor: the reference pipeline has no media
  * path at all (it reads numeric text points, e.g.
  * `DataProcessing.java:31`); this is part of the training-data
  * extension surface.
  */
object GifCodec {

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  // ---------------------------------------------------------------- encode

  /** Encode one byte of gray per pixel as a non-interlaced GIF89a with a
    * 256-entry grayscale global color table and real LZW image data. */
  def encode(w: Int, h: Int, gray: Array[Byte]): Array[Byte] = {
    require(gray.length == w * h, s"expected ${w * h} pixels, got ${gray.length}")
    val out = new ByteArrayOutputStream(gray.length / 2 + 800)
    out.write("GIF89a".getBytes("US-ASCII"))
    // logical screen descriptor: GCT present, 8 bits/entry → size field 7
    out.write(w & 0xff); out.write((w >> 8) & 0xff)
    out.write(h & 0xff); out.write((h >> 8) & 0xff)
    out.write(0xf7); out.write(0); out.write(0)
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    // image descriptor at (0,0), no local table, no interlace
    out.write(0x2c)
    out.write(0); out.write(0); out.write(0); out.write(0)
    out.write(w & 0xff); out.write((w >> 8) & 0xff)
    out.write(h & 0xff); out.write((h >> 8) & 0xff)
    out.write(0)
    out.write(8) // LZW minimum code size
    writeSubBlocks(out, lzwCompress(gray, 8))
    out.write(0x3b)
    out.toByteArray
  }

  /** Variable-width LSB-first LZW, GIF flavor: clear code up front,
    * width grows when the next free code crosses a power of two, table
    * reset at 4096 (spec appendix F; width bump mirrors the decoder's
    * `nextCode == 1 << width` rule one entry later, the ppmtogif
    * convention every decoder expects). */
  private def lzwCompress(data: Array[Byte], minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new ByteArrayOutputStream(data.length / 2 + 64)
    var bitBuf = 0L
    var bitCnt = 0
    var codeSize = minCodeSize + 1
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += codeSize
      while (bitCnt >= 8) {
        out.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitCnt -= 8
      }
    }
    // (prefixCode << 8 | byte) → code
    val dict = new mutable.LongMap[Int](4096)
    var nextCode = eoi + 1
    emit(clear)
    if (data.nonEmpty) {
      var cur = data(0) & 0xff
      var i = 1
      while (i < data.length) {
        val k = data(i) & 0xff
        val key = (cur.toLong << 8) | k
        val hit = dict.getOrElse(key, -1)
        if (hit >= 0) cur = hit
        else {
          emit(cur)
          if (nextCode < 4096) {
            dict.update(key, nextCode)
            nextCode += 1
            if (nextCode > (1 << codeSize) && codeSize < 12) codeSize += 1
          } else {
            emit(clear)
            dict.clear(); nextCode = eoi + 1; codeSize = minCodeSize + 1
          }
          cur = k
        }
        i += 1
      }
      emit(cur)
    }
    emit(eoi)
    if (bitCnt > 0) out.write((bitBuf & 0xff).toInt)
    out.toByteArray
  }

  private def writeSubBlocks(out: ByteArrayOutputStream, data: Array[Byte]): Unit = {
    var off = 0
    while (off < data.length) {
      val n = math.min(255, data.length - off)
      out.write(n)
      out.write(data, off, n)
      off += n
    }
    out.write(0)
  }

  // ---------------------------------------------------------------- decode

  /** Decode the first image of a non-interlaced GIF to grayscale:
    * (width, height, one luma byte per pixel). None on anything outside
    * the documented scope or malformed streams — never wrong pixels. */
  def decode(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    try decodeImpl(b)
    catch { case _: ArrayIndexOutOfBoundsException | _: IndexOutOfBoundsException |
                 _: NegativeArraySizeException => None }
  }

  private def decodeImpl(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (b.length < 14) return None
    val magic = new String(b, 0, 6, "US-ASCII")
    if (magic != "GIF87a" && magic != "GIF89a") return None
    val packed = b(10) & 0xff
    var pos = 13
    var gct: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      gct = java.util.Arrays.copyOfRange(b, pos, pos + 3 * n)
      pos += 3 * n
    }
    while (pos < b.length) {
      (b(pos) & 0xff) match {
        case 0x21 => // extension: label + sub-blocks
          pos += 2
          while ((b(pos) & 0xff) != 0) pos += 1 + (b(pos) & 0xff)
          pos += 1
        case 0x2c =>
          val iw = le16(b, pos + 5); val ih = le16(b, pos + 7)
          val ipacked = b(pos + 9) & 0xff
          pos += 10
          val interlaced = (ipacked & 0x40) != 0
          var palette = gct
          if ((ipacked & 0x80) != 0) {
            val n = 2 << (ipacked & 7)
            palette = java.util.Arrays.copyOfRange(b, pos, pos + 3 * n)
            pos += 3 * n
          }
          if (palette == null) return None
          val minCodeSize = b(pos) & 0xff
          pos += 1
          if (minCodeSize < 2 || minCodeSize > 8) return None
          // concatenate the data sub-blocks
          val dat = new ByteArrayOutputStream(iw * ih / 2 + 64)
          while ((b(pos) & 0xff) != 0) {
            val n = b(pos) & 0xff
            dat.write(b, pos + 1, n)
            pos += 1 + n
          }
          return lzwDecompress(dat.toByteArray, minCodeSize, iw * ih).map { raw =>
            val idx = if (interlaced) deinterlace(raw, iw, ih) else raw
            val nColors = palette.length / 3
            val px = new Array[Byte](idx.length)
            var j = 0
            while (j < idx.length) {
              val c = idx(j) & 0xff
              if (c >= nColors) return None
              val r = palette(3 * c) & 0xff
              val g = palette(3 * c + 1) & 0xff
              val bb = palette(3 * c + 2) & 0xff
              px(j) = ((299 * r + 587 * g + 114 * bb + 500) / 1000).toByte
              j += 1
            }
            (iw, ih, px)
          }
        case 0x3b => return None // trailer before any image
        case _ => return None
      }
    }
    None
  }

  /** GIF 4-pass interlace (spec appendix E): the stream stores rows
    * 0,8,16… then 4,12… then 2,6,10… then 1,3,5…; map them back to
    * top-to-bottom order. */
  private def deinterlace(raw: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](raw.length)
    var src = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
      var y = start
      while (y < h) {
        System.arraycopy(raw, src * w, out, y * w, w)
        src += 1; y += step
      }
    }
    out
  }

  /** Variable-width LSB-first LZW decode producing exactly `n` palette
    * indices (trailing codes beyond n are ignored, per spec tolerance). */
  private def lzwDecompress(data: Array[Byte], minCodeSize: Int, n: Int): Option[Array[Byte]] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    // table as (prefix link, last byte); roots are self-terminating
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var i = 0
    while (i < clear) { prefix(i) = -1; suffix(i) = i.toByte; i += 1 }
    val out = new Array[Byte](n)
    var outLen = 0
    var bitBuf = 0L
    var bitCnt = 0
    var pos = 0
    var codeSize = minCodeSize + 1
    var nextCode = eoi + 1
    var prev = -1
    val stack = new Array[Byte](4097)
    def readCode(): Int = {
      while (bitCnt < codeSize) {
        if (pos >= data.length) return -1
        bitBuf |= (data(pos) & 0xffL) << bitCnt
        pos += 1; bitCnt += 8
      }
      val c = (bitBuf & ((1L << codeSize) - 1)).toInt
      bitBuf >>>= codeSize; bitCnt -= codeSize
      c
    }
    def emitString(code: Int, extraFirst: Boolean): Boolean = {
      var sp = 0
      var c = code
      if (extraFirst) { // KwKwK case: string(prev) + first(string(prev))
        c = prev
        var f = c
        while (prefix(f) >= 0) f = prefix(f)
        stack(sp) = suffix(f); sp += 1
      }
      while (c >= 0) {
        if (sp > 4096) return false
        stack(sp) = suffix(c); sp += 1; c = prefix(c)
      }
      while (sp > 0) {
        sp -= 1
        if (outLen < n) { out(outLen) = stack(sp); outLen += 1 }
      }
      true
    }
    while (outLen < n) {
      val c = readCode()
      if (c < 0 || c == eoi) return if (outLen == n) Some(out) else None
      if (c == clear) {
        nextCode = eoi + 1; codeSize = minCodeSize + 1; prev = -1
      } else if (prev < 0) {
        if (c >= clear) return None
        if (!emitString(c, extraFirst = false)) return None
        prev = c
      } else {
        if (c > nextCode || c == eoi) return None
        val kwkwk = c == nextCode
        if (!emitString(c, extraFirst = kwkwk)) return None
        if (nextCode < 4096) {
          // new entry: string(prev) + first(string(c))
          var f = if (kwkwk) prev else c
          while (prefix(f) >= 0) f = prefix(f)
          prefix(nextCode) = prev
          suffix(nextCode) = suffix(f)
          nextCode += 1
          if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = c
      }
    }
    Some(out)
  }
}
