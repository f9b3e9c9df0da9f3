package graft.operators

import java.nio.ByteBuffer

/** JDK-only baseline JPEG codec — the pixel-decode leg for the dominant
  * web-image format, in the [[PngCodec]] style: real Huffman entropy
  * coding + dequantization + IDCT, straight from the public spec
  * (ITU T.81), no media library.
  *
  * Scope (documented, not hidden): baseline sequential DCT, 8-bit,
  * Huffman, components with 1×1 sampling (grayscale and 4:4:4) — the
  * subset a formula oracle can pin and `javax.imageio` can cross-check
  * (JpegCodecSpec round-trips both directions against the JDK decoder).
  * Progressive, arithmetic coding and chroma subsampling fall back to
  * None, never to wrong pixels.
  *
  * The encoder writes single-component grayscale with a FLAT quant table
  * of 1s and the T.81 Annex K Huffman tables. With quant 1, a uniform
  * 8×8 block survives the round trip EXACTLY: its only nonzero
  * coefficient is DC = 8·(v−128), and the DC-only IDCT is the flat value
  * dc/8 — a power-of-two division, exact in IEEE — so planted flat-block
  * images give q_jpeg_pixels a closed-form DuckDB oracle, while the
  * decoder stays fully general (any DHT/DQT, any coefficients).
  *
  * Scale shape: encode/decode are pure per-blob byte kernels — they run
  * partition-local with zero shuffle, like the PNG and AVI codecs.
  */
object JpegCodec {

  // zigzag scan order (T.81 figure 5): zigzag(k) = natural index of the
  // k-th coefficient in scan order
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // T.81 Annex K.3: typical luminance Huffman tables
  private val DcLumBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val AcLumBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** (code, length) per symbol, derived from a BITS/HUFFVAL spec the way
    * T.81 Annex C prescribes (canonical codes). */
  private def buildCodes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    for (len <- 1 to 16) {
      var i = 0
      while (i < bits(len)) {
        out += vals(k) -> ((code, len))
        code += 1; k += 1; i += 1
      }
      code <<= 1
    }
    out.result()
  }

  /** Canonical decode table: (length → (firstCode, firstIndex)), plus the
    * symbol list — enough to decode with the standard min/max-code walk. */
  private final class HuffDecoder(bits: Array[Int], vals: Array[Int]) {
    private val minCode = new Array[Int](17)
    private val maxCode = new Array[Int](17)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      for (len <- 1 to 16) {
        if (bits(len) == 0) { minCode(len) = 0; maxCode(len) = -1 }
        else {
          valPtr(len) = k
          minCode(len) = code
          code += bits(len); k += bits(len)
          maxCode(len) = code - 1
        }
        code <<= 1
      }
    }
    def decode(in: BitReader): Int = {
      var code = in.bit()
      var len = 1
      while (len <= 16 && code > maxCode(len)) {
        code = (code << 1) | in.bit()
        len += 1
      }
      require(len <= 16, "corrupt Huffman stream")
      vals(valPtr(len) + code - minCode(len))
    }
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Array[Byte] = { // pad with 1s per spec
      if (nbits > 0) put((1 << (8 - nbits)) - 1, 8 - nbits)
      out.toByteArray
    }
    /** Byte-align (1-padded) then emit an unstuffed RSTn marker — the
      * restart-interval writer. */
    def restartMarker(m: Int): Unit = {
      if (nbits > 0) put((1 << (8 - nbits)) - 1, 8 - nbits)
      out.write(0xff); out.write(0xd0 + (m & 7))
    }
  }

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    /** Drop buffered pre-marker pad bits when realigning at an RSTn
      * marker — stale bits would otherwise be consumed as entropy data
      * and corrupt every MCU after the restart. */
    def reset(): Unit = { acc = 0; nbits = 0 }
    def bit(): Int = {
      if (nbits == 0) {
        require(pos < b.length, "entropy stream truncated")
        var v = b(pos) & 0xff; pos += 1
        if (v == 0xff) {
          require(pos < b.length && b(pos) == 0, "unexpected marker in scan")
          pos += 1 // drop the stuffed 0x00
        }
        acc = v; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
  }

  /** T.81 F.12: EXTEND — map a magnitude-coded value to its signed value. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private def bitLength(v: Int): Int = {
    val a = math.abs(v)
    32 - Integer.numberOfLeadingZeros(a)
  }

  private def fdct(block: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) {
          var y = 0
          while (y < 8) {
            s += block(y * 8 + x) *
              math.cos((2 * x + 1) * u * math.Pi / 16) *
              math.cos((2 * y + 1) * v * math.Pi / 16)
            y += 1
          }
          x += 1
        }
        val cu = if (u == 0) 1.0 / math.sqrt(2) else 1.0
        val cv = if (v == 0) 1.0 / math.sqrt(2) else 1.0
        out(v * 8 + u) = 0.25 * cu * cv * s
        v += 1
      }
      u += 1
    }
    out
  }

  private def idct(coef: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var y = 0
      while (y < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            val cu = if (u == 0) 1.0 / math.sqrt(2) else 1.0
            val cv = if (v == 0) 1.0 / math.sqrt(2) else 1.0
            s += cu * cv * coef(v * 8 + u) *
              math.cos((2 * x + 1) * u * math.Pi / 16) *
              math.cos((2 * y + 1) * v * math.Pi / 16)
            v += 1
          }
          u += 1
        }
        out(y * 8 + x) = 0.25 * s
        y += 1
      }
      x += 1
    }
    out
  }

  /** Encode 8-bit grayscale pixels (w·h bytes, row-major) as a complete
    * baseline JFIF JPEG: flat quant table of 1s (max quality — and what
    * makes flat blocks round-trip exactly), Annex K Huffman tables.
    * Dimensions need not be multiples of 8; edge blocks are padded by
    * replicating the last row/column (the standard encoder convention). */
  def encode(w: Int, h: Int, gray: Array[Byte]): Array[Byte] =
    encode(w, h, gray, restartInterval = 0)

  /** Baseline encode; `restartInterval` > 0 additionally emits a DRI
    * segment and byte-aligned RSTn markers every that many MCUs (with
    * the spec'd DC-predictor reset) — the real-world stream shape
    * webcam/phone encoders produce, exercising the decoder's restart
    * realignment. */
  def encode(w: Int, h: Int, gray: Array[Byte], restartInterval: Int): Array[Byte] = {
    require(w > 0 && h > 0 && gray.length == w * h, s"need ${w * h} bytes")
    val dcCodes = buildCodes(DcLumBits, DcLumVals)
    val acCodes = buildCodes(AcLumBits, AcLumVals)
    val bw = new BitWriter
    val bx = (w + 7) / 8
    val by = (h + 7) / 8
    var prevDc = 0
    var mcu = 0
    var rst = 0
    var byi = 0
    while (byi < by) {
      var bxi = 0
      while (bxi < bx) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.restartMarker(rst); rst += 1; prevDc = 0
        }
        // level-shifted block with edge replication
        val block = new Array[Double](64)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val px = math.min(bxi * 8 + x, w - 1)
            val py = math.min(byi * 8 + y, h - 1)
            block(y * 8 + x) = (gray(py * w + px) & 0xff) - 128.0
            x += 1
          }
          y += 1
        }
        val coef = fdct(block)
        // quantize (table of 1s) + zigzag
        val q = new Array[Int](64)
        var k = 0
        while (k < 64) {
          q(k) = math.round(coef(Zigzag(k))).toInt
          k += 1
        }
        // DC: difference coding
        val diff = q(0) - prevDc
        prevDc = q(0)
        val t = bitLength(diff)
        val (dcode, dlen) = dcCodes(t)
        bw.put(dcode, dlen)
        if (t > 0) bw.put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
        // AC: run-length of zeros + magnitude
        var run = 0
        k = 1
        while (k < 64) {
          if (q(k) == 0) run += 1
          else {
            while (run > 15) {
              val (zc, zl) = acCodes(0xf0) // ZRL
              bw.put(zc, zl); run -= 16
            }
            val sz = bitLength(q(k))
            val (ac, al) = acCodes((run << 4) | sz)
            bw.put(ac, al)
            bw.put(if (q(k) < 0) q(k) + (1 << sz) - 1 else q(k), sz)
            run = 0
          }
          k += 1
        }
        if (run > 0) { val (ec, el) = acCodes(0x00); bw.put(ec, el) } // EOB
        mcu += 1
        bxi += 1
      }
      byi += 1
    }
    val scan = bw.flush()

    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Byte]): Unit = {
      marker(m)
      out.write((body.length + 2) >> 8); out.write((body.length + 2) & 0xff)
      out.write(body)
    }
    marker(0xd8) // SOI
    seg(0xe0, ByteBuffer.allocate(14) // APP0 JFIF
      .put("JFIF".getBytes("US-ASCII")).put(0.toByte)
      .put(1.toByte).put(1.toByte).put(0.toByte)
      .putShort(1).putShort(1).put(0.toByte).put(0.toByte).array())
    seg(0xdb, Array[Byte](0) ++ Array.fill[Byte](64)(1)) // DQT id 0, all 1s
    seg(0xc0, ByteBuffer.allocate(9) // SOF0: 8-bit, 1 component, 1×1, q0
      .put(8.toByte).putShort(h.toShort).putShort(w.toShort)
      .put(1.toByte).put(1.toByte).put(0x11.toByte).put(0.toByte).array())
    def dht(clazz: Int, id: Int, bits: Array[Int], vals: Array[Int]): Unit =
      seg(0xc4, Array(((clazz << 4) | id).toByte) ++
        (1 to 16).map(l => bits(l).toByte) ++ vals.map(_.toByte))
    dht(0, 0, DcLumBits, DcLumVals)
    dht(1, 0, AcLumBits, AcLumVals)
    if (restartInterval > 0) // DRI
      seg(0xdd, Array[Byte]((restartInterval >> 8).toByte, (restartInterval & 0xff).toByte))
    seg(0xda, Array[Byte](1, 1, 0x00, 0, 63, 0)) // SOS: comp 1, DC0/AC0
    out.write(scan)
    marker(0xd9) // EOI
    out.toByteArray
  }

  private final case class Component(id: Int, hs: Int, vs: Int, tq: Int,
      var dcTable: Int = 0, var acTable: Int = 0)

  /** Decode a baseline JPEG to (width, height, grayscale pixels).
    * Fully general over DQT/DHT/coefficients within the supported frame
    * shape: SOF0, 8-bit, Huffman, all components 1×1 sampled (grayscale
    * or 4:4:4; color is converted to luma-only gray via the first
    * component — the perceptual-hash consumer wants brightness anyway).
    * Returns None (never wrong pixels) for progressive/subsampled/
    * arithmetic streams. */
  def decode(blob: Array[Byte]): Option[(Int, Int, Array[Byte])] = try {
    if (blob.length < 4 || (blob(0) & 0xff) != 0xff || (blob(1) & 0xff) != 0xd8) return None
    var p = 2
    val qtables = new Array[Array[Int]](4)
    val dcTables = new Array[HuffDecoder](4)
    val acTables = new Array[HuffDecoder](4)
    var comps: Array[Component] = null
    var w = 0
    var h = 0
    var restartInterval = 0
    def be16(i: Int): Int = ((blob(i) & 0xff) << 8) | (blob(i + 1) & 0xff)
    while (p + 4 <= blob.length) {
      if ((blob(p) & 0xff) != 0xff) return None
      val m = blob(p + 1) & 0xff
      if (m == 0xff) { p += 1 } // fill byte
      else if (m == 0xd9) return None // EOI before SOS
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) p += 2
      else {
        val len = be16(p + 2)
        val body = p + 4
        m match {
          case 0xdb => // DQT (possibly several tables per segment)
            var q = body
            while (q < p + 2 + len) {
              val pq = (blob(q) & 0xff) >> 4
              val tq = blob(q) & 0x0f
              if (pq != 0) return None // 16-bit tables: out of scope
              qtables(tq) = Array.tabulate(64)(i => blob(q + 1 + i) & 0xff)
              q += 65
            }
          case 0xc4 => // DHT
            var q = body
            while (q < p + 2 + len) {
              val tc = (blob(q) & 0xff) >> 4
              val th = blob(q) & 0x0f
              val bits = new Array[Int](17)
              var total = 0
              for (l <- 1 to 16) { bits(l) = blob(q + l) & 0xff; total += bits(l) }
              val vals = Array.tabulate(total)(i => blob(q + 17 + i) & 0xff)
              val dec = new HuffDecoder(bits, vals)
              if (tc == 0) dcTables(th) = dec else acTables(th) = dec
              q += 17 + total
            }
          case 0xc0 | 0xc1 => // SOF0/1 (both baseline-decodable)
            if ((blob(body) & 0xff) != 8) return None
            h = be16(body + 1); w = be16(body + 3)
            val nc = blob(body + 5) & 0xff
            comps = Array.tabulate(nc) { i =>
              val o = body + 6 + 3 * i
              Component(blob(o) & 0xff, (blob(o + 1) & 0xff) >> 4,
                blob(o + 1) & 0x0f, blob(o + 2) & 0xff)
            }
            if (comps.exists(c => c.hs != 1 || c.vs != 1)) return None // subsampling
          case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
            return None // progressive / arithmetic / hierarchical
          case 0xdd =>
            restartInterval = be16(body)
          case 0xda => // SOS → entropy-coded data follows
            if (comps == null) return None // SOS before SOF: malformed
            val ns = blob(body) & 0xff
            var q = body + 1
            for (_ <- 0 until ns) {
              val cs = blob(q) & 0xff
              val c = comps.find(_.id == cs).getOrElse(return None)
              c.dcTable = (blob(q + 1) & 0xff) >> 4
              c.acTable = blob(q + 1) & 0x0f
              q += 2
            }
            val in = new BitReader(blob, p + 2 + len)
            val nc = comps.length
            val bx = (w + 7) / 8
            val by = (h + 7) / 8
            val planes = Array.fill(nc)(new Array[Byte](bx * 8 * by * 8))
            val prevDc = new Array[Int](nc)
            var mcu = 0
            var byi = 0
            while (byi < by) {
              var bxi = 0
              while (bxi < bx) {
                if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
                  // align to byte, expect RSTn marker
                  in.pos = { // skip to marker
                    var r = in.pos
                    while (r + 1 < blob.length &&
                      !((blob(r) & 0xff) == 0xff && (blob(r + 1) & 0xff) >= 0xd0 &&
                        (blob(r + 1) & 0xff) <= 0xd7)) r += 1
                    r + 2
                  }
                  in.reset() // buffered pad bits die with the restart
                  java.util.Arrays.fill(prevDc, 0)
                }
                var ci = 0
                while (ci < nc) {
                  val c = comps(ci)
                  val qt = qtables(c.tq)
                  if (qt == null) return None
                  val dcDec = dcTables(c.dcTable)
                  val acDec = acTables(c.acTable)
                  if (dcDec == null || acDec == null) return None
                  val coef = new Array[Double](64)
                  val t = dcDec.decode(in)
                  prevDc(ci) += extend(in.bits(t), t)
                  coef(0) = prevDc(ci).toDouble * qt(0)
                  var k = 1
                  while (k < 64) {
                    val rs = acDec.decode(in)
                    val r = rs >> 4
                    val sz = rs & 0x0f
                    if (sz == 0) {
                      if (r == 15) k += 16 // ZRL
                      else k = 64 // EOB
                    } else {
                      k += r
                      require(k < 64, "AC index overflow")
                      coef(Zigzag(k)) = extend(in.bits(sz), sz).toDouble * qt(k)
                      k += 1
                    }
                  }
                  val px = idct(coef)
                  val plane = planes(ci)
                  val stride = bx * 8
                  var y = 0
                  while (y < 8) {
                    var x = 0
                    while (x < 8) {
                      val v = math.round(px(y * 8 + x) + 128.0).toInt
                      plane((byi * 8 + y) * stride + bxi * 8 + x) =
                        math.max(0, math.min(255, v)).toByte
                      x += 1
                    }
                    y += 1
                  }
                  ci += 1
                }
                mcu += 1
                bxi += 1
              }
              byi += 1
            }
            // crop plane 0 (luma) to (w, h)
            val out = new Array[Byte](w * h)
            val stride = bx * 8
            var y = 0
            while (y < h) {
              System.arraycopy(planes(0), y * stride, out, y * w, w)
              y += 1
            }
            return Some((w, h, out))
          case _ => // APPn / COM / others: skip
        }
        p += 2 + len
      }
    }
    None
  } catch { case _: IllegalArgumentException | _: ArrayIndexOutOfBoundsException => None }
}
