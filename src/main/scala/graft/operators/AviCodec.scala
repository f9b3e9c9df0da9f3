package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** RIFF/AVI container codec — JDK-only, straight from the public AVI
  * RIFF spec (Microsoft "AVI RIFF File Reference"): little-endian chunks,
  * `LIST hdrl` with the `avih` main header and one `strl`/`strh`/`strf`
  * video stream, `LIST movi` holding one `00db` chunk per frame
  * (word-aligned), and the `idx1` index. This closes the engine's last
  * declared stub (video FRAME BOUNDARIES): [[frames]] finds each frame by
  * WALKING the movi chunk headers — the container's real boundaries, the
  * same walk a demuxer performs — not by slicing fixed offsets. Frame
  * PIXEL decode stays codec-bound by nature; the chunk data is opaque
  * payload, exactly like a real demuxer hands compressed frames onward.
  *
  * The reference engine has no media surface at all; this implements the
  * extension brief's multimodal contract in the [[PngCodec]] style
  * (library-free, oracle-checkable via a generating formula).
  */
object AviCodec {

  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    b.length >= i + 4 && b(i) == s(0).toByte && b(i + 1) == s(1).toByte &&
      b(i + 2) == s(2).toByte && b(i + 3) == s(3).toByte

  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  /** Build a structurally complete single-stream AVI: real RIFF framing,
    * real headers (25 fps DIB video, 24-bit), one `00db` chunk per frame
    * with word-alignment padding, and a full `idx1` (offsets relative to
    * the `movi` fourcc, flags = keyframe). Frames may be any length —
    * the container stores each chunk's own size, which is exactly what
    * makes the frame boundaries REAL rather than arithmetic. */
  def wrap(width: Int, height: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    val n = frames.length
    val maxFrame = if (n == 0) 0 else frames.map(_.length).max
    val moviBody = frames.map(f => 8 + f.length + (f.length & 1)).sum
    val hdrlSize = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40)) // 'hdrl' + avih + LIST strl
    val moviSize = 4 + moviBody
    val idx1Size = 16 * n
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize) + (8 + idx1Size)
    val bb = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); bb.putInt(riffSize); fourcc("AVI ")
    // ---- LIST hdrl ----
    fourcc("LIST"); bb.putInt(hdrlSize); fourcc("hdrl")
    fourcc("avih"); bb.putInt(56)
    bb.putInt(40000) // dwMicroSecPerFrame (25 fps)
      .putInt(0).putInt(0)
      .putInt(0x10) // dwFlags: AVIF_HASINDEX
      .putInt(n).putInt(0).putInt(1).putInt(maxFrame)
      .putInt(width).putInt(height)
      .putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved[4]
    fourcc("LIST"); bb.putInt(4 + (8 + 56) + (8 + 40)); fourcc("strl")
    fourcc("strh"); bb.putInt(56)
    fourcc("vids"); fourcc("DIB ")
    bb.putInt(0).putShort(0).putShort(0).putInt(0)
      .putInt(1).putInt(25) // dwScale / dwRate = 25 fps
      .putInt(0).putInt(n).putInt(maxFrame)
      .putInt(-1) // dwQuality: default
      .putInt(0)
      .putShort(0).putShort(0) // rcFrame left, top
      .putShort(width.toShort).putShort(height.toShort)
    fourcc("strf"); bb.putInt(40) // BITMAPINFOHEADER
    bb.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0).putInt(width * height * 3).putInt(0).putInt(0).putInt(0).putInt(0)
    // ---- LIST movi ----
    fourcc("LIST"); bb.putInt(moviSize)
    val moviFourccPos = bb.position()
    fourcc("movi")
    val offsets = frames.map { f =>
      val off = bb.position() - moviFourccPos // relative to 'movi' fourcc
      fourcc("00db"); bb.putInt(f.length); bb.put(f)
      if ((f.length & 1) == 1) bb.put(0.toByte)
      off
    }
    // ---- idx1 ----
    fourcc("idx1"); bb.putInt(idx1Size)
    frames.zip(offsets).foreach { case (f, off) =>
      fourcc("00db")
      bb.putInt(0x10) // AVIIF_KEYFRAME
      bb.putInt(off)
      bb.putInt(f.length)
    }
    bb.array()
  }

  /** Walk the RIFF tree to the `avih` main header.
    * @return (width, height, totalFrames) */
  def sniff(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (!(tag(b, 0, "RIFF") && tag(b, 8, "AVI "))) return None
    var p = 12
    while (p + 8 <= b.length) {
      val size = le32(b, p + 4)
      if (size < 0) return None
      if (tag(b, p, "LIST") && tag(b, p + 8, "hdrl")) {
        var q = p + 12
        val end = math.min(p + 8 + size, b.length)
        while (q + 8 <= end) {
          val s2 = le32(b, q + 4)
          if (s2 < 0) return None
          if (tag(b, q, "avih") && q + 8 + 40 <= b.length)
            return Some((le32(b, q + 8 + 32), le32(b, q + 8 + 36), le32(b, q + 8 + 16)))
          q += 8 + s2 + (s2 & 1)
        }
        return None
      }
      p += 8 + size + (size & 1)
    }
    None
  }

  /** REAL frame boundaries: walk the `LIST movi` sub-chunks and return
    * (dataOffset, length) for every `##db`/`##dc` video chunk, in stream
    * order. When an `idx1` index is present it is cross-checked against
    * the walk (entry count and per-frame offsets/lengths must agree) —
    * a corrupt container fails loudly instead of yielding drifted
    * frames. */
  def frames(b: Array[Byte]): Option[Seq[(Int, Int)]] = {
    if (!(tag(b, 0, "RIFF") && tag(b, 8, "AVI "))) return None
    var p = 12
    var found: Option[Seq[(Int, Int)]] = None
    var moviFourccPos = -1
    var idx: Option[Seq[(Int, Int)]] = None // (offset rel. to movi fourcc, len)
    while (p + 8 <= b.length) {
      val size = le32(b, p + 4)
      if (size < 0) return None
      if (tag(b, p, "LIST") && tag(b, p + 8, "movi")) {
        moviFourccPos = p + 8
        val out = Seq.newBuilder[(Int, Int)]
        var q = p + 12
        val end = math.min(p + 8 + size, b.length)
        while (q + 8 <= end) {
          val s2 = le32(b, q + 4)
          if (s2 < 0) return None
          val isVideo = (b(q + 2) == 'd' && (b(q + 3) == 'b' || b(q + 3) == 'c'))
          if (isVideo && q + 8 + s2 <= b.length) out += ((q + 8, s2))
          q += 8 + s2 + (s2 & 1)
        }
        found = Some(out.result())
      } else if (tag(b, p, "idx1")) {
        val entries = Seq.newBuilder[(Int, Int)]
        var q = p + 8
        val end = math.min(p + 8 + size, b.length)
        while (q + 16 <= end) {
          entries += ((le32(b, q + 8), le32(b, q + 12)))
          q += 16
        }
        idx = Some(entries.result())
      }
      p += 8 + size + (size & 1)
    }
    (found, idx) match {
      case (Some(fs), Some(entries)) =>
        // the index must agree with the walk: same count, and each entry's
        // offset resolves to the same chunk data the walk found
        require(entries.length == fs.length,
          s"AVI idx1 disagrees with movi walk: ${entries.length} vs ${fs.length} frames")
        fs.zip(entries).foreach { case ((dataOff, len), (relOff, idxLen)) =>
          require(moviFourccPos + relOff + 8 == dataOff && idxLen == len,
            s"AVI idx1 entry drifted: data@$dataOff/$len vs index ${moviFourccPos + relOff + 8}/$idxLen")
        }
        Some(fs)
      case _ => found
    }
  }

  /** Concatenated frame payload — the byte-stat body of a video blob,
    * mirroring WAV's data-chunk body (content bytes, no chunk framing). */
  def payload(b: Array[Byte]): Option[Array[Byte]] =
    frames(b).map { fs =>
      val out = new Array[Byte](fs.map(_._2).sum)
      var w = 0
      fs.foreach { case (off, len) =>
        System.arraycopy(b, off, out, w, len); w += len
      }
      out
    }

  /** Header-rewrite resize (the video leg of resizeImages): patch the
    * avih dwWidth/dwHeight, strh rcFrame and strf biWidth/biHeight in a
    * copy of the blob, by chunk walk — frame payloads untouched (pixel
    * resampling is codec-bound, same contract as the image writers). */
  def resize(b: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    if (!(tag(b, 0, "RIFF") && tag(b, 8, "AVI "))) return None
    val out = b.clone()
    def putLe32(i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
      out(i + 2) = ((v >> 16) & 0xff).toByte; out(i + 3) = ((v >> 24) & 0xff).toByte
    }
    def putLe16(i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
    }
    var patched = false
    var p = 12
    while (p + 8 <= b.length) {
      val size = le32(b, p + 4)
      if (size < 0) return None
      if (tag(b, p, "LIST") && tag(b, p + 8, "hdrl")) {
        var q = p + 12
        val end = math.min(p + 8 + size, b.length)
        while (q + 8 <= end) {
          val s2 = le32(b, q + 4)
          if (s2 < 0) return None
          if (tag(b, q, "avih") && q + 8 + 40 <= b.length) {
            putLe32(q + 8 + 32, w); putLe32(q + 8 + 36, h); patched = true
          } else if (tag(b, q, "LIST") && tag(b, q + 8, "strl")) {
            var r = q + 12
            val end2 = math.min(q + 8 + s2, b.length)
            while (r + 8 <= end2) {
              val s3 = le32(b, r + 4)
              if (s3 < 0) return None
              if (tag(b, r, "strh") && tag(b, r + 8, "vids") && r + 8 + 56 <= b.length) {
                putLe16(r + 8 + 52, w); putLe16(r + 8 + 54, h)
              } else if (tag(b, r, "strf") && r + 8 + 12 <= b.length) {
                putLe32(r + 8 + 4, w); putLe32(r + 8 + 8, h)
              }
              r += 8 + s3 + (s3 & 1)
            }
          }
          q += 8 + s2 + (s2 & 1)
        }
      }
      p += 8 + size + (size & 1)
    }
    if (patched) Some(out) else None
  }
}
