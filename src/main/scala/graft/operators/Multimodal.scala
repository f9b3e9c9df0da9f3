package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Decoded media metadata + features for one blob. */
final case class MediaFeatures(
    doc_id: Long, media_type: String, width: Int, height: Int,
    sample_rate: Int, channels: Int,
    n_bytes: Long, byte_mean: Double, byte_entropy: Double)

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, decoded/feature-extracted in partition-local batches.
  *
  * Container metadata is REAL for images and audio: [[ImageHeaders.sniff]]
  * parses PNG (signature + IHDR), JPEG (segment walk to SOFn) and GIF
  * (logical screen descriptor) dimensions, and [[AudioHeaders.sniffWav]]
  * walks RIFF/WAVE chunks to the `fmt ` block (channels / sample rate) —
  * straight from the public container formats' magic bytes, no media
  * library needed. Deep decode is real for the library-free paths:
  * [[PngCodec]] implements the full PNG pixel path (zlib IDAT inflate +
  * all five scanline unfilters, JDK-only; oracle-checked by
  * q_multimodal_pixels), [[AudioHeaders.pcmSamples16]] the 16-bit PCM
  * sample path (oracle-checked by q_multimodal_samples), and
  * [[AviCodec]] the video FRAME-BOUNDARY path (RIFF `movi` chunk walk
  * cross-checked against `idx1`; oracle-checked by q_multimodal_frames).
  * Frame PIXEL decode stays codec-bound by nature — the chunks are
  * opaque payload, exactly what a real demuxer hands onward. Blobs that
  * match no real container fall back to [[FakeCodec]], a declared
  * 16-byte fake container kept as the unknown-format fallback. The
  * Spark-side contract (schema, binary column, partition batching,
  * feature output shape) is real and tested.
  *
  * At 100 TB: blobs stay columnar in parquet, the scan prunes to (id, blob),
  * decode runs per-partition with zero shuffles; only the small feature
  * frame moves downstream.
  */
object Multimodal {

  /** 64-bit average-hash (aHash) of decoded RGB pixels: brightness summed
    * per cell of an 8×8 grid; bit k set iff cell k is brighter than the
    * image mean. The compare is exact integer cross-multiplication
    * (cellSum·totalCount > totalSum·cellCount — no float thresholds), so
    * the hash is bit-deterministic for a given pixel array. Perceptual:
    * pixel-level noise that shifts no cell across the mean leaves the hash
    * unchanged, so re-encoded/lightly-corrupted copies collide — feed the
    * (id, hash) frame to [[Dedup.signatureNearDup]] for image dedup with
    * the same pigeonhole banding + chain contract as SimHash text dedup. */
  def aHash64(width: Int, height: Int, rgb: Array[Byte]): Long = {
    require(rgb.length == width * height * 3, "expect packed RGB")
    val cellSum = new Array[Long](64)
    val cellCnt = new Array[Long](64)
    var p = 0
    val n = width * height
    var total = 0L
    while (p < n) {
      val r = p / width
      val c = p % width
      val k = (r * 8 / height) * 8 + (c * 8 / width)
      val bright = (rgb(3 * p) & 0xff) + (rgb(3 * p + 1) & 0xff) + (rgb(3 * p + 2) & 0xff)
      cellSum(k) += bright
      cellCnt(k) += 1
      total += bright
      p += 1
    }
    var sig = 0L
    var k = 0
    while (k < 64) {
      if (cellCnt(k) > 0 && cellSum(k) * n > total * cellCnt(k)) sig |= 1L << k
      k += 1
    }
    sig
  }

  /** Magic-byte dimension parsing for the public image container formats.
    * Returns (format, width, height, headerLen) where headerLen is the
    * number of prefix bytes the parser consumed — the byte-stat features
    * are computed over the post-header payload for EVERY media type, so
    * the feature columns mean the same thing across formats (ADVICE r4).
    * Everything here is from the public specs: PNG (RFC 2083 §12.12:
    * 8-byte signature, IHDR first chunk), JPEG/JFIF (ITU T.81: FF-marker
    * segments, dims in SOF0-SOF15 except DHT/JPG/DAC), GIF87a/89a (6-byte
    * version + little-endian screen size).
    */
  object ImageHeaders {
    private def be32(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
    private def be16(b: Array[Byte], i: Int): Int = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    private def le16(b: Array[Byte], i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

    private val PngSig: Array[Byte] =
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    def sniff(blob: Array[Byte]): Option[(String, Int, Int, Int)] =
      png(blob).orElse(jpeg(blob)).orElse(gif(blob))

    // PNG metadata header = signature + IHDR chunk (always first): 33 bytes
    private def png(b: Array[Byte]): Option[(String, Int, Int, Int)] =
      if (b.length >= 24 && b.take(8).sameElements(PngSig) &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
        Some(("png", be32(b, 16), be32(b, 20), 33))
      else None

    private def isSof(m: Int): Boolean =
      m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc

    private def jpeg(b: Array[Byte]): Option[(String, Int, Int, Int)] = {
      if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
      var p = 2
      while (p + 3 < b.length) {
        if ((b(p) & 0xff) != 0xff) return None // desynced marker stream
        val m = b(p + 1) & 0xff
        if (m == 0xff) p += 1 // fill byte
        else if (m == 0x01 || (m >= 0xd0 && m <= 0xd8)) p += 2 // standalone
        else if (m == 0xd9 || m == 0xda) return None // EOI/SOS before any SOF
        else {
          val len = be16(b, p + 2)
          if (len < 2) return None
          if (isSof(m)) {
            // header ends after the SOF segment that carried the dims
            return if (p + 8 < b.length)
              Some(("jpeg", be16(b, p + 7), be16(b, p + 5), p + 2 + len))
            else None
          }
          p += 2 + len
        }
      }
      None
    }

    // GIF header + logical screen descriptor: 13 bytes
    private def gif(b: Array[Byte]): Option[(String, Int, Int, Int)] =
      if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
        Some(("gif", le16(b, 6), le16(b, 8), 13))
      else None

    // ---- structurally-valid header builders (test fixtures + synthetic
    // blobs): real signature + real dimension fields, payload carried as
    // trailing bytes — enough for any magic-byte parser; not a renderable
    // image (no IDAT/scan data) ----

    def pngWrap(w: Int, h: Int, payload: Array[Byte]): Array[Byte] = {
      val ihdr = java.nio.ByteBuffer.allocate(13)
        .putInt(w).putInt(h).put(8.toByte).put(2.toByte)
        .put(0.toByte).put(0.toByte).put(0.toByte).array()
      val crc = new java.util.zip.CRC32
      crc.update("IHDR".getBytes("US-ASCII")); crc.update(ihdr)
      java.nio.ByteBuffer.allocate(8 + 4 + 4 + 13 + 4 + payload.length)
        .put(PngSig).putInt(13).put("IHDR".getBytes("US-ASCII")).put(ihdr)
        .putInt(crc.getValue.toInt).put(payload).array()
    }

    def jpegWrap(w: Int, h: Int, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(2 + 18 + 13 + payload.length + 2)
      bb.put(Array(0xff, 0xd8).map(_.toByte)) // SOI
      bb.put(Array(0xff, 0xe0).map(_.toByte)).putShort(16.toShort) // APP0 JFIF
        .put("JFIF".getBytes("US-ASCII")).put(0.toByte)
        .put(1.toByte).put(1.toByte).put(0.toByte)
        .putShort(1.toShort).putShort(1.toShort).put(0.toByte).put(0.toByte)
      // SOF0: len 11 = len(2)+precision(1)+h(2)+w(2)+ncomp(1)+1 comp(3)
      bb.put(Array(0xff, 0xc0).map(_.toByte)).putShort(11.toShort)
        .put(8.toByte).putShort(h.toShort).putShort(w.toShort).put(1.toByte)
        .put(1.toByte).put(0x11.toByte).put(0.toByte)
      bb.put(payload)
      bb.put(Array(0xff, 0xd9).map(_.toByte)) // EOI
      bb.array()
    }

    def gifWrap(w: Int, h: Int, payload: Array[Byte]): Array[Byte] =
      java.nio.ByteBuffer.allocate(13 + payload.length + 1)
        .put("GIF89a".getBytes("US-ASCII"))
        .put((w & 0xff).toByte).put(((w >> 8) & 0xff).toByte)
        .put((h & 0xff).toByte).put(((h >> 8) & 0xff).toByte)
        .put(0.toByte).put(0.toByte).put(0.toByte)
        .put(payload).put(0x3b.toByte).array()
  }

  /** RIFF/WAVE header parsing (public format: little-endian RIFF chunks;
    * the `fmt ` chunk carries channels/sample-rate/bit-depth). Returns
    * (channels, sampleRate, bitsPerSample, headerLen) — headerLen is the
    * end of the parsed `fmt ` chunk, mirroring [[ImageHeaders.sniff]]. */
  object AudioHeaders {
    private def le16(b: Array[Byte], i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
    private def tag(b: Array[Byte], i: Int, s: String): Boolean =
      b.length >= i + 4 && b(i) == s(0).toByte && b(i + 1) == s(1).toByte &&
        b(i + 2) == s(2).toByte && b(i + 3) == s(3).toByte

    def sniffWav(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
      if (!(tag(b, 0, "RIFF") && tag(b, 8, "WAVE"))) return None
      var p = 12
      while (p + 8 <= b.length) {
        val size = le32(b, p + 4)
        if (size < 0) return None
        if (tag(b, p, "fmt ") && p + 8 + 16 <= b.length)
          return Some((le16(b, p + 10), le32(b, p + 12), le16(b, p + 22), p + 8 + 16))
        p += 8 + size + (size & 1) // chunks are word-aligned
      }
      None
    }

    /** Content region of the `data` chunk: (offset, length) of the sample
      * bytes themselves, excluding the 8-byte chunk framing — byte stats
      * must run over the same thing for every container, and for WAV that
      * is the sample payload, not `data`+length+samples. */
    def dataChunk(b: Array[Byte]): Option[(Int, Int)] = {
      if (!(tag(b, 0, "RIFF") && tag(b, 8, "WAVE"))) return None
      var p = 12
      while (p + 8 <= b.length) {
        val size = le32(b, p + 4)
        if (size < 0) return None
        if (tag(b, p, "data"))
          return Some((p + 8, math.min(size, b.length - p - 8)))
        p += 8 + size + (size & 1)
      }
      None
    }

    /** Deep SAMPLE decode for 16-bit PCM WAV — real, no media library
      * needed (PCM is raw little-endian int16 per the RIFF/WAVE spec):
      * parses the `fmt ` chunk, requires bits-per-sample 16, and decodes
      * the `data` chunk's bytes to signed samples. The audio analogue of
      * [[graft.operators.PngCodec.decode]]; oracle-checked end-to-end by
      * q_multimodal_samples. Returns None for non-WAV / non-16-bit blobs. */
    def pcmSamples16(blob: Array[Byte]): Option[Array[Short]] =
      sniffWav(blob).filter(_._3 == 16).flatMap { _ =>
        dataChunk(blob).map { case (off, len) =>
          val n = len / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) {
            out(i) = ((blob(off + 2 * i) & 0xff) | (blob(off + 2 * i + 1) << 8)).toShort
            i += 1
          }
          out
        }
      }

    /** Structurally-valid RIFF/WAVE + PCM `fmt ` header with the payload as
      * the data chunk (parseable metadata; silence-free fake samples). */
    def wavWrap(channels: Int, sampleRate: Int, bits: Int, payload: Array[Byte]): Array[Byte] = {
      val byteRate = sampleRate * channels * bits / 8
      val blockAlign = channels * bits / 8
      val bb = java.nio.ByteBuffer.allocate(44 + payload.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + payload.length)
        .put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1.toShort).putShort(channels.toShort).putInt(sampleRate)
        .putInt(byteRate).putShort(blockAlign.toShort).putShort(bits.toShort)
      bb.put("data".getBytes("US-ASCII")).putInt(payload.length).put(payload)
      bb.array()
    }
  }

  /** Deterministic fake media container: 16-byte header
    * [magic:4]["GRFT"] [width:4 BE] [height:4 BE] [type:4] + payload. */
  object FakeCodec {
    val Magic: Array[Byte] = "GRFT".getBytes("UTF-8")

    def encode(width: Int, height: Int, mediaType: Int, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(16 + payload.length)
      bb.put(Magic).putInt(width).putInt(height).putInt(mediaType).put(payload)
      bb.array()
    }

    /** STUB decode — replace with a real codec; everything downstream keeps
      * working because only (width, height, type, payload) come out. */
    def decode(blob: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
      if (blob.length < 16 || !blob.take(4).sameElements(Magic)) None
      else {
        val bb = java.nio.ByteBuffer.wrap(blob)
        bb.position(4)
        val w = bb.getInt; val h = bb.getInt; val t = bb.getInt
        Some((w, h, t, blob.drop(16)))
      }
    }
  }

  /** Deterministic variable-size frame split for the synthetic AVI blobs:
    * frame f carries `48 + 16·((id + f) mod 3)` bytes (48/64/80, phase set
    * by doc_id), the tail frame whatever remains. Variable ON PURPOSE —
    * fixed-size frames would let fixed-offset arithmetic masquerade as a
    * container walk; with these, only reading each chunk's own size header
    * (what [[AviCodec.frames]] does) finds the boundaries. The formula is
    * closed-form enough for the DuckDB oracle to replay (a running sum
    * over generate_series). */
  private[operators] def frameSlices(id: Long, payload: Array[Byte]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    var off = 0
    var f = 0
    while (off < payload.length) {
      val nominal = 48 + 16 * (((id + f) % 3).toInt)
      val len = math.min(nominal, payload.length - off)
      out += payload.slice(off, off + len)
      off += len
      f += 1
    }
    out.result()
  }

  /** Synthesize a deterministic binary media column from the documents table
    * (stand-in for real blobs; width/height derived from doc_id). Every
    * container is REAL — PNG, JPEG, GIF, WAV and RIFF/AVI with genuine
    * signatures, dimension fields and (for AVI) per-frame movi chunks +
    * idx1 — so the pipeline exercises the real parsers end to end; the
    * fake container survives only as the declared unknown-blob fallback. */
  def synthesizeBlobs(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map { case (id, text) =>
      val w = (64 + (id % 16) * 32).toInt
      val h = (64 + (id % 9) * 32).toInt
      val payload = text.getBytes("UTF-8")
      val blob = (id % 5) match {
        case 0 => ImageHeaders.gifWrap(w, h, payload)
        case 1 => AudioHeaders.wavWrap((1 + id % 2).toInt, (8000 * (1 + id % 3)).toInt,
          16, payload)
        case 3 => ImageHeaders.pngWrap(w, h, payload)
        case 4 => ImageHeaders.jpegWrap(w, h, payload)
        case _ => AviCodec.wrap(w, h, frameSlices(id, payload))
      }
      (id, blob)
    }.toDF("doc_id", "blob")
  }

  private val typeNames = Array("image", "audio", "video")

  /** Partition-local decode + feature extraction over a (doc_id, blob) frame.
    * No shuffle; one pass per partition; undecodable blobs are dropped. */
  def extractFeatures(blobs: DataFrame): Dataset[MediaFeatures] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, blob) =>
          // real containers first (PNG/JPEG/GIF/WAV magic bytes), then
          // the declared fake container; neither → dropped. Byte stats run
          // over the CONTENT bytes for every media type — the header prefix
          // the sniffer consumed AND the format's structural framing are
          // sliced off (WAV: the data chunk's samples, not its 8-byte
          // chunk header; GIF: minus the 0x3b trailer; JPEG: minus the
          // FFD9 EOI marker) — so byte_mean / byte_entropy mean the same
          // thing across formats (ADVICE r4 + round-5 review). For real
          // PNGs the post-IHDR bytes still include IDAT chunk framing
          // (deep chunk walking belongs to the stubbed decode layer).
          def trimTrailer(fmt: String, body: Array[Byte]): Array[Byte] = fmt match {
            case "gif" if body.nonEmpty && body.last == 0x3b.toByte => body.dropRight(1)
            case "jpeg" if body.length >= 2 &&
              (body(body.length - 2) & 0xff) == 0xff &&
              (body(body.length - 1) & 0xff) == 0xd9 => body.dropRight(2)
            case _ => body
          }
          val meta = ImageHeaders.sniff(blob)
            .map { case (fmt, w, h, hdr) => (fmt, w, h, 0, 0, trimTrailer(fmt, blob.drop(hdr))) }
            .orElse(AudioHeaders.sniffWav(blob)
              .map { case (ch, rate, _, hdr) =>
                val body = AudioHeaders.dataChunk(blob)
                  .map { case (off, len) => blob.slice(off, off + len) }
                  .getOrElse(blob.drop(hdr))
                ("wav", 0, 0, rate, ch, body)
              })
            .orElse(AviCodec.sniff(blob).flatMap { case (w, h, _) =>
              // real container frames, concatenated: the video analogue of
              // WAV's data-chunk body (content bytes, no chunk framing)
              AviCodec.payload(blob).map(body => ("video", w, h, 0, 0, body))
            })
            .orElse(FakeCodec.decode(blob)
              .map { case (w, h, t, payload) => (typeNames(t % 3), w, h, 0, 0, payload) })
          meta.map { case (fmt, w, h, rate, ch, payload) =>
            val counts = new Array[Long](256)
            var byteSum = 0L
            payload.foreach { b => counts(b & 0xff) += 1; byteSum += (b & 0xff) }
            val n = payload.length.toDouble.max(1.0)
            // mean: ONE integer-sum division, so the value is the same IEEE
            // double the SQL oracle computes (sum(v)/n) — Σ(i·cᵢ)/n summed
            // term-by-term would drift by ulps and break the exact gate
            val mean = byteSum.toDouble / n
            var entropy = 0.0
            var i = 0
            while (i < 256) {
              if (counts(i) > 0) {
                val p = counts(i) / n
                entropy -= p * (math.log(p) / math.log(2))
              }
              i += 1
            }
            // floor(x·1e6 + 0.5): identical pure-double rounding in Spark
            // and DuckDB (rint would tie-break half-even here, half-away
            // there)
            MediaFeatures(id, fmt, w, h, rate, ch, blob.length.toLong,
              math.floor(mean * 1e6 + 0.5) / 1e6,
              math.floor(entropy * 1e6 + 0.5) / 1e6)
          }
        }
      }
  }

  /** Nearest-neighbor pixel resample — exact integer source indexing
    * (src x = x·sw/tw, floor division), so the resampled grid is
    * reproducible arithmetic any engine can replay, unlike a float
    * box/bilinear kernel. `channels` 1 (gray) or 3 (RGB). */
  def resampleNearest(sw: Int, sh: Int, px: Array[Byte], tw: Int, th: Int,
      channels: Int): Array[Byte] = {
    require(px.length == sw * sh * channels, s"expect $sw x $sh x $channels pixels")
    val out = new Array[Byte](tw * th * channels)
    var y = 0
    while (y < th) {
      val sy = y * sh / th
      var x = 0
      while (x < tw) {
        val sx = x * sw / tw
        var c = 0
        while (c < channels) {
          out((y * tw + x) * channels + c) = px((sy * sw + sx) * channels + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    out
  }

  /** Resize (the brief's resize step): partition-local pass that rewrites
    * every VISUAL container to the target dimensions. For payloads the
    * real codecs can decode, the pixels are GENUINELY resampled
    * (nearest-neighbor [[resampleNearest]]) and re-encoded — PNG and GIF
    * losslessly, JPEG through its baseline coder; closes what used to be
    * the declared resample stub. Synthetic containers whose payload is
    * not a decodable stream keep the header-rewrite behavior (dims
    * rewritten by the real writers, payload verbatim), so the plumbing
    * oracle stays formula-exact on the synthesized corpus while real
    * image bytes take the real path (q_resample_pixels pins it). Audio
    * and undecodable blobs pass through untouched. No shuffle; schema
    * preserved (doc_id, blob).
    */
  def resizeImages(blobs: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, blob) =>
          val resized = ImageHeaders.sniff(blob) match {
            case Some((fmt, _, _, hdr)) =>
              val payload = blob.drop(hdr) // header-rewrite fallback payload
              fmt match {
                case "png" => PngCodec.decode(blob) match {
                  case Some((sw, sh, rgb)) => PngCodec.encode(targetW, targetH,
                    resampleNearest(sw, sh, rgb, targetW, targetH, 3), _ => 0)
                  case None => ImageHeaders.pngWrap(targetW, targetH, payload)
                }
                case "jpeg" => JpegCodec.decode(blob) match {
                  case Some((sw, sh, gray)) => JpegCodec.encode(targetW, targetH,
                    resampleNearest(sw, sh, gray, targetW, targetH, 1))
                  case None => ImageHeaders.jpegWrap(targetW, targetH,
                    // jpegWrap appends its own EOI; avoid doubling it
                    if (payload.length >= 2 &&
                      (payload(payload.length - 2) & 0xff) == 0xff &&
                      (payload(payload.length - 1) & 0xff) == 0xd9)
                      payload.dropRight(2) else payload)
                }
                case "gif" => GifCodec.decode(blob) match {
                  case Some((sw, sh, gray)) => GifCodec.encode(targetW, targetH,
                    resampleNearest(sw, sh, gray, targetW, targetH, 1))
                  case None => ImageHeaders.gifWrap(targetW, targetH,
                    // gifWrap appends its own trailer; avoid doubling it
                    if (payload.nonEmpty && payload.last == 0x3b.toByte)
                      payload.dropRight(1) else payload)
                }
                case _ => blob
              }
            case None => AviCodec.resize(blob, targetW, targetH).getOrElse {
              FakeCodec.decode(blob) match {
                case Some((_, _, t, payload)) if t % 3 != 1 => // fake image/video
                  FakeCodec.encode(targetW, targetH, t, payload)
                case _ => blob // audio / unknown: untouched
              }
            }
          }
          (id, resized)
        }
      }.toDF("doc_id", "blob")
  }

  /** One sampled pseudo-frame of a video blob. */
  final case class SampledFrame(doc_id: Long, frame_idx: Int, n_frames: Long,
      frame: Array[Byte])

  /** Frame sampling (the brief's frame-sample step), REAL for AVI: every
    * video blob's frames are located by WALKING the RIFF `movi` chunk
    * headers ([[AviCodec.frames]] — each chunk carries its own size, the
    * container's actual frame boundaries, cross-checked against `idx1`),
    * and every `everyK`-th frame is emitted as its own row. Partition-
    * local flatMap, binary frame column, typed row shape, no shuffle.
    * Non-AVI fake-container videos keep the legacy fixed-`frameBytes`
    * split as the declared unknown-codec fallback. */
  def sampleFrames(blobs: DataFrame, everyK: Int = 2,
      frameBytes: Int = 64): Dataset[SampledFrame] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, blob) =>
          AviCodec.frames(blob) match {
            case Some(fs) =>
              val nFrames = fs.length
              fs.iterator.zipWithIndex.filter(_._2 % everyK == 0).map {
                case ((off, len), f) =>
                  SampledFrame(id, f, nFrames.toLong, blob.slice(off, off + len))
              }
            case None => FakeCodec.decode(blob) match {
              case Some((_, _, t, payload)) if typeNames(t % 3) == "video" =>
                val nFrames = (payload.length + frameBytes - 1) / frameBytes
                (0 until nFrames).iterator.filter(_ % everyK == 0).map { f =>
                  SampledFrame(id, f, nFrames.toLong,
                    payload.slice(f * frameBytes, (f + 1) * frameBytes))
                }
              case _ => Iterator.empty
            }
          }
        }
      }
  }
}
