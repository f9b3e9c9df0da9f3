package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Decoded media metadata + features for one blob. */
final case class MediaFeatures(
    doc_id: Long, media_type: String, width: Int, height: Int,
    n_bytes: Long, byte_mean: Double, byte_entropy: Double)

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, decoded/feature-extracted in partition-local batches.
  *
  * The actual codec step is a STUB (no image/audio libs in this container):
  * [[FakeCodec.decode]] parses our deterministic 16-byte header instead of a
  * real JPEG/WAV decoder — swap that one function for the real thing. The
  * Spark-side contract (schema, binary column, partition batching, feature
  * output shape) is real and tested.
  *
  * At 100 TB: blobs stay columnar in parquet, the scan prunes to (id, blob),
  * decode runs per-partition with zero shuffles; only the small feature
  * frame moves downstream.
  */
object Multimodal {

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

  /** Synthesize a deterministic binary media column from the documents table
    * (stand-in for real blobs; width/height derived from doc_id). */
  def synthesizeBlobs(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map { case (id, text) =>
      val w = (64 + (id % 16) * 32).toInt
      val h = (64 + (id % 9) * 32).toInt
      val t = (id % 3).toInt // 0=image 1=audio 2=video
      (id, Multimodal.FakeCodec.encode(w, h, t, text.getBytes("UTF-8")))
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
          FakeCodec.decode(blob).map { case (w, h, t, payload) =>
            val counts = new Array[Long](256)
            payload.foreach(b => counts(b & 0xff) += 1)
            val n = payload.length.toDouble.max(1.0)
            var mean = 0.0; var entropy = 0.0
            var i = 0
            while (i < 256) {
              mean += (i * counts(i)) / n
              if (counts(i) > 0) {
                val p = counts(i) / n
                entropy -= p * (math.log(p) / math.log(2))
              }
              i += 1
            }
            MediaFeatures(id, typeNames(t % 3), w, h, blob.length.toLong,
              math.rint(mean * 1e6) / 1e6, math.rint(entropy * 1e6) / 1e6)
          }
        }
      }
  }
}
