package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata; decode / feature-extract run as
  * batched partition-local transforms (the Scala analogue of a Pandas UDF
  * over mapInPandas: one JVM-side pass per partition, vectorizable batch
  * shape, no per-row driver involvement).
  *
  * The actual media decode is STUBBED (no image/audio libs in this
  * container): `decodeStub` derives deterministic fake metadata + features
  * from the bytes, while everything Spark-side — schema, binary transport,
  * partition batching, feature vector shape — is real and tested. A real
  * decoder drops into `decodeStub` without touching the plumbing.
  */
object Multimodal {

  case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int,
                       channels: Int, features: Array[Float])

  /** Deterministic fake decode: metadata from byte length, features from
    * a strided byte sample (stands in for `???` — a real JPEG/PNG decode).
    */
  def decodeStub(id: Long, bytes: Array[Byte], featDim: Int): MediaMeta = {
    val n = bytes.length
    val width = 64 + (n % 577)
    val height = 64 + ((n / 7) % 449)
    val channels = 1 + (n % 3)
    val stride = math.max(1, n / featDim)
    val feats = Array.tabulate(featDim) { i =>
      val off = i * stride
      if (off < n) (bytes(off) & 0xFF).toFloat / 255.0f else 0.0f
    }
    MediaMeta(id, n, width, height, channels, feats)
  }

  /** (doc_id, payload binary) → typed metadata + feature vector, one
    * partition-local batch pass.
    */
  def extract(media: DataFrame, featDim: Int = 8): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodeStub(id, if (bytes == null) Array.empty[Byte] else bytes, featDim)
      })
  }

  /** Frame sampling stand-in: take every `stride`-th byte as a "frame" and
    * emit (doc_id, frame_idx, frame_byte) rows — the row-explosion shape a
    * real video frame sampler produces.
    */
  def frameSample(media: DataFrame, stride: Int = 64,
                  maxFrames: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val b = if (bytes == null) Array.empty[Byte] else bytes
        (0 until math.min(maxFrames, b.length / stride)).map { f =>
          (id, f, b(f * stride) & 0xFF)
        }
      }.toDF("doc_id", "frame_idx", "frame_byte")
  }
}
