package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (builder prompt): image/audio/video payloads
  * are opaque `binary` columns with typed metadata; decode / feature-extract
  * run as batched per-partition kernels (the Scala analogue of
  * `mapInPandas` — one iterator of batches per partition, not a per-row
  * UDF). The actual codec is STUBBED (no image/audio libs ship in this
  * container): `decodeStub` derives deterministic pseudo-metadata from the
  * bytes, while the Spark-side contract — schema, partition-preserving
  * batch shape, null passthrough — is real and tested. */
object MultimodalOps {

  /** typed output of the "decode" kernel */
  final case class MediaMeta(
      doc_id: Long,
      byte_len: Int,
      // ??? real decode goes here — stubbed deterministic pseudo-fields:
      width: Int,
      height: Int,
      checksum: Long,
      features: Array[Float])

  val FeatureDim = 8

  /** deterministic fake decode: byte length, fake dims from a rolling hash,
    * FNV-1a checksum, and an 8-dim byte-histogram feature vector. */
  def decodeStub(docId: Long, bytes: Array[Byte]): MediaMeta = {
    var h = 0xcbf29ce484222325L // FNV-1a 64
    var i = 0
    val hist = new Array[Float](FeatureDim)
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xFFL)) * 0x100000001b3L
      hist((bytes(i) & 0xFF) % FeatureDim) += 1f
      i += 1
    }
    val w = 64 + (math.abs(h) % 1024).toInt
    val ht = 64 + (math.abs(h >> 10) % 1024).toInt
    MediaMeta(docId, bytes.length, w, ht, h, hist)
  }

  /** decode as a partition-batched kernel over (doc_id, payload BINARY):
    * mapPartitions keeps the per-partition batch shape of mapInPandas. */
  def decode(df: DataFrame): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup (where a real codec would init its context)
        it.map { case (id, bytes) =>
          if (bytes == null) MediaMeta(id, -1, 0, 0, 0L, new Array[Float](FeatureDim))
          else decodeStub(id, bytes)
        }
      }
  }

  /** "frame-sample": pick every k-th byte window as a frame digest —
    * demonstrates the explode-to-frames shape (video → frame rows). */
  def frameSample(df: DataFrame, stride: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        if (bytes == null) Iterator.empty
        else bytes.grouped(stride).zipWithIndex.map { case (frame, idx) =>
          (id, idx, frame.length, frame.map(_ & 0xFF).sum.toLong)
        }
      }
      .toDF("doc_id", "frame_idx", "frame_len", "frame_sum")
  }
}
