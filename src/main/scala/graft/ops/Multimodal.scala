package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video payloads ride as opaque
 * `binary` columns with typed metadata; decode / feature-extraction runs
 * per-partition over batches (the Scala-idiomatic analogue of a Pandas-UDF
 * `mapInPandas` stage — a typed `mapPartitions` so decoder state is
 * amortized across a partition, not per row).
 *
 * The actual codec is STUBBED (no image/audio libraries in this container):
 * [[decodeStub]] derives a deterministic fake feature vector from the bytes.
 * The Spark-side contract — schema, batching, partition-level reuse,
 * null/empty handling — is real and tested.
 */
object Multimodal {

  final case class MediaMeta(url: String, n_bytes: Long, kind: String,
                             width: Int, height: Int, features: Array[Float])

  /** STUB decoder: stands in for e.g. JPEG decode + CNN feature extraction.
    * Deterministic pure function of the payload so tests are stable. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    // ??? <- real decoder goes here (libjpeg / ffmpeg / ONNX runtime);
    // deterministic fake: dimensions + 8-dim feature from byte statistics
    if (bytes == null || bytes.isEmpty) return (0, 0, Array.empty)
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    val w = 16 + (math.abs(h % 1024)).toInt
    val ht = 16 + (math.abs((h >> 10) % 1024)).toInt
    val feat = Array.tabulate(8)(k => ((h >> (8 * (k % 8))) & 0xFF).toFloat / 255f)
    (w, ht, feat)
  }

  private def sniffKind(bytes: Array[Byte]): String =
    if (bytes == null || bytes.length < 4) "unknown"
    else if (bytes(0) == '<'.toByte) "html"
    else if ((bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8) "jpeg"
    else if (bytes(0) == 'R'.toByte && bytes(1) == 'I'.toByte) "riff"
    else "binary"

  /**
   * Partition-batched decode + featurize of a binary column.
   * @param pages DataFrame with (url: string, html: binary)
   */
  def extract(pages: DataFrame): Dataset[MediaMeta] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.select(col("url"), col("html"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init happens HERE (amortized), not per row
        it.map { case (url, bytes) =>
          val (w, h, feat) = decodeStub(bytes)
          MediaMeta(url, if (bytes == null) 0L else bytes.length.toLong,
            sniffKind(bytes), w, h, feat)
        }
      }
  }
}
