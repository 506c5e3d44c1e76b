package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata alongside. The Spark-side plumbing
  * (schema, batch shape, partition sizing) is real; the codec itself is a
  * clearly-marked deterministic STUB — this container ships no image/audio
  * libraries, and at cluster scale the decode would be swapped for a real
  * codec inside the same mapPartitions shape.
  *
  * Schema convention:
  *   media(media_id BIGINT, kind STRING, payload BINARY,
  *         meta STRUCT<width INT, height INT, sample_rate INT>)
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, sample_rate: Int)
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      // STUB features — deterministic byte statistics standing in for a
      // real decoder's output; same shape (fixed-length Array[Float])
      features: Array[Float])

  /** Deterministic fake "decode + feature extraction".
    * REAL IMPLEMENTATION WOULD: decode payload (JPEG/PNG/WAV), resize or
    * frame-sample, run a feature extractor, emit a fixed-length vector.
    * STUB: 8 byte-histogram statistics — deterministic, schema-correct.
    */
  def stubDecodeFeatures(payload: Array[Byte]): Array[Float] = {
    val feats = new Array[Float](8)
    if (payload == null || payload.isEmpty) return feats
    var i = 0
    var sum = 0L; var mx = 0; var mn = 255
    val hist = new Array[Int](4)
    while (i < payload.length) {
      val b = payload(i) & 0xff
      sum += b
      if (b > mx) mx = b
      if (b < mn) mn = b
      hist(b >> 6) += 1
      i += 1
    }
    val n = payload.length.toFloat
    feats(0) = n
    feats(1) = sum.toFloat / n
    feats(2) = mx.toFloat
    feats(3) = mn.toFloat
    feats(4) = hist(0) / n; feats(5) = hist(1) / n
    feats(6) = hist(2) / n; feats(7) = hist(3) / n
    feats
  }

  /** Feature extraction over the media table via mapPartitions — the batch
    * shape a real (expensive, library-backed) decoder needs: per-partition
    * init (load codec once), then stream rows through it.
    */
  def extractFeatures(media: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition codec init would happen HERE (once, not per row)
      rows.map { r =>
        MediaFeatures(r.media_id, r.kind, if (r.payload == null) 0L else r.payload.length.toLong,
          stubDecodeFeatures(r.payload))
      }
    }.toDF()
  }

  /** Synthesize a deterministic media table from the documents table (the
    * container has no real binaries; payload = UTF-8 bytes of the text,
    * kind round-robins image/audio/video).
    */
  def synthesizeFromDocuments(docs: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map { case (id, text) =>
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      MediaRow(id, kind, text.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        MediaMeta(width = 64 + (id % 8).toInt * 16, height = 64, sample_rate = 16000))
    }.toDF()
  }
}
