package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in batched partition-level kernels.
  *
  * The decode step is a clearly-marked STUB (this container has no
  * image/audio codecs): `FakeDecoder` is a deterministic stand-in that
  * preserves the real Spark-side contract — schema, batch shape, partition
  * parallelism — so swapping in a real codec (JNI/ONNX) changes one class.
  * At 100 TB the binary payloads stay columnar (parquet binary), the decode
  * is a narrow mapPartitions with no shuffle, and feature outputs are
  * fixed-width float arrays suitable for the ANN operators in Similarity.
  */
object Multimodal {

  final case class MediaRow(
      doc_id: Long,
      media: Array[Byte],
      format: String,
      width: Int,
      height: Int)

  final case class MediaFeatures(
      doc_id: Long,
      format: String,
      n_bytes: Int,
      n_frames: Int,
      feature: Seq[Float])

  /** Synthesize a media table from `documents` (payload = utf-8 text bytes;
    * deterministic metadata). Stands in for an Iceberg media table scan. */
  def mediaTable(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text"), col("n_chars")).as[(Long, String, Long)]
      .map { case (id, text, n) =>
        val fmt = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        MediaRow(id, text.getBytes("UTF-8"), fmt, (n % 640).toInt + 16, (n % 480).toInt + 16)
      }
  }

  /** STUB decoder — deterministic fake: "features" are a 16-bin byte
    * histogram (normalized); "frames" are fixed-size payload slices. A real
    * implementation would decode pixels/samples here; everything around it
    * (batching, schema, partitioning) is production-shaped. */
  object FakeDecoder {
    val FeatureDim = 16
    def features(payload: Array[Byte]): Array[Float] = {
      val hist = new Array[Float](FeatureDim)
      payload.foreach(b => hist((b & 0xff) % FeatureDim) += 1f)
      val n = math.max(1, payload.length)
      hist.map(_ / n)
    }
    def frameCount(payload: Array[Byte], format: String): Int = format match {
      case "video" => math.max(1, payload.length / 64) // 64-byte "frames"
      case "audio" => math.max(1, payload.length / 256)
      case _ => 1
    }
  }

  /** Batched decode+featurize: one kernel invocation per partition (the
    * mapPartitions analogue of mapInPandas batches). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        MediaFeatures(m.doc_id, m.format, m.media.length,
          FakeDecoder.frameCount(m.media, m.format),
          FakeDecoder.features(m.media).toSeq)
      }
    }
  }

  /** Frame sampling for video rows: every k-th frame index (plumbing for a
    * real frame extractor). */
  def sampleFrames(media: Dataset[MediaRow], everyK: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.format == "video").flatMap { m =>
      val n = FakeDecoder.frameCount(m.media, m.format)
      (0 until n by everyK).map(f => (m.doc_id, f, math.min(64, m.media.length - f * 64)))
    }.toDF("doc_id", "frame_idx", "frame_bytes")
  }
}
