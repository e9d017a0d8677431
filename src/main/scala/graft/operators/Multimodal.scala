package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in batched partition-level kernels.
  *
  * Round 3: image and audio decode are REAL — pure-JVM BMP and PCM-WAV
  * parsing over genuine binaries (MediaCodecs), with resize→embedding and
  * duration/rms/zcr/peak features, oracle-gated by `q_media_decode`. Video
  * remains the one clearly-marked STUB (`FakeDecoder`; real codecs need
  * native libraries this container lacks) — the Spark-side contract it
  * exercises (schema, batch shape, partition parallelism) is identical.
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

  // ------------------------------------------------- REAL decode (BMP / WAV)

  /** One deterministic REAL media binary per id: even ids get a 24-bit BMP
    * with a gradient/checker pattern, odd ids a 16-bit PCM WAV sine clip —
    * genuine files of their formats (MediaCodecs encoders), standing in for
    * an Iceberg media-table scan. */
  def realMediaRow(id: Long): MediaRow = {
    if (id % 2 == 0) {
      val w = 16 + (id % 16).toInt
      val h = 12 + (id % 12).toInt
      val bytes = MediaCodecs.encodeBmp(w, h, (x, y) => {
        val r = (x * 255 / math.max(1, w - 1)) & 0xff
        val g = (y * 255 / math.max(1, h - 1)) & 0xff
        val b = (((x + y + id) % 2) * 255).toInt & 0xff
        (r << 16) | (g << 8) | b
      })
      MediaRow(id, bytes, "image", w, h)
    } else {
      val sampleRate = 8000
      val n = 400 + (id % 200).toInt * 2
      val freq = 100.0 + (id % 50) * 10.0
      val samples = Array.tabulate(n)(i =>
        (math.sin(2 * math.Pi * freq * i / sampleRate) * 12000).toShort)
      MediaRow(id, MediaCodecs.encodeWav(sampleRate, samples), "audio", 0, 0)
    }
  }

  def realMediaTable(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, 8).as[Long].map(realMediaRow)
  }

  /** Decode one real media row to the unified feature schema (driver- and
    * executor-side share this, so the VALUES oracle gates the distributed
    * plumbing). */
  def decodeRow(m: MediaRow): (Long, String, Int, Int, Int, Double, Double, Double, Double) = {
    def r4(x: Double): Double = math.round(x * 10000) / 10000.0
    if (m.format == "image") {
      val img = MediaCodecs.decodeBmp(m.media)
      val emb = MediaCodecs.imageEmbedding(img)
      val mean = emb.sum / emb.length
      (m.doc_id, "image", img.width, img.height, img.argb.length,
        r4(emb(0)), r4(emb(emb.length - 1)), r4(mean), r4(emb.max))
    } else {
      val wav = MediaCodecs.decodeWav(m.media)
      val f = MediaCodecs.audioFeatures(wav)
      (m.doc_id, "audio", wav.sampleRate, wav.channels, wav.samples.length,
        r4(f(0)), r4(f(1)), r4(f(2)), r4(f(3)))
    }
  }

  /** Batched REAL decode: narrow mapPartitions over genuine binaries —
    * image rows parse BMP headers + pixels (resize → 8×8 gray embedding),
    * audio rows walk RIFF chunks + PCM samples (duration/rms/zcr/peak). */
  def decodeReal(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeRow))
      .toDF("doc_id", "kind", "dim1", "dim2", "n_units", "f0", "f1", "f2", "f3")
  }
}
