package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The decode step is a STUB — a deterministic fake standing in for a
  * real codec (image/audio libraries are not available in this build
  * environment). Everything around it is real Spark plumbing:
  *  - schema: (media_id, modality, content binary, meta struct)
  *  - per-partition batched processing via `mapPartitions` on a typed
  *    Dataset (the Scala analog of pandas-batch UDFs): one decoder
  *    instantiation per partition, rows streamed through it — exactly
  *    how a JNI/FFI codec binding would be amortized at 100 TB
  *  - frame sampling as a generator (flatMap-style explode) keyed by
  *    metadata, not by decoding
  *
  * Scale notes: binary payloads stay columnar in parquet until the scan
  * projects them; repartitioning before decode spreads codec CPU
  * across executors; feature vectors are fixed-width arrays (columnar,
  * spill-friendly), never per-row objects.
  */
object Multimodal {

  case class MediaMeta(width: Int, height: Int, sampleRate: Int, durationMs: Int)
  case class MediaRow(media_id: Long, modality: String, content: Array[Byte],
                      meta: MediaMeta)
  case class MediaFeatures(media_id: Long, modality: String, n_bytes: Int,
                           features: Array[Double])
  case class Frame(media_id: Long, frame_idx: Int, ts_ms: Int,
                   frame_bytes: Array[Byte])

  /** Deterministic synthetic media table derived from `documents`
    * (text bytes as payload) — stands in for a real binary source. */
  def synthesize(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      encode(col("text"), "utf-8").as("content"),
      struct(
        (col("n_chars") % 64 + 16).cast("int").as("width"),
        (col("n_chars") % 48 + 16).cast("int").as("height"),
        lit(16000).as("sampleRate"),
        (col("n_chars") * 10).cast("int").as("durationMs")).as("meta"))

  /** STUB DECODER — deterministic fake: byte-level summary statistics
    * in place of codec output. A real build swaps `decodeBatch` for the
    * codec call; the Dataset plumbing is unchanged. */
  // half-up for non-negative values, matching SQL round() tie semantics
  private def round6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  private def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
    rows.map { r =>
      val bytes = r.content
      val n = bytes.length
      val mean = if (n == 0) 0.0 else bytes.map(_ & 0xff).sum.toDouble / n
      val variance =
        if (n == 0) 0.0 else bytes.map(b => math.pow((b & 0xff) - mean, 2)).sum / n
      val features = Array(
        n.toDouble, round6(mean), round6(variance),
        r.meta.width.toDouble, r.meta.height.toDouble)
      MediaFeatures(r.media_id, r.modality, n, features)
    }

  /** Batched feature extraction: one decoder per partition. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(decodeBatch)
  }

  /** Frame sampling for video rows: one row per sampled frame every
    * `everyMs`, sliced from the payload (fake frames — real plumbing).
    * Pure generator: array expression + explode, no shuffle. */
  def sampleFrames(media: DataFrame, everyMs: Int): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("modality") === "video").as[MediaRow]
      .flatMap { r =>
        val nFrames = math.max(r.meta.durationMs / everyMs, 1)
        (0 until nFrames).map { i =>
          // Long arithmetic: i * payloadBytes overflows Int for
          // realistic media (10 MB x frame index 215 wraps negative
          // and slices garbage); narrow back only after the division
          val len = r.content.length.toLong
          val start = (i.toLong * len / nFrames).min(len).toInt
          val end = ((i + 1).toLong * len / nFrames).min(len).toInt
          Frame(r.media_id, i, i * everyMs, r.content.slice(start, end))
        }
      }
  }

  /** Resize stub: deterministic payload reshaping to width*height bytes
    * (truncate / cycle-pad) with metadata updated in lockstep. */
  def resize(media: DataFrame, w: Int, h: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map { r =>
      val target = w * h
      val out = Array.tabulate[Byte](target)(i =>
        if (r.content.isEmpty) 0 else r.content(i % r.content.length))
      r.copy(content = out, meta = r.meta.copy(width = w, height = h))
    })
  }
}
