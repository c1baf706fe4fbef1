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

  // ---------- real image-header decoding (PNG / JPEG) ----------
  //
  // Genuine public-format parsing — not part of the stub: PNG stores
  // width/height big-endian at fixed IHDR offsets (bytes 16-23 of the
  // file, per the PNG spec's 8-byte signature + 4-byte chunk length +
  // "IHDR"); JPEG requires walking variable-length marker segments
  // from SOI until a start-of-frame marker, whose payload carries
  // (precision, height, width). Audio/video decode remains the
  // declared stub below.

  /** Synthetic image table with REAL headers: even doc_id → a PNG
    * (signature + IHDR), odd → a JPEG (SOI + variable-length APP0 +
    * DQT + SOF0), dimensions derived deterministically from the id so
    * an oracle can state the expected parse without reading bytes.
    * The APP0 padding length varies per id and a DQT segment sits
    * between APP0 and SOF0, so nothing about the SOF offset is fixed —
    * the parser must do real marker arithmetic. Document text bytes
    * are appended as payload junk after the header. (PNG chunk CRCs
    * are not valid — the parser reads structure, not checksums.) */
  def synthesizeImages(docs: DataFrame): DataFrame = {
    val w = (lit(16) + pmod(col("doc_id"), lit(1024))).cast("int")
    val h = (lit(16) + pmod(col("doc_id") * 7, lit(768))).cast("int")
    val hex4 = (c: org.apache.spark.sql.Column) => lpad(hex(c), 8, "0")
    val hex2 = (c: org.apache.spark.sql.Column) => lpad(hex(c), 4, "0")
    val png = concat(
      lit("89504E470D0A1A0A"), // signature
      lit("0000000D"), lit("49484452"), // IHDR length + type
      hex4(w), hex4(h),
      lit("0806000000"), // bit depth, color type, compression, filter, interlace
      lit("00000000")) // chunk CRC (not validated)
    // APP0 payload: "JFIF\0" + padLen zero bytes; length field counts
    // itself (2) + payload
    val padLen = (lit(16) + pmod(col("doc_id") * 3, lit(32))).cast("int")
    val jpeg = concat(
      lit("FFD8"), // SOI
      lit("FFE0"), hex2(padLen + 7), lit("4A46494600"),
      expr("repeat('00', cast(16 + (doc_id * 3) % 32 as int))"),
      lit("FFDB"), lit("0006"), expr("repeat('00', 4)"), // DQT (dummy payload)
      lit("FFC0"), lit("0011"), lit("08"), // SOF0, length 17, precision 8
      hex2(h), hex2(w),
      lit("03001100031101031101")) // 3 components
    docs.select(
      col("doc_id").as("media_id"),
      concat(
        unhex(when(pmod(col("doc_id"), lit(2)) === 0, png).otherwise(jpeg)),
        encode(col("text"), "utf-8")).as("content"))
  }

  /** Parse (fmt, width, height) from an image binary column with PURE
    * codegen'd expressions — no UDF in the plan:
    *  - PNG: validate the 8-byte signature and the "IHDR" chunk type,
    *    then big-endian ints at fixed offsets (`conv(hex(slice))`).
    *  - JPEG: validate SOI, then walk marker segments with COMPUTED
    *    `substr` offsets (each hop reads the current segment's
    *    big-endian length and jumps past it), unrolled to `maxHops`
    *    segments, stopping at any start-of-frame marker (C0/C1/C2).
    * Rows that parse as neither format get fmt=NULL (caller filters
    * or routes them to [[extractFeatures]]). The full any-segment-count
    * walker lives in [[decodeBatch]]; this expression path covers
    * headers with up to `maxHops` leading segments. */
  def imageDims(media: DataFrame, contentCol: String = "content",
                maxHops: Int = 6): DataFrame = {
    val c = col(contentCol)
    def beInt(pos: org.apache.spark.sql.Column, len: Int) =
      conv(hex(c.substr(pos, lit(len))), 16, 10).cast("int")
    val isPng = hex(c.substr(lit(1), lit(8))) === "89504E470D0A1A0A" &&
      hex(c.substr(lit(13), lit(4))) === "49484452"
    val isJpeg = hex(c.substr(lit(1), lit(2))) === "FFD8"
    // JPEG walk: first marker at byte 3 (1-based); a non-SOF segment's
    // next marker is at pos + 2 (marker) + length (length counts itself)
    val sofMarkers = Seq("FFC0", "FFC1", "FFC2")
    def walk(pos: org.apache.spark.sql.Column, hops: Int): org.apache.spark.sql.Column = {
      val marker = hex(c.substr(pos, lit(2)))
      val atSof = marker.isin(sofMarkers: _*)
      if (hops == 0) when(atSof, pos)
      else when(atSof, pos).otherwise(walk(pos + lit(2) + beInt(pos + 2, 2), hops - 1))
    }
    val sofPos = walk(lit(3), maxHops)
    val fmt = when(isPng, "png").when(isJpeg && sofPos.isNotNull, "jpeg")
    media.select(
      media.columns.map(col) :+
        fmt.as("fmt") :+
        when(isPng, beInt(lit(17), 4))
          .when(isJpeg, beInt(sofPos + 7, 2)).as("width") :+
        when(isPng, beInt(lit(21), 4))
          .when(isJpeg, beInt(sofPos + 5, 2)).as("height"): _*)
      .drop(contentCol)
  }

  /** Scala-side header walk for [[decodeBatch]]: any number of JPEG
    * segments (skips APPn/DQT/DHT/COM/..., stops at SOF0-SOF15 minus
    * the non-frame C4/C8/CC), PNG at fixed offsets. */
  private[graft] def parseDims(b: Array[Byte]): Option[(String, Int, Int)] = {
    def u8(i: Int) = b(i) & 0xff
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int) = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    if (b.length >= 24 && pngSig.indices.forall(i => u8(i) == pngSig(i)) &&
        new String(b.slice(12, 16), "US-ASCII") == "IHDR")
      Some(("png", be32(16), be32(20)))
    else if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var pos = 2
      while (pos + 9 < b.length && u8(pos) == 0xff) {
        val m = u8(pos + 1)
        val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
        if (isSof) return Some(("jpeg", be16(pos + 7), be16(pos + 5)))
        pos += 2 + be16(pos + 2)
      }
      None
    } else None
  }

  /** DECODER — real for image headers, deterministic-fake stats for
    * everything else: rows whose payload carries a genuine PNG/JPEG
    * header get their true parsed dimensions in the feature vector
    * (positions 3/4); other payloads keep the byte-stat stub (the
    * audio/video codec is the remaining declared stub). */
  // half-up for non-negative values, matching SQL round() tie semantics
  private def round6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  private def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
    rows.map { r =>
      val bytes = r.content
      val n = bytes.length
      val mean = if (n == 0) 0.0 else bytes.map(_ & 0xff).sum.toDouble / n
      val variance =
        if (n == 0) 0.0 else bytes.map(b => math.pow((b & 0xff) - mean, 2)).sum / n
      val (w, h) = parseDims(bytes) match {
        case Some((_, pw, ph)) => (pw.toDouble, ph.toDouble)
        case None => (r.meta.width.toDouble, r.meta.height.toDouble)
      }
      val features = Array(n.toDouble, round6(mean), round6(variance), w, h)
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
