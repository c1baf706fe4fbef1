package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.sources.Multimodal

class MultimodalSpec extends SparkTestBase {

  private lazy val media = Multimodal.synthesize(
    Tables.load(spark, sfDir, "documents"))

  test("synthesize produces opaque binary payloads with typed metadata") {
    val r = media.filter(col("media_id") === 0).head
    assert(r.getAs[Array[Byte]]("content").nonEmpty)
    assert(r.getAs[org.apache.spark.sql.Row]("meta").getAs[Int]("sampleRate") == 16000)
  }

  test("resize reshapes every payload to width*height bytes and updates meta") {
    val out = Multimodal.resize(media, 8, 4).toDF()
    val lens = out.select(length(col("content")).as("len")).distinct().collect()
    assert(lens.map(_.getInt(0)).toSeq == Seq(32))
    assert(out.select(col("meta.width")).distinct().head.getInt(0) == 8)
  }

  // a GENUINE complete 1x1 PNG file (the canonical transparent-pixel
  // image), not constructed by the code under test
  private val realPng: Array[Byte] = java.util.Base64.getDecoder.decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg==")

  // a structurally-faithful JPEG header: SOI, standard 16-byte JFIF
  // APP0, a 67-byte DQT, then SOF0 with height=32 width=48 — the
  // parser must hop TWO variable-length segments to reach the frame
  private val realJpegHeader: Array[Byte] = {
    def hx(s: String) = s.replaceAll(" ", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray
    hx("FFD8") ++
      hx("FFE0 0010 4A46494600 0101 00 0001 0001 00 00") ++
      (hx("FFDB 0043 00") ++ Array.fill[Byte](64)(0)) ++
      hx("FFC0 0011 08 0020 0030 03 01 2200 02 1101 03 1101")
  }

  test("parseDims reads a genuine PNG file and a real JPEG marker chain") {
    assert(Multimodal.parseDims(realPng) == Some(("png", 1, 1)))
    assert(Multimodal.parseDims(realJpegHeader) == Some(("jpeg", 48, 32)))
    assert(Multimodal.parseDims("not an image".getBytes).isEmpty)
  }

  test("imageDims expression path parses the same real bytes (no UDF)") {
    import spark.implicits._
    val df = Seq((1L, realPng), (2L, realJpegHeader), (3L, "junk".getBytes))
      .toDF("media_id", "content")
    val out = Multimodal.imageDims(df).collect()
      .map(r => r.getLong(0) ->
        (Option(r.getString(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(out(1L) == ((Some("png"), Some(1), Some(1))))
    assert(out(2L) == ((Some("jpeg"), Some(48), Some(32))))
    assert(out(3L) == ((None, None, None)))
    assert(!Multimodal.imageDims(df).queryExecution.executedPlan.toString
      .toLowerCase.contains("udf"))
  }

  test("expression walker and Scala walker agree on every synthesized header") {
    val imgs = Multimodal.synthesizeImages(Tables.load(spark, sfDir, "documents"))
    val viaExpr = Multimodal.imageDims(imgs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    val viaScala = imgs.collect().map { r =>
      r.getLong(0) -> Multimodal.parseDims(r.getAs[Array[Byte]]("content")).get
    }.toMap
    assert(viaExpr == viaScala)
    assert(viaExpr.nonEmpty)
  }

  test("sampleFrames covers the full payload with no byte lost or duplicated") {
    val frames = Multimodal.sampleFrames(media, 250)
    val perDoc = frames.toDF().groupBy("media_id")
      .agg(sum(length(col("frame_bytes"))).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = media.filter(col("modality") === "video")
      .select(col("media_id"), length(col("content")).as("len")).collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(perDoc == expected)
  }
}
