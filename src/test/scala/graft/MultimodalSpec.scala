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
