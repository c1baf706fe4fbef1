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

  private def hx(s: String) = s.replaceAll(" ", "").grouped(2)
    .map(Integer.parseInt(_, 16).toByte).toArray

  // a structurally-faithful WAV: canonical RIFF/WAVE layout, PCM fmt
  // (2ch / 44100 Hz / 16-bit), an ODD-size LIST chunk (pad byte per the
  // RIFF spec) between fmt and data, data chunk declaring 88200 bytes
  // (= exactly 0.5 s at this byte rate) — not built by the code under test
  private val realWavHeader: Array[Byte] =
    hx("52494646 3A000000 57415645") ++                      // RIFF size WAVE
      hx("666D7420 10000000 0100 0200 44AC0000 10B10200 0400 1000") ++
      hx("4C495354 05000000 494E464F 41 00") ++              // LIST, odd size + pad
      hx("64617461 A8580100")                                // data, 88200 bytes

  // a structurally-faithful MP4: ftyp(isom), an odd-size free box, moov
  // holding a udta child BEFORE the v0 mvhd (timescale 600, duration
  // 1800 => 3000 ms), then an mdat header
  private val realMp4Header: Array[Byte] =
    hx("00000010 66747970 69736F6D 00000000") ++
      hx("0000000B 66726565 000000") ++
      hx("0000007D 6D6F6F76") ++
      hx("00000009 75647461 00") ++
      (hx("0000006C 6D766864 00000000 00000000 00000000 00000258 00000708") ++
        Array.fill[Byte](80)(0)) ++
      hx("00000010 6D646174 0000000000000000")

  // same movie with a VERSION 1 mvhd (64-bit times; timescale at +28,
  // duration as be64 at +32) — the batched Scala walker must handle it
  private val mp4V1Header: Array[Byte] =
    hx("00000010 66747970 69736F6D 00000000") ++
      hx("00000080 6D6F6F76") ++
      (hx("00000078 6D766864 01000000") ++ Array.fill[Byte](16)(0) ++
        hx("00000258 0000000000000708") ++ Array.fill[Byte](80)(0))

  test("parseAudioMeta walks a real RIFF chunk list incl. odd-size padding") {
    assert(Multimodal.parseAudioMeta(realWavHeader) ==
      Some(("pcm", 2, 44100, 16, 500L)))
    assert(Multimodal.parseAudioMeta("not audio at all".getBytes).isEmpty)
  }

  test("parseVideoMeta walks the box tree for v0 AND v1 mvhd layouts") {
    assert(Multimodal.parseVideoMeta(realMp4Header) ==
      Some(("isom", 600L, 1800L, 3000L)))
    assert(Multimodal.parseVideoMeta(mp4V1Header) ==
      Some(("isom", 600L, 1800L, 3000L)))
    assert(Multimodal.parseVideoMeta("junk".getBytes).isEmpty)
  }

  test("audioMeta/videoMeta expression paths parse the same real bytes, no UDF") {
    import spark.implicits._
    val adf = Seq((1L, realWavHeader), (2L, "junk".getBytes))
      .toDF("media_id", "content")
    val a = Multimodal.audioMeta(adf).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(a == Map(1L -> Some("pcm"), 2L -> None))
    val arow = Multimodal.audioMeta(adf).filter(col("media_id") === 1).head
    assert((arow.getInt(2), arow.getInt(3), arow.getInt(4), arow.getLong(5)) ==
      ((2, 44100, 16, 500L)))
    val vdf = Seq((1L, realMp4Header), (2L, "junk".getBytes))
      .toDF("media_id", "content")
    val vrow = Multimodal.videoMeta(vdf).filter(col("media_id") === 1).head
    assert((vrow.getString(1), vrow.getInt(2), vrow.getInt(3), vrow.getLong(4)) ==
      (("isom", 600, 1800, 3000L)))
    assert(!Multimodal.audioMeta(adf).queryExecution.executedPlan.toString
      .toLowerCase.contains("udf"))
    assert(!Multimodal.videoMeta(vdf).queryExecution.executedPlan.toString
      .toLowerCase.contains("udf"))
  }

  test("audio: expression walk and Scala walker agree on every synthesized WAV") {
    val wavs = Multimodal.synthesizeAudio(Tables.load(spark, sfDir, "documents"))
    val viaExpr = Multimodal.audioMeta(wavs).collect().map(r => r.getLong(0) ->
      ((r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getLong(5)))).toMap
    val viaScala = wavs.collect().map { r =>
      val (codec, ch, sr, bits, dur) =
        Multimodal.parseAudioMeta(r.getAs[Array[Byte]]("content")).get
      r.getLong(0) -> ((codec, ch, sr, bits, dur))
    }.toMap
    assert(viaExpr == viaScala)
    assert(viaExpr.nonEmpty)
  }

  test("video: expression walk and Scala walker agree on every synthesized MP4") {
    val vids = Multimodal.synthesizeVideos(Tables.load(spark, sfDir, "documents"))
    val viaExpr = Multimodal.videoMeta(vids).collect().map(r => r.getLong(0) ->
      ((r.getString(1), r.getInt(2).toLong, r.getInt(3).toLong, r.getLong(4)))).toMap
    val viaScala = vids.collect().map { r =>
      val (brand, ts, dur, durMs) =
        Multimodal.parseVideoMeta(r.getAs[Array[Byte]]("content")).get
      r.getLong(0) -> ((brand, ts, dur, durMs))
    }.toMap
    assert(viaExpr == viaScala)
    assert(viaExpr.nonEmpty)
  }

  test("PNG pixel decode inverts all five scanline filters exactly") {
    // ids 0..9 cycle the filter assignment (id + row) % 5, so every
    // filter type (None/Sub/Up/Average/Paeth) is exercised; the
    // decoded pixels must equal the planting formula byte-for-byte
    (0L to 9L).foreach { id =>
      val (w, h, px) = Multimodal.decodePng(Multimodal.buildPng(id))
        .getOrElse(fail(s"id=$id did not decode"))
      assert(w == 4 + (id % 16).toInt && h == 4 + (id * 7 % 12).toInt)
      px.zipWithIndex.foreach { case (p, i) =>
        assert((p & 0xff) == ((id * 31 + i.toLong * 97) % 256).toInt,
          s"id=$id pixel $i")
      }
    }
  }

  test("PNG decode verifies chunk CRCs: one flipped payload bit rejects") {
    val good = Multimodal.buildPng(7L)
    assert(Multimodal.decodePng(good).isDefined)
    val bad = good.clone()
    bad(41) = (bad(41) ^ 1).toByte // inside the IDAT payload
    assert(Multimodal.decodePng(bad).isEmpty,
      "corrupt IDAT must fail the CRC check, not decode garbage")
  }

  test("PNG decode concatenates split IDAT streams (spec allows many)") {
    // rebuild id=3's file with its single IDAT split into two chunks —
    // a common layout from real encoders; the inflate must span both
    val one = Multimodal.buildPng(3L)
    def be32(b: Array[Byte], i: Int) = ((b(i) & 0xff) << 24) |
      ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
    val ihdrEnd = 8 + 12 + 13
    val idatLen = be32(one, ihdrEnd)
    val payload = one.slice(ihdrEnd + 8, ihdrEnd + 8 + idatLen)
    val (p1, p2) = payload.splitAt(payload.length / 2)
    def chunk(typ: String, pay: Array[Byte]): Array[Byte] = {
      val t = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32(); crc.update(t); crc.update(pay)
      def enc(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      enc(pay.length.toLong) ++ t ++ pay ++ enc(crc.getValue)
    }
    val split = one.slice(0, ihdrEnd) ++ chunk("IDAT", p1) ++
      chunk("IDAT", p2) ++ chunk("IEND", Array.empty[Byte])
    def structural(r: Option[(Int, Int, Array[Byte])]) =
      r.map { case (w, h, px) => (w, h, px.toSeq) }
    assert(structural(Multimodal.decodePng(split)) ==
      structural(Multimodal.decodePng(one)))
  }

  test("PCM decode returns the exact planted samples; stats replay the formula") {
    (0L to 9L).foreach { id =>
      val (sr, s) = Multimodal.decodePcm(Multimodal.buildPcmWav(id))
        .getOrElse(fail(s"id=$id did not decode"))
      assert(sr == 8000 * (1 + id % 6).toInt)
      assert(s.length == 64 + (id % 100).toInt)
      s.zipWithIndex.foreach { case (v, j) =>
        assert(v == (((id * 2654435761L + j.toLong * 40503L) % 65536) - 32768).toInt,
          s"id=$id sample $j")
      }
    }
  }

  test("PCM decode handles 8-bit unsigned and 24-bit signed layouts") {
    def wav(bits: Int, payload: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def ascii(s: String) = out.write(s.getBytes("US-ASCII"))
      def le(v: Long, n: Int) =
        (0 until n).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
      ascii("RIFF"); le(36L + payload.length, 4); ascii("WAVE")
      ascii("fmt "); le(16, 4); le(1, 2); le(1, 2); le(8000, 4)
      le(8000L * bits / 8, 4); le(bits / 8, 2); le(bits.toLong, 2)
      ascii("data"); le(payload.length.toLong, 4); out.write(payload)
      out.toByteArray
    }
    // 8-bit: unsigned with 128 midpoint -> centered values
    val (_, s8) = Multimodal.decodePcm(
      wav(8, Array[Byte](0, 127.toByte, 128.toByte, 255.toByte))).get
    assert(s8.toSeq == Seq(-128, -1, 0, 127))
    // 24-bit: LE two's-complement; 0x800000 is the most negative value
    val (_, s24) = Multimodal.decodePcm(wav(24, Array[Byte](
      0x01, 0x00, 0x00,                            // 1
      0xff.toByte, 0xff.toByte, 0xff.toByte,       // -1
      0x00, 0x00, 0x80.toByte))).get               // -8388608
    assert(s24.toSeq == Seq(1, -1, -8388608))
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

  // planted per-8x8-tile formula, restated independently of the builder
  private def tileVal(id: Long, k: Int, x: Int, y: Int): Int =
    ((id * 31 + k * 41 + (x / 8) * 13 + (y / 8) * 7) % 256).toInt

  test("JPEG pixel decode round-trips the planted tiles exactly (JDK codec)") {
    (0L to 19L).foreach { id =>
      val (w, h, px) = Multimodal.decodeJpeg(Multimodal.buildJpeg(id))
        .getOrElse(fail(s"id=$id did not decode"))
      assert(w == 8 + (id % 24).toInt && h == 8 + (id * 5 % 16).toInt)
      for (y <- 0 until h; x <- 0 until w)
        assert(px(y * w + x) == tileVal(id, 0, x, y), s"id=$id pixel ($x,$y)")
    }
  }

  test("JPEG decode rejects truncated and non-JPEG input instead of throwing") {
    val good = Multimodal.buildJpeg(5L)
    assert(Multimodal.decodeJpeg(good).isDefined)
    assert(Multimodal.decodeJpeg(good.dropRight(good.length / 2)).isEmpty)
    assert(Multimodal.decodeJpeg(Multimodal.buildPng(5L)).isEmpty,
      "a PNG must not pass the JPEG path")
  }

  test("MJPEG demux walks the sample table; every frame decodes to its formula") {
    (0L to 9L).foreach { id =>
      val frames = Multimodal.decodeMjpeg(Multimodal.buildMjpegMp4(id))
        .getOrElse(fail(s"id=$id did not demux"))
      assert(frames.length == 1 + (id % 5).toInt)
      frames.foreach { case (k, w, h, px) =>
        assert(w == 8 + (id % 24).toInt && h == 8 + (id * 5 % 16).toInt)
        for (y <- 0 until h; x <- 0 until w)
          assert(px(y * w + x) == tileVal(id, k, x, y), s"id=$id frame $k ($x,$y)")
      }
    }
  }

  test("extractFeatures decodes REAL payloads for real: pixel stats, not byte stats") {
    import spark.implicits._
    val rows = (0L to 4L).map(id => Multimodal.MediaRow(
      id, "image", Multimodal.buildPng(id),
      Multimodal.MediaMeta(0, 0, 0, 0))) ++
      (5L to 9L).map(id => Multimodal.MediaRow(
        id, "image", Multimodal.buildJpeg(id),
        Multimodal.MediaMeta(0, 0, 0, 0)))
    val collected = Multimodal.extractFeatures(rows.toDF()).collect()
    val feats = collected.map(f => f.media_id -> f.features).toMap
    rows.foreach { r =>
      val (w, h, px) =
        (Multimodal.decodePng(r.content).map { case (a, b, p) => (a, b, p.map(_ & 0xff)) }
          orElse Multimodal.decodeJpeg(r.content)).get
      val f = feats(r.media_id)
      val mean = px.map(_.toDouble).sum / px.length
      assert(f(3) == w && f(4) == h, s"id=${r.media_id} dims")
      assert(math.abs(f(1) - mean) < 1e-6,
        s"id=${r.media_id}: feature mean ${f(1)} != true pixel mean $mean — " +
          "byte stats leaked into a decodable payload")
    }
    // the honesty marker: every fully-decoded payload says so
    assert(collected.forall(_.decode_status == "decoded"))
  }

  test("decode_status marks stub features explicitly (codec_unsupported)") {
    import spark.implicits._
    // an opaque payload no decoder in this build can open (stands in
    // for an inter-frame-coded video body) must carry the explicit
    // codec_unsupported marker, never silently pass off byte stats
    val opaque = Multimodal.MediaRow(1L, "video",
      Array.tabulate[Byte](256)(i => (i * 37 % 251).toByte),
      Multimodal.MediaMeta(640, 360, 4000, 0))
    // a bare PNG signature + IHDR (32x16) with no body: header parses,
    // pixel decode cannot succeed
    val pngHeaderBytes = ("89504E470D0A1A0A" + "0000000D" + "49484452" +
      "00000020" + "00000010" + "0806000000" + "00000000")
      .grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val headerOnly = Multimodal.MediaRow(2L, "image", pngHeaderBytes,
      Multimodal.MediaMeta(0, 0, 0, 0))
    val out = Multimodal.extractFeatures(Seq(opaque, headerOnly).toDF())
      .collect().map(f => f.media_id -> f.decode_status).toMap
    assert(out(1L) == "codec_unsupported")
    assert(out(2L) == "header_dims")
  }

  test("MJPEG demux refuses a corrupted sample table (no garbage rows)") {
    val good = Multimodal.buildMjpegMp4(7L) // 3 frames
    assert(Multimodal.decodeMjpeg(good).isDefined)
    // find stsz and inflate frame 0's recorded size so the slice walks
    // into frame 1's bytes — the demuxer must reject, not emit garbage
    val pat = "stsz".getBytes("US-ASCII")
    val stsz = good.indices.indexWhere(i =>
      i + 4 <= good.length && pat.indices.forall(j => good(i + j) == pat(j)))
    assert(stsz > 0)
    // `stsz` here is the TYPE position (box start + 4): entries begin
    // at +16 from it; inflate frame 0's recorded size so the slice
    // overruns the mdat
    val bad = good.clone()
    bad(stsz + 16) = (bad(stsz + 16) | 0x40).toByte
    assert(Multimodal.decodeMjpeg(bad).isEmpty)
    // and a lying sample_count must reject, not read out of bounds
    val bad2 = good.clone()
    bad2(stsz + 12 + 2) = (bad2(stsz + 12 + 2) | 0x40).toByte
    assert(Multimodal.decodeMjpeg(bad2).isEmpty)
  }

  test("MJPEG demux rejects a 32-bit box size instead of crashing the task") {
    // a top-level box claiming size 0xFFFFFFFF: the unsigned Long
    // passes `sz < 8` but truncates to -1 through toInt — the walker
    // must return None, not throw ArrayIndexOutOfBounds (the
    // docstring's contract: half-broken file -> no rows)
    val good = Multimodal.buildMjpegMp4(3L)
    val bad = good.clone()
    // ftyp box size field is bytes 0..3; set to 0xFFFFFFFF so the walk
    // to find moov advances by the lying size
    bad(0) = 0xff.toByte; bad(1) = 0xff.toByte
    bad(2) = 0xff.toByte; bad(3) = 0xff.toByte
    assert(Multimodal.decodeMjpeg(bad).isEmpty) // and no exception
  }

  test("imageAHash collapses brightness variants and separates distinct images") {
    import spark.implicits._
    val docs = (0L until 24L).toDF("doc_id")
    val out = Multimodal.imageAHash(Multimodal.synthesizePngVariants(docs))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(4), r.getSeq[Int](5)))).toMap
    // provable invariance: every planted base/bright pair shares BOTH
    // the hash and the brightness-normalized verification thumb
    (0L until 24L).foreach { id =>
      assert(out(id -> "base") == out(id -> "bright"), s"id $id")
    }
    // and the key is discriminative, not constant: the 24 distinct
    // formula images don't all land on one value
    assert(out.values.toSet.size > 8)
  }

  test("imageAHash bit rule matches a hand computation on a planted 4x4 image") {
    import spark.implicits._
    // one flat-dark quadrant in an otherwise bright image: exactly the
    // cells of that quadrant drop below the mean
    val w = 8; val h = 8
    val px = Array.tabulate(h, w)((r, c) => if (r < 4 && c < 4) 10 else 200)
    // grid=4 on 8x8: cell (cy,cx) covers 2x2 pixels; cells with cy<2
    // and cx<2 are the dark ones -> bits 0,1,4,5 clear, others set
    val bytes = pngBytesOf(px)
    val media = Seq((7L, "base", bytes)).toDF("media_id", "kind", "content")
    val got = Multimodal.imageAHash(media).collect().head.getLong(4)
    val want = (0 until 16).filter(c => !(Set(0, 1, 4, 5) contains c))
      .map(1L << _).sum
    assert(got == want, s"got ${got.toBinaryString}, want ${want.toBinaryString}")
  }

  test("resizeImages pools the hand-made quadrant image exactly") {
    import spark.implicits._
    // 8x8 image, dark 4x4 quadrant of 10s in a field of 200s; 4x4
    // thumbnail cells cover 2x2 pixels -> cells (0,0),(0,1),(1,0),(1,1)
    // average 10, every other cell 200
    val px = Array.tabulate(8, 8)((r, c) => if (r < 4 && c < 4) 10 else 200)
    val media = Seq((9L, pngBytesOf(px))).toDF("media_id", "content")
    val got = Multimodal.resizeImages(media).collect().head
    assert((got.getInt(1), got.getInt(2), got.getInt(3), got.getInt(4)) == (8, 8, 4, 4))
    val thumb = got.getSeq[Int](5)
    val want = (0 until 16).map(c => if (Set(0, 1, 4, 5) contains c) 10 else 200)
    assert(thumb == want, s"thumb $thumb")
  }

  test("resizeImages floor-divides uneven cells (5x5 onto 4x4)") {
    import spark.implicits._
    // 5x5 all-ones except a single 255 at (0,0); cell (0,0) covers
    // source pixels with y*4/5==0 and x*4/5==0 -> (0,0) and (0,1),(1,0),(1,1)
    // i.e. 2x2 block -> mean floor((255+3)/4)=64; all other cells stay 1
    val px = Array.tabulate(5, 5)((r, c) => if (r == 0 && c == 0) 255 else 1)
    val media = Seq((11L, pngBytesOf(px))).toDF("media_id", "content")
    val thumb = Multimodal.resizeImages(media).collect().head.getSeq[Int](5)
    assert(thumb.head == 64 && thumb.tail.forall(_ == 1), s"thumb $thumb")
  }

  test("audioFingerprint collapses gain variants and separates distinct clips") {
    import spark.implicits._
    val docs = (0L until 24L).toDF("doc_id")
    val out = Multimodal.audioFingerprint(Multimodal.synthesizeWavVariants(docs))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(4), r.getSeq[Long](5)))).toMap
    // fingerprint AND gain-normalized energy profile both collapse
    (0L until 24L).foreach { id =>
      assert(out(id -> "base") == out(id -> "loud"), s"id $id")
    }
    assert(out.values.toSet.size > 8)
  }

  test("audioFingerprint bit rule matches a hand computation") {
    import spark.implicits._
    // 32 samples, frames=16 -> 2 samples per frame; one loud frame
    // (samples 4,5 = +-1000) in an otherwise quiet (+-10) clip:
    // only frame 2's energy clears the clip mean
    val samples = Array.tabulate(32)(j =>
      if (j == 4) 1000 else if (j == 5) -1000 else if (j % 2 == 0) 10 else -10)
    val bytes = wavBytesOf(samples)
    val media = Seq((3L, "base", bytes)).toDF("media_id", "kind", "content")
    val got = Multimodal.audioFingerprint(media).collect().head.getLong(4)
    assert(got == (1L << 2), s"got ${got.toBinaryString}")
  }

  test("below-resolution inputs skip cleanly: no divide-by-zero rows") {
    import spark.implicits._
    // a valid 3x3 PNG is smaller than the 4x4 grid -> no row, no crash
    val tiny = pngBytesOf(Array.tabulate(3, 3)((_, _) => 100))
    assert(Multimodal.imageAHash(
      Seq((1L, "base", tiny)).toDF("media_id", "kind", "content")).count() == 0)
    assert(Multimodal.resizeImages(
      Seq((1L, tiny)).toDF("media_id", "content")).count() == 0)
    // a valid 8-sample WAV is shorter than 16 frames -> no row
    val short = wavBytesOf(Array.tabulate(8)(j => j * 100))
    assert(Multimodal.audioFingerprint(
      Seq((1L, "base", short)).toDF("media_id", "kind", "content")).count() == 0)
  }

  /** Minimal valid 16-bit mono WAV with caller-chosen samples (the
    * production builders only cover the formula corpus). */
  private def wavBytesOf(samples: Array[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def le(v: Long, bytes: Int): Unit =
      (0 until bytes).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
    val dataLen = samples.length * 2
    ascii("RIFF"); le(36L + dataLen, 4); ascii("WAVE")
    ascii("fmt "); le(16, 4); le(1, 2); le(1, 2)
    le(8000L, 4); le(16000L, 4); le(2, 2); le(16, 2)
    ascii("data"); le(dataLen.toLong, 4)
    samples.foreach(v => le(v.toLong & 0xffff, 2))
    out.toByteArray
  }

  /** Minimal valid grayscale PNG via the production encoder path
    * (buildPngShifted covers only the formula corpus, so encode a
    * custom pixel grid through ImageIO for the fixture). */
  private def pngBytesOf(px: Array[Array[Int]]): Array[Byte] = {
    val h = px.length; val w = px(0).length
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (r <- 0 until h; c <- 0 until w)
      img.getRaster.setSample(c, r, 0, px(r)(c))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
}
