package graft

import org.apache.spark.sql.functions._
import graft.sources.Warc

/** Hand-written WARC fixtures the synthesizer never emits — pins the
  * length-framed walk and the broken-file no-row contract. */
class WarcSpec extends SparkTestBase {

  private def rec(typ: String, uri: Option[String], payload: String): String =
    "WARC/1.0\r\n" +
      s"WARC-Type: $typ\r\n" +
      uri.map(u => s"WARC-Target-URI: $u\r\n").getOrElse("") +
      "WARC-Date: 2026-02-01T00:00:00Z\r\n" +
      s"Content-Length: ${payload.getBytes("ISO-8859-1").length}\r\n" +
      "\r\n" + payload + "\r\n\r\n"

  private def parse(files: (Long, String)*) = {
    import spark.implicits._
    Warc.records(files.toSeq.toDF("file_id", "raw")
      .select(col("file_id"), encode(col("raw"), "ISO-8859-1").as("content")))
  }

  test("payload containing the record magic must not desync the walk") {
    val decoy = "see WARC/1.0\r\n\r\nWARC-Type: fake\r\n\r\n inside prose"
    val out = parse(1L -> (rec("response", Some("http://a/1"), decoy) +
        rec("response", Some("http://a/2"), "tail")))
      .select("rec_idx", "target_uri", "payload").collect()
    assert(out.length == 2)
    assert(new String(out(0).getAs[Array[Byte]]("payload"), "ISO-8859-1")
      == decoy)
    assert(out(1).getAs[String]("target_uri") == "http://a/2")
  }

  test("broken files yield no rows: truncation, length lies, bad magic, trailing bytes") {
    val good = rec("response", Some("http://b/1"), "hello world")
    val cases = Seq(
      2L -> good.dropRight(3),                   // truncated terminator
      3L -> good.replace("Content-Length: 11", "Content-Length: 13"),
      4L -> good.replace("Content-Length: 11", "Content-Length: 9"),
      5L -> ("HTTP/1.1 200 OK\r\n\r\n" + good),  // doesn't start at magic
      6L -> (good + "junk"),                     // trailing bytes
      7L -> good.replace("Content-Length: 11\r\n", ""), // no length header
      8L -> "",                                  // empty file
      9L -> good)                                // control: stays parseable
    val out = parse(cases: _*).select("file_id").collect().map(_.getLong(0))
    assert(out.toSeq == Seq(9L), s"only the control row may survive: ${out.toSeq}")
  }

  test("maxRecords bounds the walk: one-over rejects the file, not half-reads it") {
    val three = (1 to 3).map(i =>
      rec("response", Some(s"http://c/$i"), s"p$i")).mkString
    assert(parse(1L -> three).count() == 3)
    import spark.implicits._
    val df = Seq(1L -> three).toDF("file_id", "raw")
      .select(col("file_id"), encode(col("raw"), "ISO-8859-1").as("content"))
    assert(Warc.records(df, maxRecords = 2).count() == 0)
  }

  test("case-insensitive headers; missing target-uri reads as empty") {
    val raw = "warc/1.0"
    // header NAMES are case-insensitive per spec; the magic is not
    val lower = rec("metadata", None, "x")
      .replace("WARC-Type", "warc-type")
      .replace("Content-Length", "content-length")
    val out = parse(1L -> lower)
      .select("rec_type", "target_uri", "content_length").collect()
    assert(out.length == 1)
    assert(out(0).getString(0) == "metadata")
    assert(out(0).getString(1) == "")
    assert(out(0).getLong(2) == 1L)
    assert(parse(2L -> rec("x", None, "y").replace("WARC/1.0", raw)).count() == 0)
  }

  test("synthesizeWarc round-trip: corrupt plant rejected, clean files yield 2 records") {
    import spark.implicits._
    val docs = Seq((0L, "zero doc"), (1L, "one doc"), (50L, "fifty doc"))
      .toDF("doc_id", "text")
    val out = Warc.records(Warc.synthesizeWarc(docs))
    // 0 and 50 are % 50 == 0 -> corrupted -> rejected
    assert(out.select("file_id").distinct().collect().map(_.getLong(0)).toSet
      == Set(1L))
    val resp = out.filter(col("rec_type") === "response").head
    assert(new String(resp.getAs[Array[Byte]]("payload"), "ISO-8859-1")
      == "one doc")
    assert(resp.getAs[String]("target_uri") == "http://site1.example/page/1")
  }

  // --- gzip member walk (.warc.gz) ---

  private def gz(data: Array[Byte], mtime: Boolean = false,
                 fname: Option[String] = None): Array[Byte] = {
    // a WRITER richer than the repo's own (MTIME, FNAME): the reader
    // must handle members other tools produce, not just its own
    val bos = new java.io.ByteArrayOutputStream()
    val flg = if (fname.isDefined) 8 else 0
    bos.write(Array[Byte](0x1f, 0x8b.toByte, 8, flg.toByte,
      if (mtime) 1 else 0, 0, 0, 0, 0, 3))
    fname.foreach { n => bos.write(n.getBytes("US-ASCII")); bos.write(0) }
    val d = new java.util.zip.Deflater(6, true)
    d.setInput(data); d.finish()
    val buf = new Array[Byte](8192)
    while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
    d.end()
    val crc = new java.util.zip.CRC32(); crc.update(data)
    def le32(v: Long): Unit = (0 to 3).foreach(i =>
      bos.write(((v >> (8 * i)) & 0xff).toInt))
    le32(crc.getValue); le32(data.length.toLong)
    bos.toByteArray
  }

  private def parseGz(files: (Long, Array[Byte])*) = {
    import spark.implicits._
    Warc.gzRecords(files.toSeq.toDF("file_id", "content"))
  }

  test("gz member walk: per-record members with optional header fields round-trip") {
    val r1 = rec("response", Some("http://g/1"), "first").getBytes("ISO-8859-1")
    val r2 = rec("response", Some("http://g/2"), "second").getBytes("ISO-8859-1")
    val out = parseGz(1L -> (gz(r1, mtime = true, fname = Some("r1.warc")) ++ gz(r2)))
      .select("rec_idx", "target_uri", "payload").collect()
    assert(out.length == 2)
    assert(new String(out(0).getAs[Array[Byte]]("payload"), "ISO-8859-1") == "first")
    assert(out(1).getAs[String]("target_uri") == "http://g/2")
  }

  test("gz broken members erase the whole file: bad CRC, bad ISIZE, truncation, garbage") {
    val r = rec("response", Some("http://g/1"), "payload x").getBytes("ISO-8859-1")
    val good = gz(r) ++ gz(r)
    def mut(b: Array[Byte])(f: Array[Byte] => Unit): Array[Byte] = {
      val c = b.clone(); f(c); c
    }
    val cases = Seq(
      2L -> mut(good)(b => b(b.length - 6) = (b(b.length - 6) ^ 1).toByte), // ISIZE
      3L -> mut(good)(b => b(b.length - 10) = (b(b.length - 10) ^ 1).toByte), // CRC
      4L -> good.dropRight(5),                          // truncated trailer
      5L -> (good ++ Array[Byte](1, 2, 3)),             // trailing garbage
      6L -> mut(good)(b => b(0) = 0x1e),                // bad magic
      7L -> Array.empty[Byte],                          // empty file
      8L -> good)                                       // control
    val out = parseGz(cases: _*).select("file_id").collect().map(_.getLong(0))
    assert(out.toSet == Set(8L), s"only the control may survive: ${out.toSeq}")
  }

  test("gz fused walk ≡ two-pass walk: kept members are byte-identical, budget overflow falls back") {
    // round 18: walkMembers inflates once and KEEPS the members under
    // the retention budget (pass 2 never re-inflates). The fused and
    // strict paths must produce identical members, and a budget
    // overflow must drop the kept prefix (two-pass takes over) without
    // changing verification outcomes.
    val r1 = rec("response", Some("http://g/1"), "alpha " * 50).getBytes("ISO-8859-1")
    val r2 = rec("response", Some("http://g/2"), "beta " * 80).getBytes("ISO-8859-1")
    val file = gz(r1) ++ gz(r2)
    val Some((offsA, Some(kept))) = Warc.walkMembers(file, 1L << 20)
    val Some((offsB, none)) = Warc.walkMembers(file, 0L)
    assert(none.isEmpty, "budget 0 must force the two-pass path")
    assert(offsA == offsB)
    val twoPass = offsB.map { case (p, l) => Warc.inflateMember(file, p, l) }
    assert(kept.length == 2 && twoPass.length == 2)
    kept.zip(twoPass).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b), "fused member differs from two-pass")
    }
    assert(java.util.Arrays.equals(kept(0), r1))
    // budget smaller than the decompressed total: overflow mid-walk →
    // offsets still complete, members dropped
    val Some((offsC, keptC)) = Warc.walkMembers(file, r1.length + 3L)
    assert(offsC == offsA && keptC.isEmpty)
    // corruption outcomes are unchanged on the fused path
    val bad = file.clone(); bad(bad.length - 10) = (bad(bad.length - 10) ^ 1).toByte
    assert(Warc.walkMembers(bad, 1L << 20).isEmpty)
  }

  test("gz payload desync still caught one layer up: framing lie inside a valid member") {
    // members verify (CRC fine) but the DECOMPRESSED framing lies —
    // the record fold's contract must still reject the file
    val lie = rec("response", Some("http://g/1"), "abc")
      .replace("Content-Length: 3", "Content-Length: 5").getBytes("ISO-8859-1")
    assert(parseGz(1L -> gz(lie)).count() == 0)
  }

  test("gz member granularity: a record-framing lie erases its MEMBER, not the file") {
    // codec layer clean (all CRCs verify) but member 1's record lies
    // about its length — under the record-at-a-time convention the
    // member is the corruption unit: members 0 and 2 must survive
    // with their member indices as rec_idx
    val r1 = rec("response", Some("http://m/1"), "aa").getBytes("ISO-8859-1")
    val lie = rec("response", Some("http://m/2"), "bb")
      .replace("Content-Length: 2", "Content-Length: 4").getBytes("ISO-8859-1")
    val r3 = rec("response", Some("http://m/3"), "cc").getBytes("ISO-8859-1")
    val out = parseGz(1L -> (gz(r1) ++ gz(lie) ++ gz(r3)))
      .select("rec_idx", "target_uri").collect().sortBy(_.getInt(0))
    assert(out.map(r => (r.getInt(0), r.getString(1))).toSeq
      == Seq(0 -> "http://m/1", 2 -> "http://m/3"))
    // two records packed into ONE member violate the strict
    // record-at-a-time convention — that member is erased alone
    val packed = gz(r1 ++ r3)
    val out2 = parseGz(2L -> (packed ++ gz(r1)))
      .select("rec_idx", "target_uri").collect()
    assert(out2.map(r => (r.getInt(0), r.getString(1))).toSeq
      == Seq(1 -> "http://m/1"))
  }

  test("gz segment scale: member count far beyond any fold cap, corrupt member mid-file") {
    // 3000 members in ONE file — the whole-file fold capped record
    // count at maxRecords (8); the per-member walk must be unbounded
    val n = 3000
    val members = new java.io.ByteArrayOutputStream()
    (0 until n).foreach { i =>
      members.write(gz(
        rec("response", Some(s"http://big/$i"), s"payload $i")
          .getBytes("ISO-8859-1")))
    }
    val whole = members.toByteArray
    val out = parseGz(1L -> whole)
      .select("rec_idx", "target_uri").collect().sortBy(_.getInt(0))
    assert(out.length == n)
    assert(out(0).getString(1) == "http://big/0")
    assert(out(n - 1).getString(1) == s"http://big/${n - 1}")
    assert(out.map(_.getInt(0)).toSeq == (0 until n))
    // one flipped CRC byte mid-file (member ~n/2) — codec-layer
    // corruption, so the WHOLE file must vanish, never a prefix
    val corrupt = whole.clone()
    val half = (0 until n / 2).map(i => gz(
      rec("response", Some(s"http://big/$i"), s"payload $i")
        .getBytes("ISO-8859-1")).length).sum
    corrupt(half - 6) = (corrupt(half - 6) ^ 0x5a).toByte
    assert(parseGz(2L -> corrupt).count() == 0)
  }

  test("plain segment scale: thousands of records in one uncompressed file; " +
      "a mid-file framing lie erases the whole file") {
    // the typed per-record scan must walk record counts the old SQL
    // fold (O(records²) array_append, whole-file latin-1 copy) capped
    // at single digits
    val n = 3000
    val whole = (0 until n).map(i =>
      rec("response", Some(s"http://plain/$i"), s"payload $i")).mkString
    import spark.implicits._
    def df(id: Long, raw: String) = Seq(id -> raw).toDF("file_id", "raw")
      .select(col("file_id"), encode(col("raw"), "ISO-8859-1").as("content"))
    val out = Warc.records(df(1L, whole), maxRecords = n)
      .select("rec_idx", "target_uri").collect().sortBy(_.getInt(0))
    assert(out.length == n)
    assert(out(0).getString(1) == "http://plain/0")
    assert(out(n - 1).getString(1) == s"http://plain/${n - 1}")
    assert(out.map(_.getInt(0)).toSeq == (0 until n))
    // a Content-Length lie in record ~n/2: no member boundary isolates
    // it on the plain path, so the WHOLE file vanishes — not a prefix
    val lied = whole.replaceFirst(
      s"Content-Length: ${s"payload ${n / 2}".length}\r\n\r\npayload ${n / 2}",
      s"Content-Length: ${s"payload ${n / 2}".length + 3}\r\n\r\npayload ${n / 2}")
    assert(lied != whole, "the corruption plant must land")
    assert(Warc.records(df(2L, lied), maxRecords = n).count() == 0)
  }

  test("synthesizeWarcSegmentPlain: grouped planting round-trips; corrupt file erased whole") {
    import spark.implicits._
    val docs = (0L until 40L).map(i => (i, s"doc text $i"))
      .toDF("doc_id", "text")
    val out = Warc.records(
        Warc.synthesizeWarcSegmentPlain(docs, recordsPerFile = 10,
          corruptEvery = 3),
        maxRecords = 11)
      .select("file_id", "rec_idx", "rec_type", "target_uri").collect()
    // files 0 and 3 corrupt (fid%3==0): 2 of 4 files survive whole —
    // 10 responses + 1 warcinfo each
    val byFile = out.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(byFile == Map(1L -> 11, 2L -> 11), s"$byFile")
    assert(out.filter(_.getLong(0) == 1L).sortBy(_.getInt(1)).map(
      _.getString(2)).toSeq == "warcinfo" +: Seq.fill(10)("response"))
    assert(out.find(r => r.getLong(0) == 1L && r.getInt(1) == 1).get
      .getString(3) == "http://site3.example/page/10")
  }

  test("synthesizeWarcGzSegment: grouped planting round-trips; corrupt file erased whole") {
    import spark.implicits._
    val docs = (0L until 10L).map(i => (i, s"doc text $i"))
      .toDF("doc_id", "text")
    val out = Warc.gzRecords(
      Warc.synthesizeWarcGzSegment(docs, recordsPerFile = 5, corruptEvery = 2))
    // file 0 (docs 0-4) is corrupt mid-file -> erased whole;
    // file 1 (docs 5-9): warcinfo at rec_idx 0 then 5 responses
    assert(out.select("file_id").distinct().collect().map(_.getLong(0)).toSeq
      == Seq(1L))
    val rows = out.orderBy("rec_idx").collect()
    assert(rows.length == 6)
    assert(rows(0).getAs[String]("rec_type") == "warcinfo")
    assert(new String(rows(0).getAs[Array[Byte]]("payload"), "ISO-8859-1")
      == "software: graft-1\r\n")
    assert(rows.drop(1).map(_.getAs[String]("target_uri")).toSeq
      == (5 to 9).map(i => s"http://site${i % 7}.example/page/$i"))
  }

  test("gzRecordsFromFiles: real .warc.gz files on disk walk via the binaryFile source") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("warc_files")
    val r1 = rec("response", Some("http://f/1"), "first file")
      .getBytes("ISO-8859-1")
    val r2 = rec("response", Some("http://f/2"), "second file")
      .getBytes("ISO-8859-1")
    val bad = rec("response", Some("http://f/3"), "broken")
      .getBytes("ISO-8859-1")
    Files.write(dir.resolve("seg-00001.warc.gz"), gz(r1) ++ gz(r2))
    val corrupt = gz(bad)
    corrupt(corrupt.length - 6) = (corrupt(corrupt.length - 6) ^ 1).toByte
    Files.write(dir.resolve("seg-00002.warc.gz"), corrupt)
    Files.write(dir.resolve("notes.txt"), "not a segment".getBytes) // filtered
    val out = Warc.gzRecordsFromFiles(spark, dir.toString)
      .select(col("path"), col("rec_idx"), col("target_uri")).collect()
      .map(r => (r.getString(0).split('/').last, r.getInt(1), r.getString(2)))
      .sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(
      ("seg-00001.warc.gz", 0, "http://f/1"),
      ("seg-00001.warc.gz", 1, "http://f/2")), s"${out.toSeq}")
    out.foreach(_ => ()) // corrupt segment contributed nothing
    dir.toFile.listFiles.foreach(_.delete()); Files.delete(dir)
  }

  test("synthesizeWarcGz round-trip matches the uncompressed planting; corrupt plant rejected") {
    import spark.implicits._
    val docs = Seq((0L, "zero doc"), (1L, "one doc"), (2L, "two doc"))
      .toDF("doc_id", "text")
    def proj(df: org.apache.spark.sql.DataFrame) =
      df.select(col("file_id"), col("rec_idx"), col("rec_type"),
        col("target_uri"), col("warc_date"), col("content_length"),
        decode(col("payload"), "ISO-8859-1").as("payload_text"))
    val gzOut = proj(Warc.gzRecords(Warc.synthesizeWarcGz(docs)))
    val plainOut = proj(Warc.records(Warc.synthesizeWarc(docs)))
    assert(gzOut.collect().map(_.toString).sorted.toSeq
      == plainOut.collect().map(_.toString).sorted.toSeq)
    assert(gzOut.select("file_id").distinct().collect().map(_.getLong(0)).toSet
      == Set(1L, 2L)) // 0 is the planted corrupt member
  }

  // -- HTTP response envelope ------------------------------------

  /** One single-record WARC file whose response payload is `http`
    * (raw envelope bytes), WARC Content-Type `application/http;
    * msgtype=response`. */
  private def envFile(http: Array[Byte],
                      uri: String = "http://e.example/p"): Array[Byte] = {
    val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
    (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
      "WARC-Date: 2026-01-01T00:00:00Z\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes(latin1) ++
      http ++ "\r\n\r\n".getBytes(latin1)
  }

  private def httpBytes(status: String, headers: String,
                        body: Array[Byte]): Array[Byte] = {
    val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
    (status + "\r\n" + headers + "\r\n").getBytes(latin1) ++ body
  }

  test("http envelope: status/mime/charset split; body excludes the headers") {
    import spark.implicits._
    val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
    val body = "<html><body>ok</body></html>".getBytes(latin1)
    val f = envFile(httpBytes("HTTP/1.1 200 OK",
      "Content-Type: text/html; charset=UTF-8\r\nServer: x\r\n", body))
    val out = Warc.httpResponses(
        Warc.records(Seq((1L, f)).toDF("file_id", "content")))
      .select(col("http_status"), col("mime"), col("http_charset"),
        decode(col("body"), "ISO-8859-1").as("b")).collect()
    assert(out.length == 1)
    assert(out(0).getInt(0) == 200 && out(0).getString(1) == "text/html" &&
      out(0).getString(2) == "utf-8" &&
      out(0).getString(3) == "<html><body>ok</body></html>", s"${out(0)}")
  }

  test("http envelope: non-200, absent Content-Type, malformed status line, " +
      "missing header terminator, bare payload passthrough") {
    import spark.implicits._
    val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
    val rows = Seq(
      1L -> envFile(httpBytes("HTTP/1.1 301 Moved Permanently",
        "Location: http://e.example/q\r\n", "moved".getBytes(latin1))),
      2L -> envFile(httpBytes("HTTP/1.0 200 OK", "", "noct".getBytes(latin1))),
      3L -> envFile("NOT-HTTP garbage\r\n\r\nx".getBytes(latin1)),
      4L -> envFile("HTTP/1.1 200 OK\r\nno terminator ever".getBytes(latin1)))
    val out = Warc.httpResponses(
        Warc.records(rows.toDF("file_id", "content")))
      .select(col("file_id"), col("http_status"), col("mime"),
        decode(col("body"), "ISO-8859-1").as("b"))
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1 else r.getInt(1)), r.getString(2),
          if (r.isNullAt(3)) null else r.getString(3))).toMap
    assert(out(1L) == ((301, "", "moved"))) // Location-only: mime absent = ''
    assert(out(2L) == ((200, "", "noct")))
    val loc = Warc.httpResponses(Warc.records(rows.toDF("file_id", "content")))
      .select(col("file_id"), col("http_location")).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(loc(1L) == "http://e.example/q" && loc(2L) == "")
    assert(out(3L)._1 == -1 && out(3L)._3 == null) // malformed: null status+body
    assert(out(4L)._1 == -1 && out(4L)._3 == null)
    // a BARE payload (no application/http WARC type) passes through
    val bare = Warc.httpResponses(
        Warc.records(Warc.synthesizeWarc(
          Seq((1L, "plain body")).toDF("doc_id", "text"))))
      .filter(col("rec_type") === "response")
      .select(col("http_status"), col("mime"),
        decode(col("body"), "ISO-8859-1").as("b")).collect()
    assert(bare.length == 1 && bare(0).isNullAt(0) && bare(0).isNullAt(1) &&
      bare(0).getString(2) == "plain body")
  }

  test("gatedPages over enveloped segments: only 200 html survives; entity " +
      "bytes decode under the sniffed charset") {
    import spark.implicits._
    // doc_id 0..19 (+ a text/plain 200 at id 5 via %11): statuses by
    // %10 → 3,13 are 404; 7,17 are 301; 9,19 are 503
    val docs = spark.range(20).select(col("id").as("doc_id"),
      concat(lit("<html><body>D"), col("id").cast("string"),
        lit("</body></html>")).as("text"))
    val policy = graft.operators.UrlNormalize.robotsPolicy(
      Seq(("none.example", "User-agent: *\nDisallow: /x\n"))
        .toDF("domain", "robots_txt"),
      "domain", "robots_txt", "graftbot")
    val bl = Seq(("blocked.example", "ads")).toDF("domain", "category")
    val out = graft.streaming.CrawlStream.gatedRecords(
        Warc.synthesizeWarcGzHttpSegment(docs, recordsPerFile = 10),
        policy, bl, gz = true)
      .select(col("url"), col("clean_text")).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    val survivors = (0L until 20L)
      .filterNot(i => Seq(3L, 7L, 9L).contains(i % 10)).filterNot(_ % 11 == 5)
    assert(out.keySet ==
      survivors.map(i => s"http://site${i % 7}.example/page/$i").toSet,
      s"got ${out.keySet}")
    assert(out(s"http://site1.example/page/1") == "D1")
    // charset rung: a windows-1251 body declared via the HTTP header
    // param decodes to real Cyrillic, not mojibake
    val win1251 = java.nio.charset.Charset.forName("windows-1251")
    val f = envFile(httpBytes("HTTP/1.1 200 OK",
      "Content-Type: text/html; charset=windows-1251\r\n",
      "<html><body>Привет мир</body></html>".getBytes(win1251)))
    val cy = graft.streaming.CrawlStream.gatedRecords(
        Seq((1L, f)).toDF("file_id", "content"), policy, bl)
      .select(col("clean_text")).collect()
    assert(cy.map(_.getString(0)).toSeq == Seq("Привет мир"))
  }

  test("charset decode: per-row labels, WHATWG remaps, meta prescan, " +
      "unknown-label fallback") {
    import spark.implicits._
    import graft.operators.Charsets
    def enc(s: String, cs: String) =
      s.getBytes(java.nio.charset.Charset.forName(cs))
    val rows = Seq(
      ("winr", enc("Привет", "windows-1251"), "windows-1251"),
      ("sjis", enc("こんにちは", "Shift_JIS"), "shift_jis"),
      ("gbk", enc("你好世界", "GBK"), "gbk"),
      // latin1 label remaps to windows-1252: byte 0x97 (em dash there,
      // a control char in true latin-1) must decode as U+2014
      ("l1", Array(0x63, 0x97, 0x64).map(_.toByte), "iso-8859-1"),
      ("bad", enc("plain", "UTF-8"), "utf8mb4-nonsense"),
      ("utf", enc("naïve", "UTF-8"), "utf-8"))
    val out = rows.toDF("k", "b", "cs")
      .select(col("k"), Charsets.decodeCharset(col("b"), col("cs")).as("t"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("winr") == "Привет" && out("sjis") == "こんにちは" &&
      out("gbk") == "你好世界" && out("l1") == "c—d" &&
      out("bad") == "plain" && out("utf") == "naïve", s"$out")
    // sniff priority: HTTP param > meta > utf-8 default; meta wins
    // only when the param is absent
    val metaDoc = enc("<html><head><meta charset=\"windows-1251\"></head>" +
      "<body>x</body></html>", "UTF-8")
    val sniffed = Seq(
      ("hdr", metaDoc, "shift_jis"),
      ("meta", metaDoc, ""),
      ("none", enc("<html><body>plain</body></html>", "UTF-8"), ""))
      .toDF("k", "b", "hc")
      .select(col("k"), Charsets.sniff(col("hc"), col("b")).as("cs"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(sniffed == Map("hdr" -> "shift_jis", "meta" -> "windows-1251",
      "none" -> "utf-8"), s"$sniffed")
  }
}
