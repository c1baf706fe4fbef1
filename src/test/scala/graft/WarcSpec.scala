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
}
