package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) record reader — Common Crawl's container format,
  * the natural feeder for [[graft.operators.Html.extractText]]. A
  * WARC file is a concatenation of records, each framed as
  *
  * {{{
  * WARC/1.0\r\n
  * <Name>: <value>\r\n ... header lines ...
  * Content-Length: N\r\n
  * \r\n                      (blank line ends the header block)
  * <N payload bytes>
  * \r\n\r\n                  (record terminator)
  * }}}
  *
  * so the only sound way to walk it is LENGTH FRAMING: hop from
  * record start to record start via the parsed Content-Length —
  * payloads are arbitrary bytes and may themselves contain
  * "WARC/1.0" (a crawled page ABOUT warc files must not desync the
  * reader; a regex split would).
  *
  * Unlike the fixed-hop RIFF/ISO-BMFF walkers in [[Multimodal]]
  * (per-hop `withColumn` stages), the whole walk here is ONE
  * `aggregate()` higher-order expression folding a (pos, bad, recs)
  * state struct over `maxRecords` iterations. The reason is a scale
  * lesson, not style: each WARC hop derives ~6 intermediates (header
  * end, header text, three header fields, content length) that each
  * feed several downstream expressions, and an unrolled per-hop
  * column chain multiplies those subtrees into the next hop's tree —
  * the optimizer saw an exponentially-grown expression DAG (a
  * Verify run was killed at 50 GB of driver heap before this
  * restructure; SCALE.md round 10). The fold keeps the plan a single
  * fixed-size expression; iteration happens at runtime, per row,
  * inside one codegen stage. No UDF, no shuffle — at 100 TB this
  * parses at scan throughput and the payload substring is the only
  * wide value that survives. Intermediates inside the fold are bound
  * once per iteration via single-element `transform` lambdas (SQL has
  * no let-binding; a 1-element transform is one).
  *
  * Byte-exact string walking: the binary content is decoded as
  * ISO-8859-1 (latin-1 maps every byte to exactly one char, so char
  * offsets ARE byte offsets — UTF-8 would shift offsets on any
  * multi-byte payload); header fields are matched on the latin-1 view
  * and the payload is re-encoded from its slice.
  *
  * Malformed-file contract (the [[Multimodal]] broken-file rule): a
  * file whose walk desyncs — a hop landing where no `WARC/1.0\r\n`
  * magic sits, a header block with no terminating blank line or no
  * parseable Content-Length, a missing record terminator, trailing
  * bytes after the last record, or more records than `maxRecords` —
  * contributes NO rows. Truncating on corruption instead of erroring
  * is how a 100k-file crawl batch survives its bad segments; emitting
  * the valid prefix of a desynced file would present half-read data
  * as whole.
  *
  * Header names are matched case-insensitively per the spec; values
  * are taken verbatim to the line's CR. A header absent from a
  * record (warcinfo has no Target-URI) reads as ''. */
object Warc {

  private val RecType = "array<struct<rec_type:string,target_uri:string," +
    "warc_date:string,content_length:bigint,off:bigint>>"

  /** Explode a binary column of whole WARC files into one row per
    * record: (inherited columns…, rec_idx, rec_type, target_uri,
    * warc_date, content_length, payload). `maxRecords` bounds the
    * runtime fold (files with more records are rejected, never
    * half-read) — size it to the writer's records-per-segment. */
  def records(files: DataFrame, contentCol: String = "content",
              maxRecords: Int = 8): DataFrame = {
    require(maxRecords >= 1, "walk needs at least one record hop")
    // one hop of the fold: acc is (pos, bad, recs); __ws/__wn are the
    // latin-1 view and its length. Finished files (pos = len + 1,
    // not bad) pass through untouched; any framing violation sets bad.
    val hop =
      s"""(acc, i) -> if(acc.bad or acc.pos > __wn, acc,
         |  element_at(transform(
         |    array(bigint(locate('\\r\\n\\r\\n', __ws, int(acc.pos + 10)))),
         |    hend -> element_at(transform(
         |      array(substr(__ws, int(acc.pos), int(hend - acc.pos))),
         |      hdr -> element_at(transform(
         |        array(cast(nullif(regexp_extract(hdr,
         |          '(?im)^Content-Length: ([0-9]+)', 1), '') as bigint)),
         |        clen -> if(
         |          substr(__ws, int(acc.pos), 10) = 'WARC/1.0\\r\\n'
         |            and hend > 0 and clen is not null
         |            and hend + 7 + clen <= __wn
         |            and substr(__ws, int(hend + 4 + clen), 4) = '\\r\\n\\r\\n',
         |          named_struct(
         |            'pos', hend + 8 + clen, 'bad', false,
         |            'recs', array_append(acc.recs, named_struct(
         |              'rec_type', regexp_extract(hdr,
         |                 '(?im)^WARC-Type: ([^\\r\\n]*)', 1),
         |              'target_uri', regexp_extract(hdr,
         |                 '(?im)^WARC-Target-URI: ([^\\r\\n]*)', 1),
         |              'warc_date', regexp_extract(hdr,
         |                 '(?im)^WARC-Date: ([^\\r\\n]*)', 1),
         |              'content_length', clen,
         |              'off', hend + 4))),
         |          named_struct('pos', acc.pos, 'bad', true,
         |            'recs', acc.recs))), 1)), 1)), 1))""".stripMargin
    val walk =
      s"""aggregate(
         |  sequence(1, $maxRecords),
         |  named_struct('pos', bigint(1), 'bad', __wn = 0,
         |    'recs', cast(array() as $RecType)),
         |  $hop)""".stripMargin
    val passthrough = files.columns.filterNot(_ == contentCol).map(col)
    files
      .withColumn("__ws", decode(col(contentCol), "ISO-8859-1"))
      .withColumn("__wn", length(col("__ws")).cast("long"))
      .withColumn("__walk", expr(walk))
      // fully consumed = the fold ended exactly one past the last
      // byte; leftover bytes mean corruption or > maxRecords records
      .filter(!col("__walk.bad") && col("__walk.pos") === col("__wn") + 1)
      .select(passthrough :+ col("__ws") :+
        posexplode(col("__walk.recs")).as(Seq("rec_idx", "__r")): _*)
      .select(passthrough :+ col("rec_idx") :+
        col("__r.rec_type").as("rec_type") :+
        col("__r.target_uri").as("target_uri") :+
        col("__r.warc_date").as("warc_date") :+
        col("__r.content_length").as("content_length") :+
        encode(col("__ws").substr(col("__r.off"), col("__r.content_length")),
          "ISO-8859-1").as("payload"): _*)
  }

  /** Strict record-at-a-time gzip member walk (RFC 1952): a real
    * `.warc.gz` is a concatenation of gzip MEMBERS, one per record,
    * so each record is independently seekable. This is PASS 1 of the
    * two-pass member protocol: walk every member of one file — header
    * (magic/CM=8, the four optional FLG fields skipped per spec),
    * raw-deflate inflate (JDK `Inflater`, nowrap) with the output
    * DISCARDED (only CRC32 + byte count are kept), then the 8-byte
    * trailer VERIFIED (CRC32 + ISIZE mod 2^32) — and require the
    * members to tile the file exactly. Returns each member's
    * (compressed-data offset, compressed-data length); None for any
    * violation — a bad magic, a broken deflate stream, a trailer
    * mismatch, trailing garbage — so a CODEC-layer corruption erases
    * the whole FILE (member boundaries past a broken member can't be
    * trusted; the [[records]] malformed-file contract, one layer
    * down). Verifying before emitting anything is what lets PASS 2
    * ([[inflateMember]]) stream one member at a time: peak heap is
    * the compressed input plus ONE decompressed member, never the
    * whole decompressed segment — a real Common Crawl segment is
    * ~1 GB gz / ~4 GB raw, past the 2 GB JVM array ceiling that a
    * whole-file concatenation would hit. The price is inflating
    * twice (verify + emit); codec CPU is cheap next to a 4 GB
    * single-cell allocation that cannot exist.
    *
    * Plain JVM codec work (the PNG-inflate discipline in
    * [[Multimodal.decodePng]]): runs inside a typed map per file, no
    * UDF registry, no shuffle. */
  private[graft] def memberOffsets(
      b: Array[Byte]): Option[IndexedSeq[(Int, Int)]] = {
    if (b.length == 0) return None
    val offs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var pos = 0
    while (pos < b.length) {
      // fixed header: ID1 ID2 CM FLG MTIME(4) XFL OS
      if (pos + 10 > b.length || (b(pos) & 0xff) != 0x1f ||
          (b(pos + 1) & 0xff) != 0x8b || b(pos + 2) != 8) return None
      val flg = b(pos + 3) & 0xff
      var p = pos + 10
      if ((flg & 4) != 0) { // FEXTRA: little-endian XLEN then bytes
        if (p + 2 > b.length) return None
        p += 2 + ((b(p) & 0xff) | ((b(p + 1) & 0xff) << 8))
      }
      if ((flg & 8) != 0) { // FNAME: zero-terminated
        while (p < b.length && b(p) != 0) p += 1
        p += 1
      }
      if ((flg & 16) != 0) { // FCOMMENT: zero-terminated
        while (p < b.length && b(p) != 0) p += 1
        p += 1
      }
      if ((flg & 2) != 0) p += 2 // FHCRC
      if (p >= b.length) return None
      val infl = new java.util.zip.Inflater(true) // nowrap: raw deflate
      try {
        infl.setInput(b, p, b.length - p)
        val buf = new Array[Byte](8192)
        val crc = new java.util.zip.CRC32()
        var size = 0L
        while (!infl.finished()) {
          val n =
            try infl.inflate(buf)
            catch { case _: java.util.zip.DataFormatException => return None }
          if (n == 0 && !infl.finished()) return None // truncated stream
          crc.update(buf, 0, n); size += n
        }
        // compressed bytes read — bounded by the array length (< 2^31),
        // so the Long→Int narrowing cannot truncate; kept as Long math
        // anyway so the bound is visible
        val read = infl.getBytesRead
        val end = p.toLong + read
        if (end + 8 > b.length) return None // trailer must be present
        offs += ((p, read.toInt))
        p = end.toInt
        def le32(i: Int): Long = (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
          ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
        if (le32(p) != crc.getValue ||
            le32(p + 4) != (size & 0xffffffffL)) return None
        pos = p + 8
      } finally infl.end()
    }
    Some(offs.toIndexedSeq)
  }

  /** PASS 2: inflate ONE already-verified member's raw-deflate bytes.
    * Called lazily per emitted row, so only one member's decompressed
    * form is live at a time. */
  private[graft] def inflateMember(b: Array[Byte], off: Int,
                                   len: Int): Array[Byte] = {
    // Long math: a verified member can legitimately be >512 MB of
    // compressed data (a whole-file-gzipped segment is ONE member),
    // where len * 4 overflows Int negative and the stream ctor throws
    val out = new java.io.ByteArrayOutputStream(
      math.min(len.toLong * 4, 1L << 20).toInt)
    val infl = new java.util.zip.Inflater(true)
    try {
      infl.setInput(b, off, len)
      val buf = new Array[Byte](8192)
      while (!infl.finished()) {
        val n = infl.inflate(buf)
        // pass 1 verified the stream, so zero progress before finish
        // should be impossible — but an impossible state must fail
        // loudly, not spin this loop forever (mirrors pass 1's guard)
        require(n > 0 || infl.finished(),
          s"verified member at off=$off len=$len stalled mid-inflate")
        out.write(buf, 0, n)
      }
    } finally infl.end()
    out.toByteArray
  }

  /** Whole-file member concatenation — [[memberOffsets]] then every
    * member inflated into one buffer. Test/probe surface only: the
    * production path ([[gzRecords]]) never concatenates, precisely
    * because a real segment's concatenation (~4 GB) cannot fit a JVM
    * array. */
  private[graft] def gunzipMembers(b: Array[Byte]): Option[Array[Byte]] =
    memberOffsets(b).map { offs =>
      val out = new java.io.ByteArrayOutputStream(
        math.min(b.length.toLong * 3, 1L << 26).toInt)
      offs.foreach { case (p, l) => out.write(inflateMember(b, p, l)) }
      out.toByteArray
    }

  /** Explode a frame of whole `.warc.gz` files into ONE ROW PER GZIP
    * MEMBER: (idCol, member_idx, contentCol = the member's
    * decompressed bytes). Two-pass per file inside a typed map:
    * [[memberOffsets]] verifies EVERY member before anything is
    * emitted (a file with any codec-layer violation contributes no
    * rows), then the returned iterator inflates members one at a time
    * as Spark consumes rows — peak heap is one decompressed member,
    * never the file's concatenation. */
  def gunzipPerMember(files: DataFrame, contentCol: String = "content",
                      idCol: String = "file_id"): DataFrame = {
    // one walk implementation: the typed map carries the id as a
    // string (any key type rides — synthetic longs, file paths) and
    // the original type is restored on the way out
    val t = files.schema(idCol).dataType
    val members = gunzipPerMemberKeyed(files, contentCol, idCol)
    if (t == org.apache.spark.sql.types.StringType) members
    else members.withColumn(idCol, col(idCol).cast(t))
  }

  /** One row per gzip member over STRING-keyed files — the
    * [[gunzipPerMember]] walk with the id column carried as a string
    * (file PATHS, not synthetic numeric ids). Same two-pass
    * verify-then-lazy-inflate protocol. */
  private def gunzipPerMemberKeyed(files: DataFrame, contentCol: String,
                                   idCol: String): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col(idCol).cast("string"), col(contentCol))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        memberOffsets(bytes) match {
          case None => Iterator.empty
          case Some(offs) => offs.iterator.zipWithIndex.map {
            case ((p, l), i) => (id, i, inflateMember(bytes, p, l))
          }
        }
      })
      .toDF(idCol, "member_idx", contentCol)
  }

  /** Ingest REAL `.warc.gz` files from disk (or any Hadoop-visible
    * store): Spark's `binaryFile` source reads each file as one
    * (path, content) row — the COMPRESSED segment is the only whole
    * cell that ever exists (a real ~1 GB Common Crawl segment fits;
    * its ~4 GB decompressed form never materializes, because the
    * per-member walk inflates one record at a time) — then the
    * member walk and per-member record fold run exactly as
    * [[gzRecords]]. Output: (path, rec_idx, rec_type, target_uri,
    * warc_date, content_length, payload). The binaryFile source
    * splits by FILE, so a directory of segments parallelizes
    * per-segment — the unit a crawl batch actually ships. */
  def gzRecordsFromFiles(spark: org.apache.spark.sql.SparkSession,
                         pathGlob: String): DataFrame = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc.gz").load(pathGlob)
      .select(col("path"), col("content"))
    gzRecords(files, "content", "path")
  }

  /** [[records]] over `.warc.gz` files — the form every real
    * Common Crawl artifact ships in. Per-member emission
    * ([[gunzipPerMember]]): each gzip member is one row, and the
    * length-framed record fold runs PER MEMBER under the strict
    * record-at-a-time convention (exactly ONE record tiling each
    * member — what every real crawl writer emits, and what makes
    * records independently seekable), so `rec_idx` IS the member
    * index and a segment's record count is unbounded by any fold
    * cap — a 50k-record Common Crawl segment walks with per-member
    * peak memory and O(records) total work (the whole-file fold's
    * `array_append` accumulation was O(records²)).
    *
    * Layered corruption contract: a CODEC violation (bad magic,
    * broken deflate, trailer mismatch, trailing garbage) erases the
    * whole FILE — member boundaries past it can't be trusted; a
    * RECORD-framing violation inside a cleanly-delimited member
    * (a Content-Length lie, a missing terminator, >1 record packed
    * into one member) erases that MEMBER only — the member boundary
    * is exactly the isolation real record-at-a-time framing buys,
    * and is why one bad record doesn't cost a 1 GB segment. */
  def gzRecords(files: DataFrame, contentCol: String = "content",
                idCol: String = "file_id"): DataFrame = {
    val members = gunzipPerMember(files, contentCol, idCol)
    records(members, contentCol, maxRecords = 1)
      .drop("rec_idx")
      .select(col(idCol), col("member_idx").as("rec_idx"), col("rec_type"),
        col("target_uri"), col("warc_date"), col("content_length"),
        col("payload"))
  }

  /** Gzip one member (RFC 1952; minimal header, FLG=0, zero MTIME so
    * the bytes are deterministic). */
  private def gzipMember(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 32)
    out.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0))
    val defl = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    try {
      defl.setInput(data); defl.finish()
      val buf = new Array[Byte](8192)
      while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
    } finally defl.end()
    val crc = new java.util.zip.CRC32()
    crc.update(data)
    def le32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    le32(crc.getValue); le32(data.length.toLong)
    out.toByteArray
  }

  /** Synthetic `.warc.gz` files: the SAME two-record planting as
    * [[synthesizeWarc]] (so the q137 oracle's closed form carries
    * over verbatim), but each record compressed into its OWN gzip
    * member — the record-at-a-time convention real crawl writers use.
    * The corruption plant moves DOWN a layer: `doc_id % corruptEvery
    * == 0` files carry a flipped byte in the response member's CRC32
    * trailer (framing intact, checksum wrong), and the whole file
    * must yield no rows. Codec work → typed map, no expression. */
  def synthesizeWarcGz(docs: DataFrame, corruptEvery: Int = 50): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        // resolved per task: Charset instances don't serialize
        val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
        val date = f"2026-01-${id % 9 + 1}%02dT00:00:00Z"
        val info = s"software: graft-$id\r\n"
        val rec0 = ("WARC/1.0\r\nWARC-Type: warcinfo\r\nWARC-Date: " +
          date + "\r\nContent-Length: " + info.length +
          "\r\n\r\n" + info + "\r\n\r\n").getBytes(latin1)
        val body = text.getBytes(latin1)
        val rec1 = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
          s"WARC-Target-URI: http://site${id % 7}.example/page/$id\r\n" +
          s"WARC-Date: $date\r\nContent-Length: ${body.length}\r\n\r\n")
          .getBytes(latin1) ++ body ++ "\r\n\r\n".getBytes(latin1)
        val m1 = gzipMember(rec1)
        if (id % corruptEvery == 0) // flip one CRC32 trailer byte
          m1(m1.length - 8) = (m1(m1.length - 8) ^ 0x5a).toByte
        (id, gzipMember(rec0) ++ m1)
      })
      .toDF("file_id", "content")
  }

  /** Synthetic SEGMENT-shaped `.warc.gz` files — the realistic Common
    * Crawl shape the one-file-per-doc plantings never exercise:
    * `recordsPerFile` documents per file (file_id = doc_id /
    * recordsPerFile), each response record in its OWN gzip member,
    * preceded by one warcinfo member (`software: graft-<file_id>`,
    * the segment writer's stamp). Record fields keep the
    * [[synthesizeWarcGz]] closed forms of doc_id, and rec_idx within
    * a file is 1 + the doc's rank by doc_id (member 0 is the
    * warcinfo), so an oracle replays the planting with one window.
    * With `corruptEvery > 0`, files where `file_id % corruptEvery
    * == 0` carry a flipped CRC byte in their MIDDLE member — a
    * codec-layer violation mid-file, which must erase the whole
    * file (never a prefix). The per-file grouping is one shuffle of
    * the docs (fixture synthesis, not a measured operator). */
  def synthesizeWarcGzSegment(docs: DataFrame, recordsPerFile: Int,
                              corruptEvery: Int = 0): DataFrame = {
    require(recordsPerFile >= 1, "a segment holds at least one record")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select((col("doc_id") / recordsPerFile).cast("long").as("fid"),
        col("doc_id"), col("text"))
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .mapGroups { (fid, it) =>
        val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
        val docs = it.map(r => (r._2, r._3)).toArray.sortBy(_._1)
        val out = new java.io.ByteArrayOutputStream()
        val info = s"software: graft-$fid\r\n"
        out.write(gzipMember(("WARC/1.0\r\nWARC-Type: warcinfo\r\n" +
          "WARC-Date: 2026-01-01T00:00:00Z\r\nContent-Length: " +
          info.length + "\r\n\r\n" + info + "\r\n\r\n").getBytes(latin1)))
        val corruptAt = // middle member, counting the warcinfo
          if (corruptEvery > 0 && fid % corruptEvery == 0)
            (docs.length + 1) / 2 else -1
        docs.zipWithIndex.foreach { case ((id, text), k) =>
          val date = f"2026-01-${id % 9 + 1}%02dT00:00:00Z"
          val body = text.getBytes(latin1)
          val m = gzipMember((s"WARC/1.0\r\nWARC-Type: response\r\n" +
            s"WARC-Target-URI: http://site${id % 7}.example/page/$id\r\n" +
            s"WARC-Date: $date\r\nContent-Length: ${body.length}\r\n\r\n")
            .getBytes(latin1) ++ body ++ "\r\n\r\n".getBytes(latin1))
          if (k + 1 == corruptAt)
            m(m.length - 8) = (m(m.length - 8) ^ 0x5a).toByte
          out.write(m)
        }
        (fid, out.toByteArray)
      }
      .toDF("file_id", "content")
  }

  /** Synthetic multi-record WARC files with REAL framing, one file
    * per document: a `warcinfo` record (variable-length payload —
    * the response record's offset is never fixed) then a `response`
    * record carrying the document text as payload. Every field is a
    * closed form of `doc_id`/`text`, so an oracle can replay the
    * planting without parsing bytes ([[Multimodal.synthesizeAudio]]'s
    * discipline). Docs where `doc_id % corruptEvery == 0` declare a
    * Content-Length 3 bytes PAST the true payload — the terminator
    * check fails and the whole file must yield no rows. */
  def synthesizeWarc(docs: DataFrame, corruptEvery: Int = 50): DataFrame = {
    val id = col("doc_id").cast("string")
    val info = concat(lit("software: graft-"), id, lit("\r\n"))
    val day = lpad((pmod(col("doc_id"), lit(9)) + 1).cast("string"), 2, "0")
    val date = concat(lit("2026-01-"), day, lit("T00:00:00Z"))
    val lie = when(pmod(col("doc_id"), lit(corruptEvery)) === 0, 3L)
      .otherwise(0L)
    val file = concat(
      lit("WARC/1.0\r\nWARC-Type: warcinfo\r\nWARC-Date: "), date,
      lit("\r\nContent-Length: "), length(info).cast("string"),
      lit("\r\n\r\n"), info, lit("\r\n\r\n"),
      lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://site"),
      pmod(col("doc_id"), lit(7)).cast("string"),
      lit(".example/page/"), id,
      lit("\r\nWARC-Date: "), date,
      lit("\r\nContent-Length: "),
      (length(col("text")) + lie).cast("string"),
      lit("\r\n\r\n"), col("text"), lit("\r\n\r\n"))
    docs.select(col("doc_id").as("file_id"),
      encode(file, "ISO-8859-1").as("content"))
  }
}
