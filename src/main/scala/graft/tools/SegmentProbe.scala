package graft.tools

import org.apache.spark.sql.functions._

/** Real-segment-shape WARC probe (verdict r14 ask #6): synthesize
  * `.warc.gz` files at a chosen records-per-file — a Common Crawl
  * segment is tens of thousands of records per file, a shape the
  * one-file-per-doc registry plantings never reach — walk them with
  * the per-member [[graft.sources.Warc.gzRecords]], and time a census
  * over every record field (count + content-length sum + payload
  * hash, so neither the walk nor the payload slice is prunable).
  * Every 10th file plants a flipped CRC byte in its MIDDLE member
  * (the whole-file-erase contract at segment shape).
  *
  * The point of the cell: with per-member emission the walk's peak
  * heap is one decompressed record regardless of records-per-file,
  * and the work is O(records) — the pre-r15 whole-file fold was
  * O(records²) past its `maxRecords` cap and capped a file's
  * decompressed form at one JVM cell. A 10k-records-per-file probe
  * at 100× data is the direct evidence.
  *
  * With a leading `plain` argument the probe runs the UNCOMPRESSED
  * path instead ([[graft.sources.Warc.synthesizeWarcSegmentPlain]] +
  * the typed per-record scan, corruption = a mid-file Content-Length
  * lie that must erase the whole file) — the round-16 evidence that
  * retiring the whole-file fold made plain multi-thousand-record
  * segments walk linearly too.
  *
  * Usage: runMain graft.tools.SegmentProbe [plain] <recordsPerFile> <reps> <dir1> [dir2 ...]
  */
object SegmentProbe {
  def main(args: Array[String]): Unit = {
    val plain = args(0) == "plain"
    val a = if (plain) args.drop(1) else args
    val recordsPerFile = a(0).toInt
    val reps = a(1).toInt
    val dirs = a.drop(2).toSeq
    println(f"SCALE_CALIB ${graft.Bench.calibrate()}%.3f s")
    val spark = graft.core.GraftSession.build("graft-segment-probe",
      graft.core.GraftSession.envCores)
    val cells = dirs.map { dir =>
      // re-key densely: the scaled fixtures space doc_ids 1e6 apart
      // (DataGen replica offsets), which would make every file_id a
      // multiple of 100 — and all of them hit the %10 corruption
      // plant. A dense row number keys files the way a segment writer
      // would (fixture synthesis, not measured work).
      val docs = graft.core.Tables.load(spark, dir, "documents")
        .select((org.apache.spark.sql.functions.row_number().over(
            org.apache.spark.sql.expressions.Window.orderBy("doc_id"))
          .cast("long") - 1).as("doc_id"), col("text"))
      def run(): (Double, Long, Long) = {
        val t0 = System.nanoTime()
        val recs =
          if (plain) graft.sources.Warc.records(
            graft.sources.Warc.synthesizeWarcSegmentPlain(docs,
              recordsPerFile, corruptEvery = 10),
            maxRecords = recordsPerFile + 1)
          else graft.sources.Warc.gzRecords(
            graft.sources.Warc.synthesizeWarcGzSegment(docs,
              recordsPerFile, corruptEvery = 10))
        val row = recs.select(count(lit(1)).as("n"),
            coalesce(sum(col("content_length")), lit(0L)).as("bytes"),
            coalesce(sum(hash(col("target_uri"), col("payload"))
              .cast("long")), lit(0L)).as("h"))
          .head
        ((System.nanoTime() - t0) / 1e9, row.getLong(0), row.getLong(1))
      }
      run() // warmup (JIT + codegen)
      val runs = (1 to reps).map(_ => run())
      val best = runs.minBy(_._1)
      println(f"SEGMENT${if (plain) "_PLAIN" else ""} $dir " +
        f"rpf=$recordsPerFile min=${best._1}%.2f " +
        f"reps=${runs.map(r => f"${r._1}%.2f").mkString(",")} " +
        f"records=${best._2} payload_bytes=${best._3}")
      s""""$dir":{"min":${best._1},"records":${best._2},"bytes":${best._3}}"""
    }
    println(cells.mkString("{", ",", "}"))
    spark.stop()
    sys.exit(0)
  }
}
