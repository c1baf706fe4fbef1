package graft.tools

import org.apache.spark.sql.functions._

/** Durable-cycle-loop incremental-resume probe (the q189 measurement
  * applied to q195): run the INITIAL drain over a corpus-sized
  * segment fixture, then a resume with NO new segments, then a resume
  * after ONE new segment arrives — the three costs a months-long
  * crawl actually alternates between. Rows must be constant across
  * the no-new resume and grow by exactly the new segment's
  * admissions after the arrival.
  *
  * Usage: runMain graft.tools.CycleProbe <dir> [recordsPerFile]
  */
object CycleProbe {
  def main(args: Array[String]): Unit = {
    import graft.sources.{ArtifactStore, Warc}
    val dir = args(0)
    val rpf = if (args.length > 1) args(1).toInt else 1000
    println(f"SCALE_CALIB ${graft.Bench.calibrate()}%.3f s")
    val spark = graft.core.GraftSession.build("graft-cycle-probe",
      graft.core.GraftSession.envCores)
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("cycle_probe")
    val (warcDir, sinkDir, ckpt, root) =
      (s"$base/in", s"$base/sink", s"$base/ckpt", s"$base/store")
    // link-bearing pages at segment shape; densely re-keyed (the
    // scaled fixtures space doc_ids 1e6 apart)
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select((row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy("doc_id"))
        .cast("long") - 1).as("doc_id"))
    val ids = col("doc_id").cast("string")
    val t = (col("doc_id") / 4).cast("long")
    val html = concat(
      lit("<html><body><p>Doc "), ids, lit("</p>"),
      lit("<a href=\"http://news"), pmod(t, lit(5)).cast("string"),
      lit(".example/item/"), t.cast("string"), lit("\">i</a>"),
      lit("</body></html>"))
    Warc.synthesizeWarcGzSegment(
        docs.select(col("doc_id"), html.as("text")), rpf)
      .write.mode("overwrite").parquet(warcDir)
    val robots = docs.select(pmod(col("doc_id"), lit(7)).as("h")).distinct()
      .select(concat(lit("site"), col("h").cast("string"),
        lit(".example")).as("domain"),
        lit("User-agent: *\nDisallow: /private\n").as("robots_txt"))
    val blocklist = Seq(("none.example", "ads")).toDF("domain", "category")
    val delays = Seq(("news0.example", 2.0)).toDF("domain", "crawl_delay")
    var v = 1
    def drain(): (Double, Long) = {
      val t0 = System.nanoTime()
      val out = graft.streaming.CrawlStream.drainCrawlLoopExpandDurable(
        spark, warcDir, robots, blocklist, delays, root, "probe",
        f"v$v%04d", f"v${v + 1}%04d", sinkDir, ckpt)
      v += 1
      val n = out.count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val (w1, n1) = drain()
    println(f"CYCLE_PROBE $dir initial drain: $w1%.2f s, $n1 rows")
    val (w2, n2) = drain()
    println(f"CYCLE_PROBE $dir no-new resume: $w2%.2f s, $n2 rows")
    require(n2 == n1, s"resume must not re-append: $n1 -> $n2")
    // one late segment: 100 fresh pages in a fresh id range
    Warc.synthesizeWarcGzSegment(
        spark.range(100).select((col("id") + 10000000L).as("doc_id"),
          concat(lit("<html><body><a href=\"http://late.example/x"),
            col("id").cast("string"), lit("\">l</a></body></html>"))
            .as("text")), 100)
      .withColumn("file_id", col("file_id") + 9000000L)
      .coalesce(1).write.mode("append").parquet(warcDir)
    val (w3, n3) = drain()
    println(f"CYCLE_PROBE $dir late-segment resume: $w3%.2f s, $n3 rows " +
      f"(+${n3 - n1})")
    println(s"""{"initial_s":$w1,"resume_s":$w2,"late_s":$w3,""" +
      s""""rows":$n1,"late_rows":${n3 - n1}}""")
    spark.stop()
    sys.exit(0)
  }
}
