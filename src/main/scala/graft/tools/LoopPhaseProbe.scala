package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Phase-cost breakdown of the composed cycle-loop drain (q193's
  * shape): per-pass wall time split into policy parse, seen-state
  * loads, the streaming drain itself, and the delta publishes — plus
  * a BARE one-trigger memory-sink drain (trivial projection, no
  * state) and a one-stateful-op drain, to measure the machine's
  * irreducible per-drain floor. Measurement tooling for the
  * optimization rounds; prints PROBE lines.
  *
  * Usage: runMain graft.tools.LoopPhaseProbe <sfDir> [reps]
  */
object LoopPhaseProbe {
  private def t[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    println(f"PROBE calib ${graft.Bench.calibrate()}%.3f s")
    val spark = graft.core.GraftSession.build("graft-loop-probe",
      graft.core.GraftSession.envCores)
    import spark.implicits._
    import graft.streaming.{CrawlStream, EventStream}
    import graft.operators.UrlNormalize
    import graft.sources.{ArtifactStore, Warc}

    val d = graft.core.Tables.load(spark, dir, "documents")
    val ids = col("doc_id").cast("string")
    val dn = pmod(col("doc_id"), lit(7)).cast("string")
    val pageUrl = concat(lit("http://site"), dn, lit(".example/page/"), ids)
    val tgt = (col("doc_id") / 4).cast("long")
    val html = concat(
      lit("<html><body><p>Doc "), ids, lit("</p><a href=\"http://news"),
      pmod(tgt, lit(5)).cast("string"), lit(".example/item/"),
      tgt.cast("string"), lit("\">i</a></body></html>"))
    val base = java.nio.file.Files.createTempDirectory("loop_phase")
    val warcDir = s"$base/warc"
    Warc.synthesizeWarcGz(d.select(col("doc_id"), html.as("text")))
      .repartition(8).write.parquet(warcDir)
    val robots = d.select(pmod(col("doc_id"), lit(7)).as("h")).distinct()
      .select(concat(lit("site"), col("h").cast("string"),
        lit(".example")).as("domain"),
        lit("User-agent: *\nDisallow: /private\n").as("robots_txt"))
    val blocklist = Seq(("site5.example", "ads")).toDF("domain", "category")
    val delays = Seq(("news0.example", 2.0)).toDF("domain", "crawl_delay")
    val root = s"$base/store"
    ArtifactStore.save(
      d.filter(pmod(col("doc_id"), lit(2)) === 0)
        .select(md5(pageUrl).as("url_digest")),
      root, "frontier_seen", "probe", "v0001")

    // warmup: one full composed drain
    CrawlStream.drainCrawlLoopExpand(spark, warcDir, robots, blocklist,
      delays, root, "probe", "v0001", "v0002").count()

    val litRobots = (0 until 7).map(h => (s"site$h.example",
      "User-agent: *\nDisallow: /private\n")).toDF("domain", "robots_txt")
    (1 to reps).foreach { r =>
      // phase 0: the corpus-derived robots fixture alone (distinct over
      // documents), vs the parse on a literal 7-row frame
      val (_, tFix) = t(robots.count())
      val (_, tPolLit) = t(UrlNormalize
        .robotsPolicy(litRobots, "domain", "robots_txt", "graftbot")
        .localCheckpoint())
      // phase 1: policy parse + checkpoint
      val (policy, tPol) = t(UrlNormalize
        .robotsPolicy(robots, "domain", "robots_txt", "graftbot")
        .localCheckpoint())
      println(f"PROBE rep$r fixture_distinct=$tFix%.2f lit_parse=$tPolLit%.2f")
      // phase 2: seen loads (2 kinds)
      val (_, tSeen) = t {
        ArtifactStore.loadUpTo(spark, root, "fetched_seen", "probe",
          "v0001").foreach(_.count())
        ArtifactStore.loadUpTo(spark, root, "frontier_seen", "probe",
          "v0001").foreach(_.count())
      }
      // phase 3+4: the full composed drain (re-publishes v0002 each rep,
      // idempotent) minus the above — measured whole, publishes timed
      // inside via the memory-sink drain's return
      val (out, tDrain) = t(CrawlStream.drainCrawlLoopExpand(spark,
        warcDir, robots, blocklist, delays, root, "probe", "v0001",
        "v0002"))
      val (_, tCount) = t(out.count())
      println(f"PROBE rep$r policy=$tPol%.2f seen=$tSeen%.2f " +
        f"composed_drain=$tDrain%.2f count=$tCount%.2f")
    }

    // floors: bare stateless drain and one-stateful-op drain over the
    // same 8-file source
    def floor(name: String)(plan: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame): Unit = {
      (1 to reps).foreach { r =>
        val (_, w) = t {
          val in = spark.readStream
            .schema("file_id BIGINT, content BINARY").parquet(warcDir)
          val q = EventStream.withStatePartitions(spark,
            EventStream.StatePartitions) {
            plan(in).writeStream.format("memory")
              .queryName(s"probe_${name}_$r")
              .outputMode("append").trigger(Trigger.AvailableNow()).start()
          }
          q.awaitTermination()
          spark.table(s"probe_${name}_$r").count()
        }
        println(f"PROBE floor_$name rep$r $w%.2f")
      }
    }
    floor("bare")(in => in.select(col("file_id")))
    floor("dedup")(in => in.select(col("file_id")).dropDuplicates("file_id"))
    floor("gzwalk")(in => Warc.gzRecords(in).select(col("file_id"),
      length(col("payload")).as("n")))
    spark.stop()
    sys.exit(0)
  }
}
