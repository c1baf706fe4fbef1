package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.CrawlStream

/** Streaming politeness-scheduler state law (q166's 100 TB question):
  * the per-host state must be ONE counter — 8 bytes — no matter how
  * many URLs the frontier has pushed through the host, so state size
  * scales with DISTINCT HOSTS, never with crawl history. The probe
  *
  *  1. drains an H-host × U-urls/host frontier over B arrival
  *     batches and reads the state-store row count off the query's
  *     final progress: it must equal H exactly at every U;
  *  2. grows U 10× at fixed H: state rows must NOT move, wall must
  *     stay ~linear in rows (the per-batch sort is per-host
  *     per-batch, so a bigger batch costs its own size, not
  *     history);
  *  3. plants a MEGA-HOST carrying `megaUrls` URLs in one batch: the
  *     politeness contract makes its SCHEDULE long (slots 0..n-1 —
  *     that is the output, not a defect), while its state stays one
  *     counter and its slots stay dense and correctly delayed.
  *
  * Prints one JSON line for SCALE.md.
  *
  * Usage: runMain graft.tools.SchedProbe [hosts] [urlsPerHost] [mega]
  */
object SchedProbe {

  private def timeIt[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val hosts = if (args.length > 0) args(0).toInt else 10000
    val perHost = if (args.length > 1) args(1).toInt else 8
    val megaUrls = if (args.length > 2) args(2).toInt else 200000
    println(f"SCALE_CALIB ${graft.Bench.calibrate()}%.3f s")
    val spark = graft.core.GraftSession.build("graft-sched-probe",
      graft.core.GraftSession.envCores)
    import spark.implicits._

    def frontier(h: Int, u: Int, batches: Int): DataFrame =
      spark.range(h.toLong * u).select(
        col("id").as("doc_id"),
        concat(lit("https://h"), (col("id") % h).cast("string"),
          lit(".example/p"), col("id").cast("string")).as("url"),
        (col("id") % batches).as("bseq"))

    // drainSchedule with the state-store row count read off the final
    // progress (the memory-sink drain hides the StreamingQuery handle)
    def drainWithState(dir: String, name: String): (DataFrame, Long) = {
      val in = spark.readStream.schema("doc_id BIGINT, url STRING")
        .option("maxFilesPerTrigger", 1).parquet(dir)
      val delays = Seq.empty[(String, Double)].toDF("domain", "crawl_delay")
      val out = CrawlStream.politenessStream(in, "doc_id", "url", delays)
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val stateRows = Option(q.lastProgress)
        .flatMap(p => p.stateOperators.headOption)
        .map(_.numRowsTotal).getOrElse(-1L)
      (spark.table(name), stateRows)
    }

    val tmp = java.nio.file.Files.createTempDirectory("sched_probe").toString
    val cells = Seq(perHost, perHost * 10).zipWithIndex.map { case (u, i) =>
      val dir = s"$tmp/f$i"
      CrawlStream.writeArrivalBatches(frontier(hosts, u, 4), "bseq", dir)
      val ((got, stateRows), wall) = timeIt(drainWithState(dir, s"sp_$i"))
      val n = got.count()
      require(n == hosts.toLong * u, s"row loss: $n")
      require(stateRows == hosts.toLong,
        s"state must be one row per host, got $stateRows for $hosts hosts")
      // slots are dense 0..u-1 within every host
      val bad = got.groupBy(col("host"))
        .agg(max(col("slot_idx")).as("mx"), count(lit(1)).as("c"))
        .filter(col("mx") =!= u - 1 || col("c") =!= u).count()
      require(bad == 0, s"non-dense slots on $bad hosts")
      println(f"STAGE hosts=$hosts urls/host=$u rows=$n " +
        f"state_rows=$stateRows wall=$wall%.2f s")
      s""""u$u":{"rows":$n,"state_rows":$stateRows,"wall_s":$wall}"""
    }

    // mega-host: one host absorbs megaUrls URLs in a single batch —
    // the state must stay ONE row for it; the schedule goes long by
    // contract; task residency is that batch's rows (sorted once)
    val megaDir = s"$tmp/mega"
    val mega = frontier(1000, 4, 2).unionByName(
      spark.range(megaUrls.toLong).select(
        (col("id") + 10000000L).as("doc_id"),
        concat(lit("https://mega.example/p"), col("id").cast("string"))
          .as("url"),
        lit(1L).as("bseq")))
    CrawlStream.writeArrivalBatches(mega, "bseq", megaDir)
    val ((gotM, stateM), wallM) = timeIt(drainWithState(megaDir, "sp_mega"))
    val megaGot = gotM.filter(col("host") === "mega.example")
    val mx = megaGot.agg(max(col("slot_idx"))).head.getInt(0)
    require(megaGot.count() == megaUrls.toLong && mx == megaUrls - 1,
      s"mega-host schedule must be dense 0..${megaUrls - 1}, max=$mx")
    require(stateM == 1001L,
      s"state must be 1001 rows (1000 hosts + mega), got $stateM")
    println(f"STAGE mega=$megaUrls urls -> state_rows=$stateM " +
      f"wall=$wallM%.2f s (schedule long BY CONTRACT, state one counter)")

    println(cells.mkString("{", ",",
      s""","mega":{"urls":$megaUrls,"state_rows":$stateM,"wall_s":$wallM}}"""))
    spark.stop()
    sys.exit(0)
  }
}
