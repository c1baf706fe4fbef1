package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Memory-constrained spill sweep (round 13): the 128 GiB sandbox had
  * never exercised the spill paths the 100 TB story leans on, so this
  * tool runs named registry queries — and optionally the CrawlScale
  * composed pipeline — under whatever heap the JVM was launched with
  * (`SPARK_DRIVER_MEM=8g sbt "runMain graft.tools.SpillSweep <dir>
  * <q1,q2,...>"`) and accounts per-stage spill behavior from
  * `SparkListenerStageCompleted` task metrics:
  *
  *   completes-vs-spills-vs-OOM, per query:
  *   - `status`      complete / failed (an OOM that kills the JVM
  *                   shows up as the run itself dying — record that
  *                   cell by hand);
  *   - `stages` / `spilled_stages`  how many stages ran / spilled;
  *   - `mem_spill_mb` / `disk_spill_mb`  total deserialized /
  *                   on-disk spill volume;
  *   - `max_stage_disk_mb`  the worst single stage — the one that
  *                   would page first on a real executor.
  *
  * `GRAFT_SPILL_CRAWL=1` additionally runs the composed CrawlScale
  * sweep (WARC → gates → extract → dedup → pack) under the same heap.
  * One JSON line at the end — the SCALE_MEASURE record format. */
object SpillSweep {

  private final class SpillListener extends SparkListener {
    @volatile var stages = 0
    @volatile var spilled = 0
    @volatile var mem = 0L
    @volatile var disk = 0L
    @volatile var maxStageDisk = 0L
    def reset(): Unit = { stages = 0; spilled = 0; mem = 0L; disk = 0L
      maxStageDisk = 0L }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val tm = s.stageInfo.taskMetrics
      if (tm != null) {
        stages += 1
        val d = tm.diskBytesSpilled
        mem += tm.memoryBytesSpilled
        disk += d
        if (tm.memoryBytesSpilled > 0 || d > 0) spilled += 1
        if (d > maxStageDisk) maxStageDisk = d
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = if (args.length > 1 && args(1).nonEmpty)
      args(1).split(",").toSeq else Seq.empty
    println(f"SPILL_CALIB ${graft.Bench.calibrate()}%.3f s")
    val spark = graft.core.GraftSession.build("graft-spill-sweep",
      graft.core.GraftSession.envCores)
    val heapMb = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    val acc = new SpillListener
    spark.sparkContext.addSparkListener(acc)

    def measure(label: String)(body: => String): (String, String) = {
      acc.reset()
      val t0 = System.nanoTime()
      val outcome =
        try body
        catch { case e: Throwable =>
          s""""status":"failed","err":"${e.getClass.getSimpleName}""""
        }
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500) // let the last stage-completed events land
      label -> (f"""{"wall_s":$wall%.2f,$outcome,""" +
        s""""stages":${acc.stages},"spilled_stages":${acc.spilled},""" +
        f""""mem_spill_mb":${acc.mem / 1e6}%.0f,""" +
        f""""disk_spill_mb":${acc.disk / 1e6}%.0f,""" +
        f""""max_stage_disk_mb":${acc.maxStageDisk / 1e6}%.0f}""")
    }

    val queryCells = names.map { n =>
      measure(n) {
        val rows = graft.SparkEntry.queries(n)(spark, dir).count()
        spark.catalog.clearCache()
        s""""status":"complete","rows":$rows"""
      }
    }
    val crawlCell =
      if (!sys.env.contains("GRAFT_SPILL_CRAWL")) Seq.empty
      else Seq(measure("crawl_sweep") {
        val (_, packs, chunks, tokens) = CrawlScale.sweep(spark, dir,
          polite = false)
        s""""status":"complete","packs":$packs,"chunks":$chunks,"tokens":$tokens"""
      })

    val cells = (Seq("heap_mb" -> heapMb.toString,
      "dir" -> s""""$dir"""") ++
      (queryCells ++ crawlCell)).map { case (k, v) => s""""$k":$v""" }
    println(cells.mkString("{", ",", "}"))
    spark.stop()
    sys.exit(0)
  }
}
