package graft.tools

import org.apache.spark.sql.functions._

/** Pin-vs-nopin diagnosis for the iterative graph loops at scale
  * (round 18): run q115's pageRank edges at a given dir, time each
  * iteration, and dump the FINAL ranks' executed plan so the
  * per-iteration join strategy (SMJ + per-iteration Sort vs exchange +
  * shuffled-hash) is visible for both arms. The pin arm is selected by
  * GRAFT_PIN_MIN_PARTITIONS as in production.
  *
  * Usage: runMain graft.tools.PinProbe <dir> <iters>
  */
object PinProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val iters = if (args.length > 1) args(1).toInt else 6
    println(f"PROBE calib ${graft.Bench.calibrate()}%.3f s")
    val spark = graft.core.GraftSession.build("graft-pin-probe",
      graft.core.GraftSession.envCores)
    val li = graft.core.Tables.load(spark, dir, "lineitem")
      .select(col("l_suppkey").cast("long").as("sn"),
        (col("l_partkey").cast("long") + lit(10000000L)).as("pn"))
    val edges = li.select(col("sn").as("src"), col("pn").as("dst"))
      .union(li.select(col("pn").as("src"), col("sn").as("dst")))
    // statics-only baseline: iters=1 call covers statics + 1 round
    val tS0 = System.nanoTime()
    graft.operators.Graph.pageRank(edges, "src", "dst", 1, 0.85).count()
    val tS = (System.nanoTime() - tS0) / 1e9
    println(f"PROBE statics+1round wall=$tS%.1f s")
    (1 to 2).foreach { rep =>
      val t0 = System.nanoTime()
      val ranks = graft.operators.Graph.pageRank(edges, "src", "dst",
        iters, 0.85)
      val t1 = (System.nanoTime() - t0) / 1e9
      val n = ranks.count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"PROBE pageRank rep$rep dir=$dir iters=$iters rows=$n " +
        f"call=$t1%.1f wall=$t%.1f s " +
        s"pinMin=${graft.operators.GraftCheckpoint.PinMinPartitions}")
      if (rep == 1) println(ranks.queryExecution.executedPlan.toString)
    }
    spark.stop()
    sys.exit(0)
  }
}
