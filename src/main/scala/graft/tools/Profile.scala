package graft.tools

import graft.SparkEntry

/** Ad-hoc local profiler: run named queries N times each, print per-run
  * wall seconds. Usage: runMain graft.tools.Profile <sfDir> <n> [q1,q2,...] */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val n = args(1).toInt
    val names = if (args.length > 2) args(2).split(",").toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = graft.core.GraftSession.build("graft-profile", graft.core.GraftSession.envCores)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFILE $name%-30s ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
