package graft.tools

import graft.SparkEntry

/** Scaling measurement harness: drive the same registry queries over
  * SEVERAL data directories in ONE session (same JVM, same JIT/codegen
  * state — the only way timings across scale factors are comparable on
  * this VM; see SCALE.md "Bench-noise discipline") and report the
  * steady-state minimum per (dir, query) plus the connected-components
  * round count where the query runs CC internally.
  *
  * Usage: runMain graft.tools.Scale <reps> <q1,q2,...> <dir1> <dir2> ...
  * Prints one PROFILE line per (dir, query) and a final JSON line
  * keyed "dir|query" -> {"min":s, "ccRounds":n}.
  */
object Scale {
  def main(args: Array[String]): Unit = {
    val reps = args(0).toInt
    val names = args(1).split(",").toSeq
    val dirs = args.drop(2).toSeq
    val spark = graft.core.GraftSession.build("graft-scale",
      graft.core.GraftSession.envCores)
    // warmup on the FIRST (smallest) dir so no measured cell pays JIT
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, dirs.head).count()
      catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }
    val cells = for (dir <- dirs; name <- names) yield {
      val fn = SparkEntry.queries(name)
      graft.operators.Dedup.lastCcRounds = -1
      var rows = 0L
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        rows = fn(spark, dir).count()
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        t
      }
      val rounds = graft.operators.Dedup.lastCcRounds
      println(f"SCALE $dir $name%-24s min=${times.min}%.2f " +
        f"reps=${times.map(t => f"$t%.2f").mkString(",")} rows=$rows ccRounds=$rounds")
      s""""$dir|$name":{"min":${times.min},"rows":$rows,"ccRounds":$rounds}"""
    }
    println(cells.mkString("{", ",", "}"))
    spark.stop()
    sys.exit(0)
  }
}
