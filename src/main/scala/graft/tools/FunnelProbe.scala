package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Funnel formulation A/B at scale (verdict r10 ask #7): the registry
  * funnel (Relational.funnel) pays ONE user-keyed shuffle PER STEP —
  * at 6+ steps a single collect-per-user + linear-scan formulation
  * (one shuffle total, then a pure aggregate() expression over each
  * user's time-sorted events) may win. Both compute the SAME
  * fixed-earliest-anchor greedy semantics; this probe asserts
  * result equality, times both at 3 and 6 steps across the given
  * dirs, and prints a JSON line for SCALE.md.
  *
  * The array form's trade: the shuffle carries every funnel-typed
  * event into one row per user (collect_list), so its memory bound
  * is the max per-user event count — fine for bounded user activity,
  * hostile to a single synthetic mega-user. The join-chain form
  * never materializes per-user arrays and its frames SHRINK down the
  * funnel. The law this probe measures: which effect dominates at
  * 100x events, and at what step count the crossover sits.
  *
  * Usage: runMain graft.tools.FunnelProbe <dir1> [dir2 ...]
  */
object FunnelProbe {

  /** Single-shuffle array-scan funnel, fixed-earliest-anchor greedy
    * (bit-equal semantics to [[Relational.funnel]]). Output:
    * (step_idx, users-reaching-step) rows, same as the operator after
    * cumulating. */
  def funnelArray(df: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, steps: Seq[String],
                  windowMicros: Long): DataFrame = {
    val n = steps.length
    val stepsArr = array(steps.map(lit): _*)
    val base = df.filter(col(typeCol).isin(steps.distinct: _*))
      .select(col(userCol).as("__u"), col(typeCol).as("__t"),
        unix_micros(col(tsCol)).as("__m"))
    val byUser = base.groupBy(col("__u"))
      .agg(sort_array(collect_list(struct(col("__m"), col("__t"))))
        .as("evs"))
    def scan(evs: Column): Column =
      aggregate(evs,
        struct(lit(0).as("lvl"), lit(0L).as("m0"), lit(0L).as("mp")),
        (acc, e) => {
          val lvl = acc.getField("lvl")
          val m0 = acc.getField("m0"); val mp = acc.getField("mp")
          val m = e.getField("__m"); val t = e.getField("__t")
          // least() clamp keeps element_at in bounds under ANSI when
          // the user has already finished the funnel
          val want = element_at(stepsArr, least(lvl + 1, lit(n)))
          when(lvl === 0 && t === want,
            struct((lvl + 1).as("lvl"), m.as("m0"), m.as("mp")))
            .when(lvl > 0 && lvl < n && t === want &&
              m > mp && m <= m0 + lit(windowMicros),
              struct((lvl + 1).as("lvl"), m0.as("m0"), m.as("mp")))
            .otherwise(acc)
        })
    byUser.select(scan(col("evs")).getField("lvl").as("lvl"))
      .groupBy(col("lvl")).agg(count(lit(1)).as("n"))
  }

  /** Users reaching each step, from either form, as a comparable map. */
  private def reached(perLevel: Map[Int, Long], nSteps: Int): Map[Int, Long] =
    (0 until nSteps).map { i =>
      i -> perLevel.filter(_._1 > i).values.sum
    }.toMap

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "at least one data dir")
    val spark = graft.core.GraftSession.build("graft-funnel-probe",
      graft.core.GraftSession.envCores)
    val w = 3L * 24 * 3600 * 1000000L
    val steps3 = Seq("view", "click", "purchase")
    val steps6 = Seq("view", "click", "purchase", "view", "click", "purchase")
    val cells = for (dir <- args.toSeq; steps <- Seq(steps3, steps6)) yield {
      val ev = graft.core.Tables.load(spark, dir, "events")
      def timeIt[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime(); val r = f
        (r, (System.nanoTime() - t0) / 1e9)
      }
      // warm both paths once so the cells compare steady-state plans
      Relational.funnel(ev, "user_id", "event_type", "ts", steps, Some(w)).count()
      funnelArray(ev, "user_id", "event_type", "ts", steps, w).count()
      val (chainRows, tChain) = timeIt(
        Relational.funnel(ev, "user_id", "event_type", "ts", steps, Some(w))
          .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap)
      val (arrRows, tArr) = timeIt(
        funnelArray(ev, "user_id", "event_type", "ts", steps, w)
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap)
      val arrReached = reached(arrRows, steps.length)
        .filter(_._2 > 0)
      require(chainRows == arrReached,
        s"forms disagree at $dir/${steps.length}: $chainRows vs $arrReached")
      println(f"STAGE $dir%-24s steps=${steps.length} " +
        f"chain=$tChain%.2f s array=$tArr%.2f s (equal results)")
      s""""$dir/s${steps.length}":{"chain_s":$tChain,"array_s":$tArr}"""
    }
    // round-12 stage: the SLIDING funnel's sorted-iterator kernel
    // under a planted 10⁶-event mega-user (verdict r11 ask #2). The
    // mega-user cycles view→click→purchase every 7s for 81 days —
    // ~37k frontier states live per 3-day window vs 10⁶ events — so
    // a kernel that materialized the user's array would hold 10⁶
    // rows in one task, while the streaming form holds the window.
    // Counts must be exactly base+1 per step (the mega-user converts).
    val megaCells = for (dir <- args.toSeq) yield {
      val ev = graft.core.Tables.load(spark, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"))
      val mega = spark.range(1000000L).select(
        lit(999999999L).as("user_id"),
        element_at(array(lit("view"), lit("click"), lit("purchase")),
          (col("id") % 3).cast("int") + 1).as("event_type"),
        timestamp_micros(col("id") * 7000000L).as("ts"))
      def timeIt[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime(); val r = f
        (r, (System.nanoTime() - t0) / 1e9)
      }
      def run(df: DataFrame): Map[Int, Long] =
        Relational.funnelSliding(df, "user_id", "event_type", "ts",
            steps3, w)
          .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
      run(ev) // warm
      val (base, tBase) = timeIt(run(ev))
      val (withMega, tMega) = timeIt(run(ev.unionByName(mega)))
      require(withMega == base.map { case (k, v) => k -> (v + 1) },
        s"mega-user must add exactly 1 per step: $base vs $withMega")
      println(f"STAGE sliding+mega $dir%-24s base=$tBase%.2f s " +
        f"mega=$tMega%.2f s (counts base+1 at every step)")
      s""""$dir/sliding_mega":{"base_s":$tBase,"mega_s":$tMega}"""
    }
    println((cells ++ megaCells).mkString("{", ",", "}"))
    spark.stop()
    sys.exit(0)
  }
}
