package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** AQE-skew-join vs manual salting A/B (verdict r11 ask #7): a planted
  * power-law fact (one hot key holding `hotFrac` of all rows, the rest
  * Zipf-ish over `nKeys`) joined against a non-broadcastable dimension,
  * timed four ways:
  *
  *   broadcast   — the dimension fits: broadcast join, skew is MOOT
  *                 (no shuffle of the fact by key at all)
  *   aqe_default — shuffle join, AQE skew handling at its DEFAULT
  *                 trigger (256 MB / 5x partition-size factor): at
  *                 local test sizes the hot partition never crosses
  *                 the byte threshold, so NOTHING splits — the trap
  *   aqe_tuned   — same join, skewedPartitionThresholdInBytes and
  *                 advisoryPartitionSizeInBytes lowered so the planted
  *                 hot partition actually triggers the split
  *   salted      — Skew.saltedJoin at `buckets`, AQE skew off
  *
  * All four compute the same aggregate and must return the same
  * checksum (equality asserted). Usage:
  *   runMain graft.tools.SkewProbe [rows] [hotFracPct] [nKeys] [buckets]
  * defaults: 20000000 50 100000 32.
  */
object SkewProbe {

  private def fact(spark: SparkSession, rows: Long, hotPct: Int,
                   nKeys: Int): DataFrame =
    spark.range(rows).select(
      when(col("id") % 100 < hotPct, lit(0L))
        // Zipf-ish tail: quadratic id spread concentrates low keys
        .otherwise(pmod(col("id") * col("id") + col("id"), lit(nKeys.toLong)))
        .as("k"),
      (col("id") % 97).as("v"))

  private def dim(spark: SparkSession, nKeys: Int): DataFrame =
    spark.range(nKeys).select(col("id").as("dk"),
      (col("id") * 31 % 1009).as("w"))

  def main(args: Array[String]): Unit = {
    val rows = args.lift(0).map(_.toLong).getOrElse(20000000L)
    val hotPct = args.lift(1).map(_.toInt).getOrElse(50)
    val nKeys = args.lift(2).map(_.toInt).getOrElse(100000)
    val buckets = args.lift(3).map(_.toInt).getOrElse(32)
    val spark = graft.core.GraftSession.build("graft-skew-probe",
      graft.core.GraftSession.envCores)
    import spark.implicits._

    def consume(j: DataFrame): Long =
      j.agg(sum(col("v") * col("w"))).as[Long].head()
    // warmup pass + min of 2 timed reps per variant: the variants run
    // sequentially in one JVM, so without this the first cells carry
    // codegen/JIT warmup and the ordering biases the comparison
    def time[A](f: => A): (A, Double) = {
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val r = f
        (r, (System.nanoTime() - t0) / 1e9)
      }
      require(reps.map(_._1).distinct.size == 1)
      println(reps.map(r => f"${r._2}%.2f").mkString("REPS ", " ", ""))
      (reps.head._1, reps.map(_._2).drop(1).min)
    }
    def withConf[A](pairs: (String, String)*)(f: => A): A = {
      val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      try f finally olds.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    val f = fact(spark, rows, hotPct, nKeys).localCheckpoint(true)
    val d = dim(spark, nKeys).localCheckpoint(true)
    println(s"STAGE fact=$rows rows, hot key 0 holds $hotPct%, dim=$nKeys keys")

    val cells = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    var checksum = 0L

    // 1. broadcast: the first-choice fix whenever the dim fits
    val (c1, t1) = time(consume(f.join(broadcast(d), col("k") === col("dk"))))
    checksum = c1; cells("broadcast_s") = t1

    val noBcast = "spark.sql.autoBroadcastJoinThreshold" -> "-1"
    val noSkew = "spark.sql.adaptive.skewJoin.enabled" -> "false"

    // 2. shuffle join, AQE skew at DEFAULT thresholds
    val (c2, t2) = withConf(noBcast) {
      time(consume(f.join(d, col("k") === col("dk"))))
    }
    require(c2 == checksum); cells("aqe_default_s") = t2

    // 3. shuffle join, AQE skew TUNED to trigger on this data
    val (c3, t3) = withConf(noBcast,
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8m",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4m",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2") {
      time(consume(f.join(d, col("k") === col("dk"))))
    }
    require(c3 == checksum); cells("aqe_tuned_s") = t3

    // 4. manual salt, AQE skew off (isolate the salting effect)
    val (c4, t4) = withConf(noBcast, noSkew) {
      time(consume(graft.operators.Skew.saltedJoin(
        f, d, "k", "dk", col("v"), buckets)))
    }
    require(c4 == checksum); cells("salted_s") = t4

    // 5. shuffle join, NO skew handling at all — the straggler baseline
    val (c5, t5) = withConf(noBcast, noSkew) {
      time(consume(f.join(d, col("k") === col("dk"))))
    }
    require(c5 == checksum); cells("no_mitigation_s") = t5

    println(cells.map { case (k, v) => f""""$k":$v%.2f""" }
      .mkString("{", ",", s""","rows":$rows,"hot_pct":$hotPct}"""))
    spark.stop(); sys.exit(0)
  }
}
