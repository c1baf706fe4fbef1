package graft.tools

import org.apache.spark.sql.functions._

/** Scratch probe: does localCheckpoint preserve hash partitioning in
  * the LogicalRDD under AQE on/off? (round-17 investigation) */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.build("graft-partprobe", 4)
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, i % 7)).toDF("k", "v")

    def probe(tag: String): Unit = {
      val ck = df.repartition(col("k")).localCheckpoint(true)
      val agg = ck.groupBy("k").agg(sum("v"))
      agg.collect()
      val plan = agg.queryExecution.executedPlan.toString
      val n = "Exchange".r.findAllIn(plan).length
      println(s"PROBE $tag exchanges=$n")
      println(ck.queryExecution.executedPlan.toString.linesIterator
        .filter(_.contains("Partitioning")).take(3).mkString("\n"))
      println(plan)
    }

    probe("aqe_on")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    probe("aqe_off")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    probe("aqe_back_on")

    // build the checkpoint AQE-OFF, consume it AQE-ON (the production
    // pattern a partition-pinned barrier helper would use)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val ck2 = df.repartition(col("k")).localCheckpoint(true)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val agg2 = ck2.groupBy("k").agg(sum("v"))
    agg2.collect()
    val plan2 = agg2.queryExecution.executedPlan.toString
    println(s"PROBE build_off_consume_on exchanges=" +
      "Exchange".r.findAllIn(plan2).length)
    println(plan2)
    // and a JOIN of two co-partitioned checkpoints
    val ck3 = df.select(col("k"), (col("v") * 2).as("w"))
      .repartition(col("k")).localCheckpoint(true)
    val j = ck2.join(ck3, Seq("k"))
    j.collect()
    val plan3 = j.queryExecution.executedPlan.toString
    println(s"PROBE copart_join exchanges=" +
      "Exchange".r.findAllIn(plan3).length)
    println(plan3)
    spark.stop()
  }
}
