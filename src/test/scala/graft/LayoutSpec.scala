package graft

import org.apache.spark.sql.functions._
import graft.sources.Layout

/** The layout contract: clustered writes produce disjoint per-file key
  * ranges, and a selective key filter on the read side then skips most
  * files via parquet min/max stats. */
class LayoutSpec extends SparkTestBase {

  test("clusteredBy yields disjoint file key ranges; point reads skip files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_layout").toString
    val df = (1 to 50000).map(i => (i, s"payload-$i")).toDF("k", "v")
      .repartition(16) // scrambled input layout
    Layout.clusteredBy(df, numFiles = 8, "k").write.mode("overwrite").parquet(dir)

    // each parquet file owns a disjoint contiguous range of k
    val ranges = spark.read.parquet(dir)
      .select(input_file_name().as("f"), col("k"))
      .groupBy("f").agg(min("k").as("lo"), max("k").as("hi"), count(lit(1)).as("n"))
      .collect().map(r => (r.getAs[Int]("lo"), r.getAs[Int]("hi"), r.getAs[Long]("n")))
      .sortBy(_._1)
    assert(ranges.length == 8)
    ranges.sliding(2).foreach { case Array(a, b) => assert(a._2 < b._1); case _ => }
    assert(ranges.map(_._3).sum == 50000L)

    // a point filter must reach the scan as a pushed filter (row-group
    // stats + the disjoint ranges then bound IO to ~1 file of 8)
    val plan = spark.read.parquet(dir).filter(col("k") === 25000)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(k), EqualTo(k,25000)]"), plan)
  }
}
