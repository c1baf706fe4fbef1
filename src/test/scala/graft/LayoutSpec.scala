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

  test("zorderBy narrows per-file spans on BOTH keys; lex clustering does not") {
    import spark.implicits._
    // two independent uniform keys: lexicographic clustering on (a, b)
    // leaves b's per-file span at full width; z-order narrows both
    val n = 65536
    val rnd = new scala.util.Random(42)
    val df = (1 to n).map(_ => (rnd.nextInt(1024), rnd.nextInt(1024)))
      .toDF("a", "b").repartition(16)

    def fileSpans(dir: String, key: String): Seq[Long] =
      spark.read.parquet(dir)
        .select(input_file_name().as("f"), col(key))
        .groupBy("f").agg((max(key) - min(key)).cast("long").as("span"))
        .collect().map(_.getAs[Long]("span")).toSeq

    val lexDir = java.nio.file.Files.createTempDirectory("graft_lex").toString
    Layout.clusteredBy(df, 16, "a", "b").write.mode("overwrite").parquet(lexDir)
    val zDir = java.nio.file.Files.createTempDirectory("graft_z").toString
    Layout.zorderBy(df, 16, 8, "a", "b").write.mode("overwrite").parquet(zDir)

    def avg(xs: Seq[Long]) = xs.sum.toDouble / xs.size
    // lex: a is tightly clustered, b spans ~the full 1024 range per file
    assert(avg(fileSpans(lexDir, "b")) > 900.0)
    // z-order: 16 files over an 8-bit x 8-bit grid → each file covers
    // about a quarter of each dimension; both spans must shrink
    assert(avg(fileSpans(zDir, "a")) < 600.0)
    assert(avg(fileSpans(zDir, "b")) < 600.0)
    // written schema is unchanged (the z column is internal)
    assert(spark.read.parquet(zDir).columns.toSet == Set("a", "b"))
  }

  test("compactTo merges small files without a shuffle; content unchanged") {
    import spark.implicits._
    val smallDir = java.nio.file.Files.createTempDirectory("graft_small").toString
    // 20 tiny files
    (1 to 2000).map(i => (i, s"row$i")).toDF("id", "v")
      .repartition(20).write.mode("overwrite").parquet(smallDir)
    // (Spark's file packing already merges tiny files into read splits,
    // so the read has >1 but <20 partitions; compactTo takes it to 1)
    val in = spark.read.parquet(smallDir)
    val inParts = in.rdd.getNumPartitions
    assert(inParts > 1)
    val compact = graft.sources.Layout.compactTo(in, 1L << 20)
    // fewer partitions than input; content identical
    assert(compact.rdd.getNumPartitions < inParts)
    assert(compact.count() == 2000)
    assert(compact.agg(sum(col("id"))).head.getLong(0) == 2000L * 2001 / 2)
    // coalesce, not repartition: no exchange in the plan
    val planStr = compact.queryExecution.executedPlan.toString
    assert(!planStr.contains("Exchange"), s"compaction must not shuffle:\n$planStr")
  }

  test("writeBucketed: co-bucketed tables join with ZERO exchanges") {
    import spark.implicits._
    val left = (1 to 5000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (1 to 5000).map(i => (i.toLong, i * 2)).toDF("k", "rv")
    graft.sources.Layout.writeBucketed(left, "graft_bkt_l", 8, "k")
    graft.sources.Layout.writeBucketed(right, "graft_bkt_r", 8, "k")
    try {
      // force SMJ so the assertion is about bucketing, not broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      val j = spark.table("graft_bkt_l")
        .join(spark.table("graft_bkt_r"), Seq("k"))
      assert(j.count() == 5000)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"co-bucketed join must be exchange-free:\n$plan")
      // the same join over plain (unbucketed) reads DOES exchange —
      // the delta is what the at-rest layout buys
      val plainL = java.nio.file.Files.createTempDirectory("graft_pl").toString
      val plainR = java.nio.file.Files.createTempDirectory("graft_pr").toString
      left.write.mode("overwrite").parquet(plainL)
      right.write.mode("overwrite").parquet(plainR)
      val pj = spark.read.parquet(plainL)
        .join(spark.read.parquet(plainR), Seq("k"))
      pj.count()
      assert(pj.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_l")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_r")
    }
  }
}
