package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Write-side data layout for scan pruning — the storage half of the
  * 100 TB story. Parquet keeps per-row-group min/max statistics;
  * whether a selective filter can SKIP row groups depends entirely on
  * how rows were laid out at write time:
  *
  *  - `clusteredBy`: range-repartition on the clustering keys (each
  *    output file owns a disjoint key range) then sort within
  *    partitions (row groups inside a file own narrow sub-ranges).
  *    Point/range filters on the keys then touch a fraction of files.
  *  - `partitionedBy`: hive-style directory partitioning for LOW
  *    cardinality keys (static/dynamic partition pruning happens at
  *    planning, before any IO).
  *
  * The two compose: partition by the coarse key (e.g. month), cluster
  * by the fine one (e.g. doc id). The reference's history table does
  * the coarse half (dt_partition); this adds the fine half its 100 TB
  * variant would need.
  */
object Layout {

  /** Range-repartition + in-partition sort on `keys`, ready to write:
    * `Layout.clusteredBy(df, n, "k").write.parquet(...)`. */
  def clusteredBy(df: DataFrame, numFiles: Int, keys: String*): DataFrame = {
    val cols: Seq[Column] = keys.map(col)
    df.repartitionByRange(numFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
  }

  /** Small-file compaction: coalesce to the partition count that puts
    * each output file near `targetFileBytes`, sized from Catalyst's
    * own statistics for the plan (an estimate of in-memory row bytes —
    * parquet compresses further, so treat the target as an upper-bound
    * knob, e.g. 512 MB for a 128 MB-file goal). `coalesce` (not
    * `repartition`): compaction must not pay a shuffle — upstream
    * partitions are merged in place, and a plan already below the
    * target count is left unchanged. The operational fix for the
    * many-small-files problem a long-running 100 TB ingest accretes:
    * fewer files = fewer tasks, fewer namenode entries, bigger
    * sequential reads. */
  def compactTo(df: DataFrame, targetFileBytes: Long): DataFrame = {
    require(targetFileBytes > 0, "targetFileBytes > 0")
    // stats.sizeInBytes is a BigInt and can be astronomically large
    // (unknown-stats leaves default to Long.MaxValue and multiply
    // through joins) — do the ceiling AND the cap in BigInt; a .toLong
    // first would wrap and could silently coalesce a huge frame to 1
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val n = ((bytes + targetFileBytes - 1) / targetFileBytes)
      .max(BigInt(1)).min(BigInt(Int.MaxValue)).toInt
    df.coalesce(n)
  }

  /** Hash-bucketed managed-table write — the layout that makes the
    * recurring 100 TB JOIN exchange-free: two tables bucketed on the
    * same key into the same bucket count are co-partitioned at REST,
    * so a sort-merge join between them needs NO shuffle of either
    * side (and with `sortBy` on the bucket key, no sort either —
    * the scan feeds SMJ directly). This is the persistent form of
    * what `repartition` buys for one query: pay the partitioning
    * once at write, amortize it over every subsequent join/aggregate
    * on that key — fact-to-fact joins too big to broadcast are
    * exactly where a 100 TB pipeline lives. (Spark's bucketing is
    * metastore metadata — `bucketBy` requires `saveAsTable`, not a
    * path write; LayoutSpec asserts the exchange-free plan.) */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    key: String, moreKeys: String*): Unit = {
    require(buckets >= 1, "buckets >= 1")
    df.write.format("parquet")
      .bucketBy(buckets, key, moreKeys: _*)
      .sortBy(key, moreKeys: _*)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Z-order clustering for MULTI-dimensional pruning: [[clusteredBy]]
    * on (a, b) prunes perfectly on `a` but barely on `b` (lexicographic
    * ranges leave b's per-file span at full width). Interleaving the
    * bits of both keys into one Morton code and range-writing on THAT
    * gives every file a narrow span on EVERY key — selective filters
    * on either dimension skip most files via parquet min/max stats
    * (the layout behind Delta/Iceberg OPTIMIZE ZORDER).
    *
    * Numeric keys are affinely scaled onto `bits`-bit grid cells using
    * a one-row min/max aggregate (driver scalars, same budget class as
    * a Bloom sketch — never the rows). The interleave itself is a pure
    * shift/mask expression chain, codegen'd; the z column is dropped
    * after the repartition+sort so the written schema is unchanged.
    */
  def zorderBy(df: DataFrame, numFiles: Int, bits: Int, keys: String*): DataFrame = {
    require(keys.nonEmpty && bits * keys.length <= 62,
      "need keys and bits*keys <= 62")
    import org.apache.spark.sql.functions._
    val aggs = keys.flatMap(k => Seq(
      min(col(k)).cast("double").as(s"mn_$k"),
      max(col(k)).cast("double").as(s"mx_$k")))
    val statRow = df.agg(aggs.head, aggs.tail: _*).head()
    val cells = (1L << bits) - 1
    val scaled = keys.map { k =>
      val mn = statRow.getAs[Double](s"mn_$k")
      val mx = statRow.getAs[Double](s"mx_$k")
      val span = math.max(mx - mn, java.lang.Double.MIN_VALUE)
      least(greatest(
        ((col(k).cast("double") - lit(mn)) / lit(span) * cells).cast("long"),
        lit(0L)), lit(cells))
    }
    val z = (0 until bits).foldLeft(lit(0L)) { (acc, b) =>
      scaled.zipWithIndex.foldLeft(acc) { case (a, (s, i)) =>
        a.bitwiseOR(shiftleft(s.bitwiseAND(lit(1L << b)).cast("long"),
          b * (keys.length - 1) + i).cast("long"))
      }
    }
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
