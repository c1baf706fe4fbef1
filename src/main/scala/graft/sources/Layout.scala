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
}
