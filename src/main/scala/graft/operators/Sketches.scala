package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stored mergeable sketches — incremental corpus statistics that
  * never rescan history. `approx_count_distinct` (q50) answers a
  * one-shot query; at 100 TB the operational need is different: each
  * ingest batch summarizes itself ONCE into a compact sketch row, the
  * sketch table persists (kilobytes per key×batch), and any later
  * "distinct users over any batch range?" merges sketches instead of
  * re-reading the raw data — the same probe-compact-state discipline
  * as [[Dedup.dedupState]], applied to cardinality.
  *
  * Uses Spark's built-in Apache DataSketches HLL functions
  * (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`) —
  * codegen'd aggregates with mergeable partials, no UDF.
  */
object Sketches {

  /** Per (keys × batch) HLL sketch of `valueCol`, plus the exact
    * per-batch row count. One linear pass over the batch; the output
    * is the durable artifact (binary sketch ≤ ~2^lgK bytes/row). */
  def hllBatchSketches(df: DataFrame, batch: Column, keyCols: Seq[String],
                       valueCol: String, lgK: Int = 12): DataFrame =
    df.groupBy(keyCols.map(col) :+ batch.as("batch"): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"),
        count(lit(1)).as("n_rows"))

  /** Merge the stored sketches per key: distinct-count estimate over
    * every covered batch without touching raw history. Shuffles one
    * sketch per key×batch — never values. */
  def hllMergeEstimate(sketches: DataFrame, keyCols: Seq[String]): DataFrame =
    sketches.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_batches"),
        sum(col("n_rows")).as("n_rows"),
        hll_sketch_estimate(hll_union_agg(col("sketch"))).as("approx_distinct"))
}
