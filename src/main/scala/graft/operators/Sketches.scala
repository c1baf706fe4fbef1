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

  /** Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005):
    * the frequency companion to the HLL cardinality sketch above —
    * a d×w counter matrix answering "how often did THIS item occur?"
    * in O(d) per probe with one-sided error (never under, over by at
    * most εN with probability 1−δ; w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉).
    *
    * Built from the per-item exact-count table, not the raw token
    * stream: at 100 TB the map-side-combined (item, n) aggregate is
    * the expensive pass a corpus makes anyway (q79), and the sketch
    * is then a SECOND tiny aggregate of d·|vocab| rows into d·w
    * counters. The matrix is the durable mergeable artifact (cell-
    * wise SUM merges batches — same discipline as the HLL table);
    * probes touch d rows each via a broadcast join.
    *
    * The d hash rows are [[graft.functions.PortableHash]] with the
    * row index as salt — fully deterministic, so unlike probabilistic
    * sketches the whole matrix (and every estimate) is a pure
    * function of the corpus and replays EXACTLY in the SQL oracle:
    * the demo's hash-match proves the estimate rule, and the
    * `est ≥ exact` one-sided bound is pinned per probe. */
  def cmsSketch(counts: DataFrame, itemCol: String, countCol: String,
                d: Int, w: Int): DataFrame = {
    require(d >= 1 && w >= 2, "need at least one hash row, two buckets")
    val rows = array((0 until d).map(i => struct(lit(i).as("r"),
      cmsBucket(col(itemCol), i, w).as("b"))): _*)
    counts.select(explode(rows).as("rb"), col(countCol).as("__n"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(sum(col("__n")).as("cnt"))
  }

  /** The row-`i` bucket of an item: md5-family hash, row index as
    * salt — the same portable-hash shape every sampler uses. */
  def cmsBucket(item: Column, row: Int, w: Int): Column =
    pmod(graft.functions.PortableHash.hash60(
      concat(lit(s"cms$row|"), item)), lit(w))

  /** SQL twin of [[cmsBucket]] for oracle generation. */
  def cmsBucketSql(itemExpr: String, row: Int, w: Int): String =
    s"${graft.functions.PortableHash.hash60Sql(s"concat('cms$row|', $itemExpr)")} % $w"

  /** Point-query the matrix for each probe item: estimate =
    * min over rows of the item's bucket counter (items never stored —
    * a probe for an unseen item reads hash-collision noise, the
    * sketch's documented semantics). The matrix (d·w rows) rides a
    * broadcast; missing cells read 0. */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame,
                  itemCol: String, d: Int, w: Int): DataFrame = {
    val rb = probes.select(col(itemCol), explode(array((0 until d).map(i =>
      struct(lit(i).as("r"), cmsBucket(col(itemCol), i, w).as("b"))): _*))
      .as("rb"))
      .select(col(itemCol), col("rb.r").as("r"), col("rb.b").as("b"))
    rb.join(broadcast(sketch), Seq("r", "b"), "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }
}
