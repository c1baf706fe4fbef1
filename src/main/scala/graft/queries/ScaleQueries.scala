package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Skew

/** Scale-hardening patterns as runnable queries: skew salting (oracle:
  * identical result to the plain join) and sketch-based distinct /
  * percentile counting (tolerance oracles: exact columns cross-engine
  * checked, sketch values asserted within their documented error bound
  * via a boolean the oracle side pins TRUE; ScaleSpec additionally
  * asserts the raw bounds).
  */
object ScaleQueries {

  val SaltBuckets = 8
  val BloomExpectedItems = 100000L
  val BloomFpp = 0.03

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(

    // salted equi-join: same result as the plain broadcast join in
    // q07 — the salt only changes the shuffle topology
    "q49_salted_join" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val p = Tables.load(s, dir, "part").filter(col("p_type") === "ECONOMY")
      Skew.saltedJoin(li, p, "l_partkey", "p_partkey",
          saltSource = col("l_orderkey"), buckets = SaltBuckets)
        .groupBy(col("p_brand"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_items"))
    }),

    // HLL-sketch distinct counting — the 100 TB replacement for exact
    // COUNT(DISTINCT) (one pass, fixed memory, mergeable partial aggs).
    // Tolerance oracle: the row carries the EXACT distinct count
    // (cross-engine checked against DuckDB) plus a boolean asserting
    // the sketch landed within 5% of it — if the sketch ever drifts
    // out of bound the flag flips false and the hash-compare fails,
    // so the approximate path is gated, not merely rows-counted
    "q50_approx_distinct" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("approx"),
          countDistinct(col("l_orderkey")).as("exact_orders"),
          count(lit(1)).as("n_rows"))
        .select(col("l_returnflag"), col("exact_orders"), col("n_rows"),
          (abs(col("approx") - col("exact_orders")).cast("double") /
            col("exact_orders") <= 0.05).as("within_5pct"))),

    // sketch-based percentiles — the scale twin of exact q55 (exact
    // percentile holds all values per group; the sketch is one pass,
    // bounded memory, mergeable). Same tolerance-oracle shape as q50:
    // exact quantiles cross-engine checked, sketch asserted within 2%
    "q68_approx_percentile" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          expr("approx_percentile(o_totalprice, 0.5, 1000)").as("a50"),
          expr("approx_percentile(o_totalprice, 0.9, 1000)").as("a90"),
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50_exact"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90_exact"),
          count(lit(1)).as("n"))
        .select(col("o_orderstatus"), col("p50_exact"), col("p90_exact"),
          col("n"),
          (abs(col("a50") - col("p50_exact")) / col("p50_exact") <= 0.02)
            .as("p50_within_2pct"),
          (abs(col("a90") - col("p90_exact")) / col("p90_exact") <= 0.02)
            .as("p90_within_2pct"))),

    // Bloom-prefiltered semi join (Skew.bloomSemiJoin): the sketch
    // probe drops non-matching fact rows before the join shuffle; the
    // exact semi join removes false positives, so the plain semi join
    // is the oracle
    "q81_bloom_semi" -> ((s, dir) => {
      val dim = Tables.load(s, dir, "customer")
        .filter(col("c_mktsegment") === "MACHINERY")
        .select(col("c_custkey"))
      Skew.bloomSemiJoin(Tables.load(s, dir, "orders"), "o_custkey",
          dim, "c_custkey", BloomExpectedItems, BloomFpp)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total"))
    }),

    // as-of join: attribute each click to the latest prior-or-equal
    // view by the same user (single-shuffle union+window composition)
    "q51_asof_join" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
      val clicks = e.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val views = e.filter(col("event_type") === "view")
        .select("user_id", "ts", "event_id", "value")
      graft.operators.Relational
        .asofJoin(clicks, views, "user_id", "ts", Seq("event_id", "value"))
        .select(col("event_id").as("click_id"), col("user_id"),
          col("r_event_id").as("view_id"), col("r_value").as("view_value"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q49_salted_join" ->
      """SELECT p_brand, sum(l_quantity) AS sum_qty, count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_type = 'ECONOMY' GROUP BY p_brand""".stripMargin,
    "q81_bloom_semi" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'MACHINERY')
        |GROUP BY o_orderpriority""".stripMargin,
    // tolerance oracles: the exact columns are computed by DuckDB too;
    // the within-bound flags are TRUE on the oracle side, so a Spark
    // sketch outside its documented bound hash-mismatches
    "q50_approx_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_orderkey) AS exact_orders,
        |  count(*) AS n_rows, TRUE AS within_5pct
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q68_approx_percentile" ->
      """SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50_exact,
        |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90_exact,
        |  count(*) AS n,
        |  TRUE AS p50_within_2pct, TRUE AS p90_within_2pct
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q51_asof_join" ->
      """SELECT l.event_id AS click_id, l.user_id,
        |  r.event_id AS view_id, r.value AS view_value
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
        |ASOF LEFT JOIN (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'view') r
        |ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin
  )
}
