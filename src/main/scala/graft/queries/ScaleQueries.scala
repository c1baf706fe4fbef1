package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Skew

/** Scale-hardening patterns as runnable queries: skew salting (oracle:
  * identical result to the plain join) and sketch-based distinct
  * counting (no SQL oracle — approximate by design; accuracy asserted
  * in ScaleSpec against the exact count).
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
    // COUNT(DISTINCT) (one pass, fixed memory, mergeable partial aggs)
    "q50_approx_distinct" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_orderkey")).as("approx_orders"),
          count(lit(1)).as("n_rows"))),

    // sketch-based percentiles — the scale twin of exact q55 (exact
    // percentile holds all values per group; the sketch is one pass,
    // bounded memory, mergeable). Rows-only check like q50; accuracy
    // vs the exact quantile asserted in ScaleSpec
    "q68_approx_percentile" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          expr("approx_percentile(o_totalprice, 0.5, 1000)").as("p50_approx"),
          expr("approx_percentile(o_totalprice, 0.9, 1000)").as("p90_approx"),
          count(lit(1)).as("n"))),

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
    // q50 intentionally has no oracle: approximate result
    "q51_asof_join" ->
      """SELECT l.event_id AS click_id, l.user_id,
        |  r.event_id AS view_id, r.value AS view_value
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
        |ASOF LEFT JOIN (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'view') r
        |ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin
  )
}
