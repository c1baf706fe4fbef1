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
          count(lit(1)).as("n_rows")))
  )

  val oracles: Map[String, String] = Map(
    "q49_salted_join" ->
      """SELECT p_brand, sum(l_quantity) AS sum_qty, count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_type = 'ECONOMY' GROUP BY p_brand""".stripMargin
    // q50 intentionally has no oracle: approximate result
  )
}
