package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Relational

/** Relational operator inventory (SURVEY.md §2) re-expressed over the
  * TPC-H-ish test tables. Each query exercises one operator family from
  * the reference and carries a DuckDB oracle for the hash-compare gate.
  *
  * Scale notes: every aggregate keeps partial (map-side) combine, every
  * small-dimension join is broadcast, and floating-point aggregates are
  * rounded at the output boundary so results are engine-order-independent.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A1/A3 — hash aggregate with multiple measures (TPC-H Q1 flavor;
    // reference grouped aggregates e.g. alerta_abr1.py:43-52).
    "q01_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2000-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // P4 — SQL-string filters (=, !=, >, AND; reference alerta_bdpa.py:25).
    "q02_filter_sql" -> ((s, dir) => {
      t(s, dir, "orders")
        .filter("o_orderstatus = 'O' and o_totalprice > 100000 and o_orderpriority != '1-URGENT'")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    }),

    // P5/P6 — Column-form isin membership (reference alerta_dt2i.py:34-35).
    "q03_filter_isin" -> ((s, dir) => {
      t(s, dir, "part")
        .filter(col("p_brand").isin("Brand#1", "Brand#5", "Brand#12") &&
          col("p_size").isin(1, 5, 10, 15, 20, 25))
        .select("p_partkey", "p_brand", "p_size")
    }),

    // P8 — multi-branch CASE WHEN incl. NULL-producing branch
    // (reference jobs.py:213-236, alerta_prcr.py:221-234).
    "q04_case_when" -> ((s, dir) => {
      t(s, dir, "orders").select(
        col("o_orderkey"),
        when(col("o_totalprice") < 50000, "small")
          .when(col("o_totalprice") < 150000, "medium")
          .otherwise("large").as("bucket"),
        when(col("o_orderpriority") === "1-URGENT", 1)
          .when(col("o_orderpriority") === "2-HIGH", 2).as("prio_rank"))
    }),

    // J1 — inner equi join + aggregate (reference alerta_bdpa.py:36).
    "q05_join_inner" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("revenue"))
    }),

    // J2 — left outer join preserving unmatched left rows
    // (reference alerta_bdpa.py:28-34).
    "q06_join_left" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
    }),

    // J3 — explicit broadcast-hinted join of a filtered small dim
    // (reference alerta_dctj.py:37-45).
    "q07_join_broadcast" -> ((s, dir) => {
      val p = t(s, dir, "part").filter(col("p_type") === "ECONOMY")
      t(s, dir, "lineitem")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_items"))
    }),

    // J4 — left anti join (reference emulates with LEFT JOIN + IS NULL,
    // jobs.py:203-245; native form is cleaner and skips the null filter).
    "q08_join_anti" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    }),

    // J10 — left semi join as existence filter (reference uses inner join
    // + distinct, alerta_dctj.py:38; semi avoids the duplicate blow-up).
    "q09_join_semi" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").filter(col("l_shipdate") >= lit("2001-01-01"))
      t(s, dir, "supplier")
        .join(li, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    }),

    // J5 — equi join with additional range conjunct (reference
    // alerta_dctj.py:50-56 date-theta joins).
    "q10_join_range" -> ((s, dir) => {
      val o = t(s, dir, "orders"); val li = t(s, dir, "lineitem")
      li.join(o, li("l_orderkey") === o("o_orderkey") &&
          datediff(li("l_shipdate"), o("o_orderdate")) > lit(400))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("late_items"))
    }),

    // J6 — cross join fan-out (reference alerta_comp.py:36).
    "q11_cross_join" -> ((s, dir) => {
      t(s, dir, "region").crossJoin(t(s, dir, "nation"))
        .select(col("r_name"), col("n_name"))
    }),

    // J7 — max-per-group via groupBy + join-back, tie-keeping semantics
    // (reference alerta_bdpa.py:40-51).
    "q12_max_per_group_joinback" -> ((s, dir) => {
      Relational.maxPerGroupJoinBack(t(s, dir, "orders"), "o_custkey", "o_orderdate")
        .select("o_orderkey", "o_custkey", "o_orderdate")
    }),

    // §2.5 — the idiomatic window replacement for J7 with deterministic
    // tie-break (scale path: one shuffle instead of two).
    "q13_max_per_group_window" -> ((s, dir) => {
      Relational.latestPerGroup(t(s, dir, "orders"), Seq("o_custkey"),
          Seq(col("o_orderdate").desc, col("o_orderkey").asc))
        .select("o_custkey", "o_orderkey", "o_orderdate")
    }),

    // J8 — every group compared against one reference row
    // (reference alerta_isps.py:76,111 state-row comparison).
    "q14_ref_row_compare" -> ((s, dir) => {
      val per = t(s, dir, "customer")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"), round(avg(col("c_acctbal")), 4).as("avg_bal"))
      val ref = per.filter(col("c_nationkey") === 0)
        .select(col("avg_bal").as("ref_bal"))
      per.filter(col("c_nationkey") =!= 0)
        .crossJoin(broadcast(ref))
        .select(col("c_nationkey"), col("n_cust"),
          round(col("avg_bal") - col("ref_bal"), 4).as("bal_vs_ref"))
    }),

    // U1 — positional union of conformed branches (reference
    // alerta_gate.py:38; schemas asserted equal by construction here).
    "q15_union" -> ((s, dir) => {
      val c = t(s, dir, "customer")
        .select(col("c_custkey").as("id"), col("c_acctbal").as("bal"), lit("customer").as("kind"))
      val sup = t(s, dir, "supplier")
        .select(col("s_suppkey").as("id"), col("s_acctbal").as("bal"), lit("supplier").as("kind"))
      c.union(sup)
    }),

    // U2 — unpivot as single-pass stack (reference's 4-branch UNION ALL
    // unpivot, alerta_isps.py:78-92, without re-scanning the input).
    "q16_unpivot" -> ((s, dir) => {
      Relational.unpivot(t(s, dir, "lineitem"), Seq("l_orderkey"),
          Seq("qty" -> "l_quantity", "price" -> "l_extendedprice", "disc" -> "l_discount"))
        .groupBy(col("measure"))
        .agg(round(sum(col("val")), 2).as("total"), count(lit(1)).as("n"))
    }),

    // A8 — row dedup via distinct (reference alerta_bdpa.py:97).
    "q17_distinct" -> ((s, dir) => {
      t(s, dir, "customer").select("c_nationkey", "c_mktsegment").distinct()
    }),

    // A5 — COUNT(DISTINCT) (reference alerta_ro.py:35-36).
    "q18_count_distinct" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("n_cust"), count(lit(1)).as("n_orders"))
    }),

    // A4 — HAVING as post-aggregate filter (reference alerta_nf30.py:62).
    "q19_having" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 40)
    }),

    // A6 — product aggregate via EXP(SUM(LN)) (reference alerta_prcr.py:54);
    // emitted as the log-sum so the comparison is fp-stable.
    "q20_product_logsum" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(round(sum(log(col("l_quantity"))), 6).as("log_qty_product"),
          count(lit(1)).as("n_items"))
    }),

    // A7 — list aggregate flattened to string; reference order is
    // nondeterministic (alerta_prcr.py:54), ours sorts first (SURVEY §7.3).
    "q21_collect_sorted" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(concat_ws(",", sort_array(collect_set(col("o_orderpriority")))).as("prios"))
    }),

    // P9 — coalesce over join-produced NULLs (reference alerta_bdpa.py:62-69).
    "q22_coalesce" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .select(col("c_custkey"),
          coalesce(col("o_orderkey"), lit(-1L)).as("order_or_default"),
          coalesce(col("o_totalprice"), lit(0.0)).as("price_or_zero"))
    }),

    // P10 + string fns — substring / cast / upper (reference alerta_ro.py:28-36).
    "q23_cast_substring" -> ((s, dir) => {
      t(s, dir, "customer").select(
        col("c_custkey"),
        substring(col("c_name"), 10, 9).cast("int").as("name_num"),
        upper(col("c_mktsegment")).as("seg"),
        concat_ws("|", col("c_name"), col("c_mktsegment")).as("tagged"))
    }),

    // §2.7 date/time — datediff, date_add, add_months, last_day, year,
    // month (reference alerta_prcr.py:90-91, alerta_abr1.py:32-38).
    // All date outputs rendered as strings for cross-engine stability.
    "q24_date_arith" -> ((s, dir) => {
      t(s, dir, "orders").select(
        col("o_orderkey"),
        datediff(lit("2000-12-31").cast("date"), col("o_orderdate")).as("age_days"),
        date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("due_date"),
        date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("plus3m"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"))
    }),

    // P7 — LIKE / NOT LIKE / upper-LIKE (reference alerta_ic1a.py:49).
    "q25_like" -> ((s, dir) => {
      t(s, dir, "part")
        .filter((col("p_name").like("%red%") || upper(col("p_name")).like("%BLUE%")) &&
          !col("p_brand").like("Brand#1%"))
        .select("p_partkey", "p_name", "p_brand")
    }),

    // F1 — composite row key, the reference's uuidsha/alrt_key recipe
    // (utils.py:26-43 + jobs.py:266-271) as a codegen'd hash expression.
    // md5 here because the DuckDB oracle lacks sha1; the sha1 form is
    // unit-tested in AlertKeySpec.
    "q26_row_key" -> ((s, dir) => {
      t(s, dir, "orders").select(
        col("o_orderkey"),
        md5(concat_ws(".", lit("ORD"), col("o_orderkey").cast("string"),
          col("o_custkey").cast("string"))).as("alrt_key"))
    }),

    // A9/S11 — global scalar aggregate (reference jobs.py:250).
    "q27_scalar_agg" -> ((s, dir) => {
      t(s, dir, "lineitem").agg(
        count(lit(1)).as("n"),
        round(sum(col("l_extendedprice")), 2).as("total_price"),
        sum(col("l_quantity")).as("total_qty"),
        min(col("l_shipdate")).cast("string").as("min_ship"),
        max(col("l_shipdate")).cast("string").as("max_ship"))
    }),

    // S3 — literal in-memory dimension joined broadcast (reference
    // jobs.py:148-182 alert-types dim).
    "q28_literal_dim" -> ((s, dir) => {
      val rows = Seq(("1-URGENT", 1), ("2-HIGH", 2), ("3-MEDIUM", 3),
        ("4-NOT SPECIFIED", 4), ("5-LOW", 5))
      val dim = s.createDataFrame(rows).toDF("prio", "prio_rank")
      t(s, dir, "orders")
        .join(broadcast(dim), col("o_orderpriority") === col("prio"))
        .groupBy(col("prio_rank"))
        .agg(count(lit(1)).as("n_orders"))
    }),

    // J9 — composite-key join back to a derived aggregate (reference
    // alerta_bdpa.py:44-51 two-conjunct join-backs).
    "q29_composite_key_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val ps = li.groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity")).as("ps_qty"))
      li.join(ps, Seq("l_partkey", "l_suppkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), round(col("l_quantity") / col("ps_qty"), 6).as("qty_share"))
    }),

    // The BDPA detector's full chain topology (reference
    // alerta_bdpa.py:40-97 / harness/BdpaAlert.scala): double
    // tie-keeping max-per-group where the SECOND aggregate runs only
    // over the first chain's candidates, then deadline arithmetic
    // (date_add by a column) and the tie-collapsing final distinct.
    // Recast over TPC-H: latest order per customer -> its 'N'-flag
    // lines carry a deadline (l_quantity days after l_shipdate) ->
    // latest such line per customer -> overdue vs a pinned clock.
    "q71_bdpa_chain" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      val lastOrder = graft.operators.Relational
        .maxPerGroupJoinBack(orders, "o_custkey", "o_orderdate")
      val withPrazo = lastOrder
        .join(li, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_returnflag") === "N" && col("l_quantity").isNotNull)
        .withColumn("prazo", col("l_quantity").cast("int"))
      val lastLine = graft.operators.Relational
        .maxPerGroupJoinBack(withPrazo, "o_custkey", "l_shipdate")
      lastLine
        .withColumn("dt_fim_prazo", date_add(col("l_shipdate"), col("prazo")))
        .withColumn("elapsed",
          datediff(lit("2002-06-01").cast("date"), col("dt_fim_prazo")))
        .filter(col("elapsed") > 0)
        .select(
          col("o_custkey").as("cust"),
          date_format(col("dt_fim_prazo"), "yyyy-MM-dd").as("dt_fim"),
          col("elapsed"))
        .distinct()
    }),

    // §2.5 extension — window rank / lag / running agg over events
    // (absent from the reference; required for the 100 TB pipeline).
    "q30_window_funcs" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      t(s, dir, "events").select(
        col("event_id"), col("user_id"),
        rank().over(Window.partitionBy(col("user_id")).orderBy(col("event_type"), col("event_id"))).as("type_rank"),
        round(lag(col("value"), 1, 0.0).over(w), 2).as("prev_value"),
        round(sum(col("value")).over(w.rowsBetween(Window.unboundedPreceding, 0)), 2).as("running_value"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |round(sum(l_extendedprice),2) AS sum_base_price,
        |round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        |round(avg(l_discount),6) AS avg_disc, count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_sql" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_orderstatus = 'O' AND o_totalprice > 100000 AND o_orderpriority != '1-URGENT'""".stripMargin,
    "q03_filter_isin" ->
      """SELECT p_partkey, p_brand, p_size FROM part
        |WHERE p_brand IN ('Brand#1','Brand#5','Brand#12') AND p_size IN (1,5,10,15,20,25)""".stripMargin,
    "q04_case_when" ->
      """SELECT o_orderkey,
        |CASE WHEN o_totalprice < 50000 THEN 'small' WHEN o_totalprice < 150000 THEN 'medium' ELSE 'large' END AS bucket,
        |CASE WHEN o_orderpriority = '1-URGENT' THEN 1 WHEN o_orderpriority = '2-HIGH' THEN 2 END AS prio_rank
        |FROM orders""".stripMargin,
    "q05_join_inner" ->
      """SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice),2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment""".stripMargin,
    "q06_join_left" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey GROUP BY c_custkey""".stripMargin,
    "q07_join_broadcast" ->
      """SELECT p_brand, sum(l_quantity) AS sum_qty, count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_type = 'ECONOMY' GROUP BY p_brand""".stripMargin,
    "q08_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q09_join_semi" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey
        |  AND l_shipdate >= TIMESTAMP '2001-01-01 00:00:00')""".stripMargin,
    "q10_join_range" ->
      """SELECT o_orderpriority, count(*) AS late_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  AND date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 400
        |GROUP BY o_orderpriority""".stripMargin,
    "q11_cross_join" ->
      "SELECT r_name, n_name FROM region CROSS JOIN nation",
    "q12_max_per_group_joinback" ->
      """SELECT o_orderkey, o_custkey, o_orderdate FROM orders
        |JOIN (SELECT o_custkey AS k, max(o_orderdate) AS max_dt FROM orders GROUP BY o_custkey) m
        |ON o_custkey = m.k AND o_orderdate = m.max_dt""".stripMargin,
    "q13_max_per_group_window" ->
      """SELECT o_custkey, o_orderkey, o_orderdate FROM (
        |SELECT o_custkey, o_orderkey, o_orderdate,
        |row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey ASC) AS rn
        |FROM orders) WHERE rn = 1""".stripMargin,
    "q14_ref_row_compare" ->
      """WITH per AS (SELECT c_nationkey, count(*) AS n_cust, round(avg(c_acctbal),4) AS avg_bal
        |FROM customer GROUP BY c_nationkey)
        |SELECT p.c_nationkey, p.n_cust, round(p.avg_bal - r.avg_bal, 4) AS bal_vs_ref
        |FROM per p CROSS JOIN (SELECT avg_bal FROM per WHERE c_nationkey = 0) r
        |WHERE p.c_nationkey != 0""".stripMargin,
    "q15_union" ->
      """SELECT c_custkey AS id, c_acctbal AS bal, 'customer' AS kind FROM customer
        |UNION ALL
        |SELECT s_suppkey AS id, s_acctbal AS bal, 'supplier' AS kind FROM supplier""".stripMargin,
    "q16_unpivot" ->
      """SELECT measure, round(sum(val),2) AS total, count(*) AS n FROM (
        |SELECT 'qty' AS measure, l_quantity AS val FROM lineitem
        |UNION ALL SELECT 'price', l_extendedprice FROM lineitem
        |UNION ALL SELECT 'disc', l_discount FROM lineitem) GROUP BY measure""".stripMargin,
    "q17_distinct" ->
      "SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
    "q18_count_distinct" ->
      """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust, count(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q19_having" ->
      "SELECT l_partkey, count(*) AS n FROM lineitem GROUP BY l_partkey HAVING count(*) >= 40",
    "q20_product_logsum" ->
      """SELECT l_orderkey, round(sum(ln(l_quantity)),6) AS log_qty_product, count(*) AS n_items
        |FROM lineitem GROUP BY l_orderkey""".stripMargin,
    "q21_collect_sorted" ->
      """SELECT o_custkey, string_agg(p, ',' ORDER BY p) AS prios FROM (
        |SELECT DISTINCT o_custkey, o_orderpriority AS p FROM orders) GROUP BY o_custkey""".stripMargin,
    "q22_coalesce" ->
      """SELECT c_custkey, coalesce(o_orderkey, -1) AS order_or_default,
        |coalesce(o_totalprice, 0.0) AS price_or_zero
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey""".stripMargin,
    "q23_cast_substring" ->
      """SELECT c_custkey, CAST(substring(c_name, 10, 9) AS INTEGER) AS name_num,
        |upper(c_mktsegment) AS seg, concat_ws('|', c_name, c_mktsegment) AS tagged
        |FROM customer""".stripMargin,
    "q24_date_arith" ->
      """SELECT o_orderkey,
        |CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-12-31') AS INTEGER) AS age_days,
        |strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS due_date,
        |strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
        |strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
        |CAST(year(o_orderdate) AS INTEGER) AS yr, CAST(month(o_orderdate) AS INTEGER) AS mo
        |FROM orders""".stripMargin,
    "q25_like" ->
      """SELECT p_partkey, p_name, p_brand FROM part
        |WHERE (p_name LIKE '%red%' OR upper(p_name) LIKE '%BLUE%') AND p_brand NOT LIKE 'Brand#1%'""".stripMargin,
    "q26_row_key" ->
      """SELECT o_orderkey, md5(concat_ws('.', 'ORD', CAST(o_orderkey AS VARCHAR),
        |CAST(o_custkey AS VARCHAR))) AS alrt_key FROM orders""".stripMargin,
    "q27_scalar_agg" ->
      """SELECT count(*) AS n, round(sum(l_extendedprice),2) AS total_price,
        |sum(l_quantity) AS total_qty,
        |strftime(min(l_shipdate), '%Y-%m-%d %H:%M:%S') AS min_ship,
        |strftime(max(l_shipdate), '%Y-%m-%d %H:%M:%S') AS max_ship
        |FROM lineitem""".stripMargin,
    "q28_literal_dim" ->
      """SELECT prio_rank, count(*) AS n_orders FROM orders
        |JOIN (VALUES ('1-URGENT',1),('2-HIGH',2),('3-MEDIUM',3),('4-NOT SPECIFIED',4),('5-LOW',5))
        |  AS dim(prio, prio_rank) ON o_orderpriority = prio
        |GROUP BY prio_rank""".stripMargin,
    "q29_composite_key_join" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |round(l_quantity / ps_qty, 6) AS qty_share
        |FROM lineitem JOIN (SELECT l_partkey AS pk, l_suppkey AS sk, sum(l_quantity) AS ps_qty
        |  FROM lineitem GROUP BY 1, 2) ps ON l_partkey = ps.pk AND l_suppkey = ps.sk""".stripMargin,
    "q71_bdpa_chain" ->
      """WITH last_o AS (
        |  SELECT o_custkey AS k, max(o_orderdate) AS d FROM orders GROUP BY 1),
        |cand AS (
        |  SELECT o.o_custkey, l.l_shipdate, CAST(l.l_quantity AS INTEGER) AS prazo
        |  FROM orders o
        |  JOIN last_o ON o.o_custkey = last_o.k AND o.o_orderdate = last_o.d
        |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  WHERE l.l_returnflag = 'N' AND l.l_quantity IS NOT NULL),
        |last_s AS (SELECT o_custkey AS k2, max(l_shipdate) AS s FROM cand GROUP BY 1)
        |SELECT DISTINCT
        |  c.o_custkey AS cust,
        |  strftime(CAST(c.l_shipdate AS DATE) + c.prazo, '%Y-%m-%d') AS dt_fim,
        |  CAST(date_diff('day', CAST(c.l_shipdate AS DATE) + c.prazo, DATE '2002-06-01') AS INTEGER) AS elapsed
        |FROM cand c
        |JOIN last_s ON c.o_custkey = last_s.k2 AND c.l_shipdate = last_s.s
        |WHERE date_diff('day', CAST(c.l_shipdate AS DATE) + c.prazo, DATE '2002-06-01') > 0""".stripMargin,
    "q30_window_funcs" ->
      """SELECT event_id, user_id,
        |CAST(rank() OVER (PARTITION BY user_id ORDER BY event_type, event_id) AS INTEGER) AS type_rank,
        |round(coalesce(lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0.0), 2) AS prev_value,
        |round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
        |FROM events""".stripMargin
  )
}
