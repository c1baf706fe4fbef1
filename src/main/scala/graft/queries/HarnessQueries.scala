package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{AlertKey, SchemaConform, Tables}
import graft.harness.AlertConform

/** Harness-path queries: the conform + key-build pipeline that every
  * alert result passes through (reference jobs.py:258-277), exercised
  * over the orders table as a stand-in alert. Uses the sha256 key
  * variant so DuckDB can replicate the digest (sha1 is the reference
  * digest and is unit-tested byte-exactly in AlertKeySpec).
  */
object HarnessQueries {

  /** q70 constants — single source for the Spark plan AND the generated
    * DuckDB oracle, so the two can never drift. */
  private val SpineRoutedPriority = "1-URGENT"
  private val SpinePkgRegionMax = 3
  private val SpineBranchARegions = Seq(0, 1)
  private val SpineBranchAFlag = "R"
  private val SpineBranchBMin = 2
  private val SpineBranchBFlag = "A"

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The documentos_ativos spine shape (reference jobs.py:202-248 /
    // harness/ActiveDocs.scala): an open-rows filter, a routing
    // exclusion and an archival exclusion — each a native left_anti —
    // where the archival flag is a CASE consulting a LEFT-joined
    // package dim, so rows whose dim key is absent get NULL and fall
    // through every branch (never archived). Re-cast over TPC-H:
    // customer=documento, orders+lineitem=the routing/andamento chains,
    // nation(region<3)=the organ-package map.
    "q70_active_spine" -> ((s, dir) => {
      val cust = Tables.load(s, dir, "customer")
      val orders = Tables.load(s, dir, "orders")
      val li = Tables.load(s, dir, "lineitem")
      val pkg = Tables.load(s, dir, "nation")
        .filter(col("n_regionkey") < SpinePkgRegionMax)
        .select(col("n_nationkey"), col("n_regionkey").as("cod_pct"))
      val routedAway = li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .filter(col("o_orderpriority") === SpineRoutedPriority)
        .select(col("o_custkey").as("routed_key"))
      val archived = cust
        .join(pkg, col("n_nationkey") === col("c_nationkey"), "left")
        .join(orders, col("o_custkey") === col("c_custkey"))
        .join(li, col("l_orderkey") === col("o_orderkey"))
        .withColumn("is_arq",
          when(col("cod_pct").isin(SpineBranchARegions: _*) &&
            col("l_returnflag") === SpineBranchAFlag, 1)
            .when(col("cod_pct") >= SpineBranchBMin &&
              col("l_returnflag") === SpineBranchBFlag, 1)
            .otherwise(lit(null).cast("int")))
        .filter(col("is_arq").isNotNull)
        .select(col("c_custkey").as("arch_key"))
      cust.filter(col("c_acctbal") > 0)
        .join(routedAway, col("c_custkey") === col("routed_key"), "left_anti")
        .join(archived, col("c_custkey") === col("arch_key"), "left_anti")
        .select("c_custkey", "c_name")
    }),
    "q44_alert_conform" -> ((s, dir) => {
      val built = Tables.load(s, dir, "orders")
        .filter(col("o_orderstatus") === "O")
        .select(
          col("o_orderkey").cast("int").as("alrt_docu_dk"),
          col("o_custkey").cast("int").as("alrt_orgi_orga_dk"),
          col("o_orderdate").as("alrt_date_referencia"),
          datediff(lit("2001-01-01").cast("date"), col("o_orderdate"))
            .as("alrt_dias_referencia"))
      AlertConform(built, "OVRD", SchemaConform.Mgp,
        keyCols = Seq("alrt_docu_dk"), keyHash = AlertKey.limpaSha256)
    }),

    // The FULL lifecycle under the driver's oracle (reference
    // jobs.py:284-320): three harness runs over run-specific orders
    // subsets — first-create (partitioned hist write), a second day in
    // the same month (month-merge keeps both days), and a SAME-day
    // re-run (that day's rows replaced via the staging table + dynamic
    // partition overwrite; the first day untouched). The emitted hist
    // table's closed form: run-1 rows under dt_calculo 20201110 plus
    // run-3 rows under 20201111 — run-2's rows must be GONE. Each call
    // rebuilds the fixture database from scratch (fresh location), so
    // the query is idempotent across Verify/Bench passes.
    "q153_hist_merge" -> ((s, dir) => {
      import java.time.LocalDateTime
      import graft.harness.{Alert, AlertHarness, RunClock}
      val db = "graft_q153"
      s.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
      // FIXED location, wiped before CREATE: a fresh temp dir per
      // invocation would orphan the previous pass's warehouse files
      // (the CASCADE above only clears the catalog + current location)
      val loc = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_q153_wh")
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq
          .sortBy(-_.getNameCount)
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
      java.nio.file.Files.createDirectories(loc)
      s.sql(s"CREATE DATABASE $db LOCATION '$loc'")
      def alert(runMod: Int): Alert = new Alert {
        val sigla = "HMRG"
        val family = SchemaConform.Mgp
        val keyCols = Seq("alrt_docu_dk")
        def build(sp: SparkSession): DataFrame =
          Tables.load(sp, dir, "orders")
            .filter(col("o_orderkey") % 100 === runMod)
            .select(col("o_orderkey").cast("int").as("alrt_docu_dk"),
              col("o_custkey").cast("int").as("alrt_orgi_orga_dk"))
      }
      def run(clock: RunClock, runMod: Int): Unit = {
        val h = new AlertHarness(s, db, clock,
          keyHash = AlertKey.limpaSha256)
        h.dropTemps(Seq("alerts"))
        h.appendTemp(alert(runMod), "alerts")
        h.finalize("alerts")
      }
      run(RunClock(LocalDateTime.of(2020, 11, 10, 9, 0)), 1)
      run(RunClock(LocalDateTime.of(2020, 11, 11, 9, 0)), 2)
      run(RunClock(LocalDateTime.of(2020, 11, 11, 18, 0)), 3)
      s.table(s"$db.hist_alerts")
        .select("alrt_key", "alrt_sigla", "alrt_orgi_orga_dk",
          "alrt_docu_dk", "dt_calculo", "dt_partition")
    })
  )

  val oracles: Map[String, String] = Map(
    // the reference's own formulation of both exclusions is
    // LEFT JOIN + IS NULL ≡ NOT EXISTS (jobs.py:203-245)
    "q70_active_spine" ->
      s"""WITH routed AS (
         |  SELECT DISTINCT o_custkey
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  WHERE o.o_orderpriority = '$SpineRoutedPriority'),
         |archived AS (
         |  SELECT DISTINCT c2.c_custkey
         |  FROM customer c2
         |  LEFT JOIN (SELECT n_nationkey, n_regionkey AS cod_pct FROM nation
         |             WHERE n_regionkey < $SpinePkgRegionMax) p
         |    ON p.n_nationkey = c2.c_nationkey
         |  JOIN orders o ON o.o_custkey = c2.c_custkey
         |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         |  WHERE (CASE WHEN p.cod_pct IN (${SpineBranchARegions.mkString(",")})
         |                   AND l.l_returnflag = '$SpineBranchAFlag' THEN 1
         |              WHEN p.cod_pct >= $SpineBranchBMin
         |                   AND l.l_returnflag = '$SpineBranchBFlag' THEN 1
         |         END) IS NOT NULL)
         |SELECT c_custkey, c_name FROM customer c
         |WHERE c_acctbal > 0
         |  AND NOT EXISTS (SELECT 1 FROM routed r WHERE r.o_custkey = c.c_custkey)
         |  AND NOT EXISTS (SELECT 1 FROM archived a WHERE a.c_custkey = c.c_custkey)""".stripMargin,
    "q44_alert_conform" ->
      """SELECT concat('OVRD', '.', sha256(CAST(CAST(o_orderkey AS INTEGER) AS VARCHAR)),
        |         '.', CAST(CAST(o_custkey AS INTEGER) AS VARCHAR)) AS alrt_key,
        |  'OVRD' AS alrt_sigla,
        |  CAST(o_custkey AS INTEGER) AS alrt_orgi_orga_dk,
        |  CAST(o_orderkey AS INTEGER) AS alrt_docu_dk,
        |  CAST(NULL AS VARCHAR) AS alrt_docu_nr_mp,
        |  o_orderdate AS alrt_date_referencia,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2001-01-01') AS INTEGER) AS alrt_dias_referencia,
        |  CAST(NULL AS INTEGER) AS alrt_dk_referencia,
        |  CAST(NULL AS VARCHAR) AS alrt_info_adicional
        |FROM orders WHERE o_orderstatus = 'O'""".stripMargin,
    // the hist table's closed form after run1(day10,%100=1),
    // run2(day11,%100=2), run3(SAME day11,%100=3): the same-day
    // replace must have erased run2 entirely, kept run1's day intact
    "q153_hist_merge" ->
      """WITH k AS (SELECT o_orderkey, o_custkey,
        |    concat('HMRG', '.',
        |      sha256(CAST(CAST(o_orderkey AS INTEGER) AS VARCHAR)),
        |      '.', CAST(CAST(o_custkey AS INTEGER) AS VARCHAR)) AS alrt_key
        |  FROM orders)
        |SELECT alrt_key, 'HMRG' AS alrt_sigla,
        |  CAST(o_custkey AS INTEGER) AS alrt_orgi_orga_dk,
        |  CAST(o_orderkey AS INTEGER) AS alrt_docu_dk,
        |  '20201110' AS dt_calculo, '202011' AS dt_partition
        |FROM k WHERE o_orderkey % 100 = 1
        |UNION ALL
        |SELECT alrt_key, 'HMRG',
        |  CAST(o_custkey AS INTEGER), CAST(o_orderkey AS INTEGER),
        |  '20201111', '202011'
        |FROM k WHERE o_orderkey % 100 = 3""".stripMargin
  )
}
