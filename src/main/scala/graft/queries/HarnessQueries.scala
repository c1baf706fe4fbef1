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

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
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
    })
  )

  val oracles: Map[String, String] = Map(
    "q44_alert_conform" ->
      """SELECT concat('OVRD', '.', sha256(CAST(CAST(o_orderkey AS INTEGER) AS VARCHAR)),
        |         '.', CAST(CAST(o_custkey AS INTEGER) AS VARCHAR)) AS alrt_key,
        |  'OVRD' AS alrt_sigla,
        |  CAST(o_custkey AS INTEGER) AS alrt_orgi_orga_dk,
        |  CAST(o_orderkey AS INTEGER) AS alrt_docu_dk,
        |  CAST(NULL AS VARCHAR) AS alrt_docu_nr_mp,
        |  o_orderdate AS alrt_date_referencia,
        |  date_diff('day', CAST(o_orderdate AS DATE), DATE '2001-01-01') AS alrt_dias_referencia,
        |  CAST(NULL AS INTEGER) AS alrt_dk_referencia,
        |  CAST(NULL AS VARCHAR) AS alrt_info_adicional
        |FROM orders WHERE o_orderstatus = 'O'""".stripMargin
  )
}
