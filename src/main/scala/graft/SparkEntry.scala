package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` holds one entry per implemented operator from SURVEY.md §2
  * (plus the training-data-pipeline extensions), each runnable on the
  * TPC-H-ish parquet tables at the given scale-factor dir. `oracleSql`
  * holds the DuckDB-equivalent SQL for the hash-compare gate.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1-flavored pricing summary (reference operator A1/A3,
    * src/alertas/alerta_abr1.py:43-52 grouped aggregate shape).
    */
  def entry(spark: SparkSession): DataFrame =
    Q.q01_agg(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Q.registry

  def oracleSql: Map[String, String] = Q.oracles
}
