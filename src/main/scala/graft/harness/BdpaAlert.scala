package graft.harness

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.SchemaConform
import graft.operators.Relational

/** BDPA — delayed return from police ("baixa à delegacia sem
  * retorno"): documents whose latest case-file routing to a police
  * organ has exceeded the deadline set by the latest "baixa"
  * sub-andamento (reference src/alertas/alerta_bdpa.py:24-97,
  * SURVEY.md §3.2 — the double max-per-group chain).
  *
  * Shape preserved Spark-first:
  *  - latest andamento per document and latest movimentação per
  *    document are both the reference's J7 groupBy+join-back (ties
  *    keep all rows, as the reference does);
  *  - `movi_dt_guia = coalesce(recebimento, envio, criação)` (P9);
  *  - deadline arithmetic `date_add` + `datediff` against the
  *    injectable run clock (no current_date drift, §7.3 risk 2);
  *  - police-organ filter on the external-organ type.
  */
class BdpaAlert(clock: RunClock,
                baixaCodes: Seq[Int] = Seq(6032, 6034),
                policeOrganTypes: Seq[Int] = Seq(60, 61, 68)) extends Alert {
  val sigla = "BDPA"
  val family = SchemaConform.Mgp
  val keyCols = Seq("alrt_docu_dk", "alrt_date_referencia")

  def build(spark: SparkSession): DataFrame = {
    val docs = spark.table("documentos_ativos")
      .filter(col("docu_tpst_dk") === 3)
      .select("docu_dk", "docu_nr_mp")

    // latest andamento per document (J7 #1)
    val andamentos = docs
      .join(spark.table("vista"), col("vist_docu_dk") === col("docu_dk"))
      .join(spark.table("mcpr_andamento"), col("pcao_vist_dk") === col("vist_dk"))
    val lastAnd = Relational.maxPerGroupJoinBack(
      andamentos, "docu_dk", "pcao_dt_andamento")

    // its "baixa" sub-andamento with a deadline
    val withPrazo = lastAnd
      .join(spark.table("mcpr_sub_andamento"), col("stao_pcao_dk") === col("pcao_dk"))
      .filter(col("stao_tppr_dk").isin(baixaCodes: _*) &&
        col("stao_nr_dias_prazo").isNotNull)

    // latest routing per document (J7 #2), guia date by coalesce (P9)
    val movs = spark.table("mcpr_item_movimentacao")
      .join(spark.table("mcpr_movimentacao"), col("item_movi_dk") === col("movi_dk"))
      .withColumn("movi_dt_guia", coalesce(
        col("movi_dt_recebimento_guia"), col("movi_dt_envio_guia"),
        col("movi_dt_criacao_guia")))
    val lastMov = Relational.maxPerGroupJoinBack(movs, "item_docu_dk", "movi_dt_guia")
      .join(spark.table("mprj_orgao_ext"),
        col("orge_orga_dk") === col("movi_orga_dk_destino"))
      .filter(col("orge_tpoe_dk").isin(policeOrganTypes: _*))

    withPrazo
      .join(lastMov, col("item_docu_dk") === col("docu_dk"))
      .withColumn("dt_fim_prazo",
        date_add(col("movi_dt_guia"), col("stao_nr_dias_prazo")))
      .withColumn("elapsed", datediff(lit(clock.ts).cast("date"), col("dt_fim_prazo")))
      .filter(col("elapsed") > 0)
      .select(
        col("docu_dk").as("alrt_docu_dk"),
        col("docu_nr_mp").as("alrt_docu_nr_mp"),
        col("vist_orgi_orga_dk").cast("int").as("alrt_orgi_orga_dk"),
        col("dt_fim_prazo").cast("timestamp").as("alrt_date_referencia"),
        col("elapsed").as("alrt_dias_referencia"))
  }
}
