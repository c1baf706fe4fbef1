package graft.harness

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.SchemaConform

/** DCTJ / DNTJ — documents sent to court (TJ) and not returned within
  * the deadline (reference src/alertas/alerta_dctj.py:21-61 and
  * alerta_dntj.py:21-59 — identical pipelines differing only in the
  * class-hierarchy predicate and deadline length, factored here into
  * one parameterized detector).
  *
  * Shape: open documents of the given class family, with an "MP"
  * party, routed from an internal prosecution organ to a court-type
  * external organ; take the latest court-received guia per document
  * (J7 groupBy on the projected keys), then left-join any LATER
  * routing received back at the responsible organ (the J5
  * range-conjunct inside a left join) and keep documents with none
  * (J4 anti emulation, expressed as a native left_anti probe with the
  * same three-conjunct condition).
  *
  * Deliberate divergence, documented: the reference left-joins the
  * return probe per routing ITEM and filters `movi_dk is null`
  * (dctj.py:49-57) — any non-returning item (including the original
  * outbound one) keeps the document alerting even when a return
  * exists, and duplicates rows per item; both detectors are disabled
  * in its registry (jobs.py:99-101). We apply the probe per DOCUMENT
  * (drop it if ANY later return reached the responsible organ), which
  * is the rule's stated intent and duplicate-free.
  *
  * Scale notes: the dimension joins (classe, alias, organs) are
  * broadcast exactly as the reference hints; the return probe is an
  * anti join keyed on item_movi_dk/destination with the range
  * conjunct, so Catalyst keeps an equi-join core (no nested-loop
  * blow-up, SURVEY.md §2.3 J5 caveat).
  */
class CourtReturnAlert(clock: RunClock, criminal: Boolean) extends Alert {
  val sigla: String = if (criminal) "DCTJ" else "DNTJ"
  val family = SchemaConform.Mgp
  val keyCols: Seq[String] = Seq.empty // reference computes no uuidsha key
  private val prazoDias = if (criminal) 60 else 120

  /** Court-type external organ codes (dctj.py:35). */
  val courtOrganTypes: Seq[Int] = Seq(63, 64, 65, 66, 67, 69, 70, 83)

  def build(spark: SparkSession): DataFrame = {
    val classe = spark.table("mmps_classe_hierarquia")
    val classeFiltered =
      if (criminal) classe.filter(col("cldc_ds_hierarquia").like("PROCESSO CRIMINAL%"))
      else classe.filter(!col("cldc_ds_hierarquia").like("PROCESSO CRIMINAL%"))
    val item = spark.table("mcpr_item_movimentacao")
    val movimentacao = spark.table("mcpr_movimentacao")

    val sentToCourt = spark.table("documento").filter(col("docu_fsdc_dk") === 1)
      .join(broadcast(classeFiltered), col("docu_cldc_dk") === col("cldc_dk"))
      .join(spark.table("mcpr_personagem").filter(col("pers_tppe_dk") === 7),
        col("docu_dk") === col("pers_docu_dk"))
      .join(spark.table("mcpr_pessoa"), col("pers_pess_dk") === col("pess_dk"))
      .join(broadcast(spark.table("mmps_alias")),
        col("pess_nm_pessoa") === col("alias"))
      .join(item, col("docu_dk") === col("item_docu_dk"))
      .join(movimentacao, col("item_movi_dk") === col("movi_dk"))
      .join(broadcast(spark.table("orgi_orgao").filter(col("orgi_tpor_dk") === 1)),
        col("movi_orga_dk_origem") === col("orgi_dk"))
      .join(broadcast(spark.table("mprj_orgao_ext")
        .filter(col("orge_tpoe_dk").isin(courtOrganTypes: _*))),
        col("movi_orga_dk_destino") === col("orge_orga_dk"))
      .groupBy(col("docu_dk"), col("docu_nr_mp"),
        col("docu_orgi_orga_dk_responsavel"))
      .agg(max(col("movi_dt_recebimento_guia")).as("movi_dt_guia"))

    // any LATER guia received back at the responsible organ clears it
    val returned = item.join(movimentacao, col("item_movi_dk") === col("movi_dk"))
      .select(col("item_docu_dk").as("ret_docu_dk"),
        col("movi_orga_dk_destino").as("ret_destino"),
        col("movi_dt_recebimento_guia").as("ret_dt_recebimento"))
    sentToCourt
      .join(returned,
        col("docu_dk") === col("ret_docu_dk") &&
          col("docu_orgi_orga_dk_responsavel") === col("ret_destino") &&
          col("movi_dt_guia") < col("ret_dt_recebimento"),
        "left_anti")
      .withColumn("dt_fim_prazo",
        date_add(col("movi_dt_guia"), prazoDias).cast("timestamp"))
      .withColumn("elapsed",
        datediff(lit(clock.ts).cast("date"), col("dt_fim_prazo")).cast("int"))
      .filter(col("elapsed") > 0)
      .select(
        col("docu_dk").as("alrt_docu_dk"),
        col("docu_nr_mp").as("alrt_docu_nr_mp"),
        col("dt_fim_prazo").as("alrt_date_referencia"),
        col("docu_orgi_orga_dk_responsavel").as("alrt_orgi_orga_dk"),
        col("elapsed").as("alrt_dias_referencia"))
  }
}
