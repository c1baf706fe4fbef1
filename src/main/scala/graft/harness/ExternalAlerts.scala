package graft.harness

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.SchemaConform

/** Alerts over external (non-judicial) datasets: police-report serials
  * (RO/FEBT), procurement outliers (COMP), and the CSMP yearly
  * communication gate (ABR1). */

/** RO — police reports never delivered: per police station, the gap
  * between the highest report serial of the current year and the count
  * of distinct reports received (reference src/alertas/alerta_ro.py:
  * 23-48). `proc_numero` layout: DDD-SSSSS/YYYY (station, serial,
  * year — substring sites P10/§2.7). */
class RoAlert(clock: RunClock) extends Alert {
  val sigla = "RO"
  val family = SchemaConform.Ro
  val keyCols = Seq("ro_nr_delegacia", "ro_max_proc")

  def build(spark: SparkSession): DataFrame = {
    val year = clock.now.getYear
    val faltantes = spark.table("seg_pub_in_pol_procedimento")
      // partition-prune-friendly: year is parsed from the serial itself
      .filter(substring(col("proc_numero"), 11, 4).cast("int") === year)
      .groupBy(substring(col("proc_numero"), 0, 3).cast("int").as("nr_delegacia"))
      .agg(
        max(col("proc_numero")).as("max_proc"),
        (substring(max(col("proc_numero")), 5, 5).cast("int") -
          countDistinct(col("proc_numero"))).as("qt_ros_faltantes"))
      .filter(col("qt_ros_faltantes") >= 1)
    faltantes
      .join(spark.table("tb_pip_cisp"), col("nr_delegacia") === col("cisp_codigo"))
      .select(
        col("nr_delegacia").cast("string").as("ro_nr_delegacia"),
        col("pip_codigo").cast("int").as("alrt_orgi_orga_dk"),
        col("qt_ros_faltantes").cast("int").as("ro_qt_ros_faltantes"),
        col("max_proc").as("ro_max_proc"),
        col("cisp_nome_apresentacao").as("ro_cisp_nome_apresentacao"))
  }
}

/** FEBT — stations silent for more than 30 days: latest report
  * release per station vs the run clock (reference
  * src/alertas/alerta_febt.py:22-45). */
class FebtAlert(clock: RunClock) extends Alert {
  val sigla = "FEBT"
  val family = SchemaConform.Ro
  val keyCols = Seq("ro_nr_delegacia", "febt_ultima_liberacao")

  def build(spark: SparkSession): DataFrame = {
    val ultimo = spark.table("seg_pub_in_pol_procedimento")
      .groupBy(substring(col("proc_numero"), 0, 3).cast("int").as("numero_delegacia"))
      .agg(max(col("data_liberacao")).as("ultima_liberacao"))
      .filter(datediff(lit(clock.ts), col("ultima_liberacao")) > 30)
    ultimo
      .join(spark.table("tb_pip_cisp"), col("numero_delegacia") === col("cisp_codigo"))
      .select(
        col("numero_delegacia").cast("string").as("ro_nr_delegacia"),
        col("pip_codigo").cast("int").as("alrt_orgi_orga_dk"),
        col("cisp_nome_apresentacao").as("ro_cisp_nome_apresentacao"),
        // key component only (dropped by the family conform), matching
        // the reference's uuidsha(numero_delegacia, ultima_liberacao)
        col("ultima_liberacao").as("febt_ultima_liberacao"))
  }
}

/** COMP — procurement items ≥20% over standard price, fanned out to
  * every citizenship-capital organ (reference src/alertas/
  * alerta_comp.py:22-39 — the J6 cross-join site). */
class CompAlert extends Alert {
  val sigla = "COMP"
  val family = SchemaConform.Comp
  val keyCols = Seq("comp_contrato_iditem")

  def build(spark: SparkSession): DataFrame = {
    val compras = spark.table("compras_fora_padrao_capital")
      .filter(col("var_perc") >= 20)
      .select(col("contratacao"), col("id_item"), col("contrato_iditem"),
        col("item"), col("dt_contratacao"), col("var_perc"))
    val orgaos = spark.table("atualizacao_pj_pacote")
      .filter(upper(col("pacote_atribuicao")).like("%CIDADANIA%") &&
        col("orgao_codamp").like("%CAPITAL%"))
      .select(col("id_orgao"))
    // small dim × small fact: the fan-out is a broadcast nested loop
    compras.crossJoin(broadcast(orgaos))
      .select(
        col("id_orgao").cast("int").as("alrt_orgi_orga_dk"),
        col("contratacao").cast("int").as("comp_contratacao"),
        col("item").as("comp_item"),
        col("id_item").cast("int").as("comp_id_item"),
        col("contrato_iditem").cast("string").as("comp_contrato_iditem"),
        col("dt_contratacao").cast("string").as("comp_dt_contratacao"),
        col("var_perc").cast("double").as("comp_var_perc"))
  }
}

/** ABR1 — organs holding tutela procedures open for over a year that
  * must be reported to the CSMP; fires only in the configured months
  * (reference src/alertas/alerta_abr1.py:21-58). Also persists the
  * qualifying procedure list as an aux side-table — the declared-
  * secondary-output pattern (SURVEY.md §7.3 risk 8). */
class Abr1Alert(clock: RunClock, months: Seq[Int] = Seq(4),
                auxTable: Option[String] = None) extends Alert {
  val sigla = "ABR1"
  val family = SchemaConform.Abr1
  val keyCols = Seq("abr1_ano_mes")

  def build(spark: SparkSession): DataFrame = {
    val today = lit(clock.ts).cast("date")
    val monthGate =
      (clock.now.getYear == 2020 && clock.now.getMonthValue == 11) ||
        months.contains(clock.now.getMonthValue)
    val procedimentos = spark.table("documentos_ativos")
      .filter(datediff(last_day(today), col("docu_dt_cadastro")) / 365.2425 > 1)
      .filter(col("docu_dt_cancelamento").isNull)
      .filter(col("docu_cldc_dk") === 392)
      .filter(col("docu_tpst_dk") =!= 3)
      .filter(lit(monthGate)) // the reference's month fan-out gate
      .select(col("docu_orgi_orga_dk_responsavel"), col("docu_nr_mp"),
        col("docu_dt_cadastro"), col("docu_dk"))

    auxTable.foreach(t => procedimentos.write.mode(SaveMode.Overwrite)
      .format("parquet").saveAsTable(t))

    val tutela = spark.table("atualizacao_pj_pacote")
      .filter(upper(col("orgi_nm_orgao")).like("%TUTELA%"))
      .select(col("id_orgao"))
    procedimentos
      .join(broadcast(tutela), col("id_orgao") === col("docu_orgi_orga_dk_responsavel"))
      .groupBy(col("docu_orgi_orga_dk_responsavel"))
      .agg(count(lit(1)).as("nr_procedimentos"))
      .select(
        col("docu_orgi_orga_dk_responsavel").cast("int").as("alrt_orgi_orga_dk"),
        col("nr_procedimentos").cast("int").as("abr1_nr_procedimentos"),
        // UNPADDED month ON PURPOSE: the reference builds ano_mes as
        // concat_ws('', year, month) (alerta_abr1.py:47), so April is
        // "20264", not "202604" — faithful to the reference's own key
        // format (the alert keys on this column)
        concat_ws("", lit(clock.now.getYear), lit(clock.now.getMonthValue))
          .as("abr1_ano_mes"))
  }
}
