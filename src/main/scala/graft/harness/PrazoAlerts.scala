package graft.harness

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.SchemaConform

/** The four deadline ("prazo") alerts — IC1A, PA1A, PPFP, NF30 — share
  * one skeleton the reference repeats as near-identical SQL
  * (src/alertas/alerta_ic1a.py:33-76, alerta_pa1a.py:33-67,
  * alerta_ppfp.py:29-71, alerta_nf30.py:34-73; factoring noted in
  * SURVEY.md §7.1 step 5):
  *
  *   documentos_ativos of one class family
  *     LEFT JOIN correlated-case exclusion (corr_tpco_dk IN (2,6) →
  *       corr_tpco_dk IS NULL keeps uncorrelated docs — J4 emulation,
  *       kept in left+filter form because the probe also feeds no
  *       other columns)
  *     LEFT JOIN its non-cancelled andamentos restricted to the
  *       alert's code set (vista ⋈ andamento ⋈ sub_andamento)
  *   GROUP BY document → dt_inicio = latest relevant andamento date,
  *       falling back to docu_dt_cadastro (the CASE WHEN MAX(...)
  *       pattern = coalesce(max(..), cadastro))
  *   then an alert-specific deadline predicate over dt_inicio.
  *
  * [[PrazoSkeleton.grouped]] builds the shared grouped core; each
  * detector adds its own per-row derived columns, aggregates, and
  * deadline logic. The left-joined andamento side is pre-filtered to
  * the code set BEFORE the join (as the reference's subquery does), so
  * the explode-then-group stays proportional to matching andamentos,
  * not all andamentos — the property that keeps this skeleton viable
  * at 100 TB.
  */
object PrazoSkeleton {

  /** Correlation types that exclude a document (ic1a.py:44). */
  val corrExcludeTypes: Seq[Int] = Seq(2, 6)

  /** The shared exploded frame: one row per (active doc of the class
    * family) × (matching non-cancelled andamento, or a single
    * all-NULL row if none). `extraCols` lets a detector derive
    * per-andamento columns before grouping. */
  def exploded(spark: SparkSession, classFilter: Column, codes: Seq[Int],
               docFilter: Column = lit(true)): DataFrame = {
    val corr = spark.table("mcpr_correlacionamento")
      .filter(col("corr_tpco_dk").isin(corrExcludeTypes: _*))
      .select(col("corr_docu_dk2"))
    val andamentos = spark.table("vista")
      .join(spark.table("mcpr_andamento"), col("pcao_vist_dk") === col("vist_dk"))
      .join(spark.table("mcpr_sub_andamento"), col("stao_pcao_dk") === col("pcao_dk"))
      .filter(col("pcao_dt_cancelamento").isNull)
      .filter(col("stao_tppr_dk").isin(codes: _*))
    spark.table("documentos_ativos")
      .filter(classFilter && docFilter)
      // uncorrelated docs only (reference: LEFT JOIN + corr_tpco_dk IS NULL)
      .join(corr, col("corr_docu_dk2") === col("docu_dk"), "left_anti")
      .join(andamentos, col("vist_docu_dk") === col("docu_dk"), "left")
  }

  val docKeys: Seq[String] =
    Seq("docu_dk", "docu_nr_mp", "docu_orgi_orga_dk_responsavel", "docu_dt_cadastro")
}

/** IC1A — civil inquiries (class 392) without extension for over a
  * year (reference src/alertas/alerta_ic1a.py:27-80). Adds two
  * exclusions (correlated docs, "GRUPO DE ATUAÇÃO" organs) and
  * enriches the triggering sub-andamento with its type hierarchy. */
class Ic1aAlert(clock: RunClock) extends Alert {
  val sigla = "IC1A"
  val family = SchemaConform.Mgp
  val keyCols = Seq("alrt_docu_dk", "alrt_date_referencia")

  val codes: Seq[Int] = Seq(6291, 6511, 6012, 6002) // prorrogação + instauração
  private val prazo = 365

  def build(spark: SparkSession): DataFrame = {
    val grupoAtuacao = spark.table("orgi_orgao")
      .filter(col("orgi_nm_orgao").like("%GRUPO DE ATUAÇÃO%"))
      .select(col("orgi_dk"))
    val grouped = PrazoSkeleton
      .exploded(spark, col("docu_cldc_dk") === 392, codes,
        col("docu_tpst_dk") =!= 3)
      .join(grupoAtuacao, col("orgi_dk") === col("docu_orgi_orga_dk_carga"), "left_anti")
      .groupBy(PrazoSkeleton.docKeys.map(col): _*)
      .agg(
        coalesce(max(col("pcao_dt_andamento")), col("docu_dt_cadastro")).as("dt_inicio"),
        // max(stao_dk) INDEPENDENT of max(date) ON PURPOSE: the
        // reference aggregates the two maxes in one GROUP BY
        // (alerta_ic1a.py:42-43), so the referenced sub-andamento can
        // come from a different row than the one defining dt_inicio —
        // faithful quirk (max_by would diverge from the reference)
        max(col("stao_dk")).as("stao_dk"))
    grouped
      .filter(datediff(lit(clock.ts), col("dt_inicio")) > prazo)
      .join(spark.table("mcpr_sub_andamento")
        .select(col("stao_dk").as("s_stao_dk"), col("stao_tppr_dk")),
        col("stao_dk") === col("s_stao_dk"), "left")
      .join(broadcast(spark.table("mmps_tp_andamento")),
        col("stao_tppr_dk") === col("id"), "left")
      .select(
        col("docu_dk").as("alrt_docu_dk"),
        col("docu_nr_mp").as("alrt_docu_nr_mp"),
        date_add(col("dt_inicio"), prazo).cast("timestamp").as("alrt_date_referencia"),
        col("docu_orgi_orga_dk_responsavel").as("alrt_orgi_orga_dk"),
        (datediff(lit(clock.ts), col("dt_inicio")) - prazo).cast("int")
          .as("alrt_dias_referencia"),
        col("stao_dk").as("alrt_dk_referencia"),
        coalesce(col("hierarquia"), lit("Cadastro do Procedimento no Sistema"))
          .as("alrt_info_adicional"))
  }
}

/** PA1A — administrative procedures (classes 51219-51223) without
  * extension for over a year (reference src/alertas/alerta_pa1a.py:
  * 27-72). The minimal instance of the skeleton. */
class Pa1aAlert(clock: RunClock) extends Alert {
  val sigla = "PA1A"
  val family = SchemaConform.Mgp
  val keyCols = Seq("alrt_docu_dk", "alrt_date_referencia")

  val codes: Seq[Int] = Seq(6291, 6013)
  private val prazo = 365

  def build(spark: SparkSession): DataFrame =
    PrazoSkeleton
      .exploded(spark,
        col("docu_cldc_dk").isin(51219, 51220, 51221, 51222, 51223),
        codes, col("docu_tpst_dk") =!= 3)
      .groupBy(PrazoSkeleton.docKeys.map(col): _*)
      .agg(coalesce(max(col("pcao_dt_andamento")), col("docu_dt_cadastro")).as("dt_inicio"))
      .filter(datediff(lit(clock.ts), col("dt_inicio")) > prazo)
      .filter(datediff(lit(clock.ts), col("dt_inicio")) - prazo > 0)
      .select(
        col("docu_dk").as("alrt_docu_dk"),
        col("docu_nr_mp").as("alrt_docu_nr_mp"),
        date_add(col("dt_inicio"), prazo).cast("timestamp").as("alrt_date_referencia"),
        col("docu_orgi_orga_dk_responsavel").as("alrt_orgi_orga_dk"),
        (datediff(lit(clock.ts), col("dt_inicio")) - prazo).cast("int")
          .as("alrt_dias_referencia"))
}

/** PPFP / PPPV — preparatory procedures (class 395) past deadline or
  * approaching it (reference src/alertas/alerta_ppfp.py:25-75). Emits
  * a per-row sigla: PPFP once the 90/180-day deadline passed, PPPV in
  * the 20-day approach window — the reference's two-siglas-one-
  * detector pattern. */
class PpfpAlert(clock: RunClock) extends Alert {
  val sigla = "PPFP"
  val family = SchemaConform.Mgp
  val keyCols = Seq("alrt_docu_dk", "alrt_date_referencia")

  private val prorrogacao = 6291
  private val autuacao = 6011

  def build(spark: SparkSession): DataFrame = {
    val grouped = PrazoSkeleton
      .exploded(spark, col("docu_cldc_dk") === 395,
        Seq(prorrogacao, autuacao), col("docu_tpst_dk") =!= 3)
      .withColumn("dt_instauracao",
        when(col("stao_tppr_dk") === autuacao, col("pcao_dt_andamento")))
      .withColumn("nr_dias_prazo_row",
        when(col("stao_tppr_dk") === prorrogacao, 180).otherwise(90))
      .groupBy(PrazoSkeleton.docKeys.map(col): _*)
      .agg(
        coalesce(max(col("dt_instauracao")), col("docu_dt_cadastro")).as("dt_inicio"),
        max(col("nr_dias_prazo_row")).as("nr_dias_prazo"))
    grouped
      .withColumn("elapsed", datediff(lit(clock.ts), col("dt_inicio")))
      .filter(col("elapsed") > col("nr_dias_prazo") - 20)
      .select(
        col("docu_dk").as("alrt_docu_dk"),
        col("docu_nr_mp").as("alrt_docu_nr_mp"),
        col("docu_orgi_orga_dk_responsavel").as("alrt_orgi_orga_dk"),
        date_add(col("dt_inicio"), col("nr_dias_prazo")).cast("timestamp")
          .as("alrt_date_referencia"),
        abs(col("elapsed") - col("nr_dias_prazo")).cast("int")
          .as("alrt_dias_referencia"),
        when(col("elapsed") > col("nr_dias_prazo"), "PPFP").otherwise("PPPV")
          .as("alrt_sigla"))
  }
}

/** NF30 / NF120 — fact notices (class 393) past their 30/120-day
  * deadline, unless already converted into a procedure (reference
  * src/alertas/alerta_nf30.py:27-76; the HAVING site A4). */
class Nf30Alert(clock: RunClock) extends Alert {
  val sigla = "NF30"
  val family = SchemaConform.Mgp
  val keyCols = Seq("alrt_docu_dk", "alrt_date_referencia")

  val conversao: Seq[Int] = Seq(6011, 6012, 6013, 6014, 6251, 6252, 6253,
    6259, 6260, 6516, 6533, 6556, 6567, 6628)
  val prorrogacao: Seq[Int] = Seq(6291, 7282, 7283)
  val autuacao: Seq[Int] = Seq(6034, 6631, 7751, 7752, 6035, 7754, 7753, 6007, 6632)

  def build(spark: SparkSession): DataFrame = {
    val grouped = PrazoSkeleton
      .exploded(spark, col("docu_cldc_dk") === 393,
        conversao ++ prorrogacao ++ autuacao)
      .withColumn("dt_autuacao",
        when(col("stao_tppr_dk").isin(autuacao: _*), col("pcao_dt_andamento")))
      .withColumn("flag_conversao",
        when(col("stao_tppr_dk").isin(conversao: _*), 1).otherwise(0))
      .withColumn("nr_dias_prazo_row",
        when(col("stao_tppr_dk").isin(prorrogacao: _*), 120).otherwise(30))
      .groupBy(PrazoSkeleton.docKeys.map(col): _*)
      .agg(
        coalesce(max(col("dt_autuacao")), col("docu_dt_cadastro")).as("dt_inicio"),
        max(col("nr_dias_prazo_row")).as("nr_dias_prazo"),
        max(col("flag_conversao")).as("flag_conversao"))
      .filter(col("flag_conversao") === 0) // HAVING MAX(flag_conversao) = 0
    grouped
      .withColumn("elapsed", datediff(lit(clock.ts), col("dt_inicio")))
      .filter(col("elapsed") > col("nr_dias_prazo"))
      .select(
        col("docu_dk").as("alrt_docu_dk"),
        col("docu_nr_mp").as("alrt_docu_nr_mp"),
        col("dt_inicio").cast("timestamp").as("alrt_date_referencia"),
        col("docu_orgi_orga_dk_responsavel").as("alrt_orgi_orga_dk"),
        col("elapsed").cast("int").as("alrt_dias_referencia"),
        when(col("elapsed") > 120, "NF120").otherwise("NF30").as("alrt_sigla"))
  }
}
