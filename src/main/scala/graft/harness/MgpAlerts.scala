package graft.harness

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.SchemaConform
import graft.operators.Relational

/** The DataFrame-API document-family (MGP) alert detectors.
  *
  * Each re-expresses one reference detector's semantics Spark-first
  * (reference files cited per class). Shared conventions:
  *  - flat temp-view names (`documento`, `vista`, ...) stand in for the
  *    reference's schema-qualified Hive tables — the catalog mapping is
  *    an environment concern, not query semantics;
  *  - `broadcast()` hints kept exactly where the reference places them
  *    (its session disables auto-broadcast, jobs.py:125, so hints are
  *    the whole broadcast policy);
  *  - the run clock is injected (RunClock) instead of current_date()
  *    so a long run computes one consistent "today" and tests pin it.
  */

/** DORD — responsible-organ possibly stale: the latest andamento of an
  * open document was filed by an organ different from the responsible
  * one (reference src/alertas/alerta_dord.py:14-37). */
class DordAlert extends Alert {
  val sigla = "DORD"
  val family = SchemaConform.Mgp
  val keyCols: Seq[String] = Seq.empty // reference computes no uuidsha key

  def build(spark: SparkSession): DataFrame = {
    val docClasse = spark.table("documento")
      .join(broadcast(spark.table("mmps_classe_hierarquia")),
        col("docu_cldc_dk") === col("cldc_dk"), "left")
    val docAndamento = docClasse
      .join(spark.table("vista"), col("vist_docu_dk") === col("docu_dk"))
      .join(spark.table("mcpr_andamento").filter(col("pcao_tpsa_dk") === 2),
        col("pcao_vist_dk") === col("vist_dk"))
    // latest andamento per document, ties kept (J7 semantics)
    Relational.maxPerGroupJoinBack(docAndamento, "docu_dk", "pcao_dt_andamento")
      .filter(col("docu_tpst_dk") =!= 11)
      .filter(col("docu_fsdc_dk") === 1)
      .filter(col("vist_orgi_orga_dk") =!= col("docu_orgi_orga_dk_responsavel"))
      .select(
        col("docu_dk").as("alrt_docu_dk"),
        col("docu_nr_mp").as("alrt_docu_nr_mp"),
        col("pcao_dt_andamento").cast("timestamp").as("alrt_date_referencia"),
        col("docu_orgi_orga_dk_responsavel").as("alrt_orgi_orga_dk"))
  }
}

/** OUVI — ombudsman expedients pending receipt: routed guias of type 2
  * never received (reference src/alertas/alerta_ouvi.py:23-40). */
class OuviAlert extends Alert {
  val sigla = "OUVI"
  val family = SchemaConform.Mgp
  val keyCols = Seq("alrt_docu_dk", "alrt_dk_referencia")

  def build(spark: SparkSession): DataFrame = {
    val docClasse = spark.table("documento")
      .join(broadcast(spark.table("mmps_classe_hierarquia")),
        col("docu_cldc_dk") === col("cldc_dk"), "left")
    val docMov = spark.table("mcpr_item_movimentacao")
      .join(spark.table("mcpr_movimentacao"), col("item_movi_dk") === col("movi_dk"))
    docClasse.join(docMov, col("docu_dk") === col("item_docu_dk"))
      .filter(col("docu_tpdc_dk") === 119)
      .filter(col("docu_tpst_dk") =!= 11)
      .filter(col("item_in_recebimento").isNull)
      .filter(col("movi_tpgu_dk") === 2)
      .filter(col("movi_dt_recebimento_guia").isNull)
      .select(
        col("docu_dk").as("alrt_docu_dk"),
        col("docu_nr_mp").as("alrt_docu_nr_mp"),
        col("movi_orga_dk_destino").cast("int").as("alrt_orgi_orga_dk"),
        col("item_dk").as("alrt_dk_referencia"))
  }
}

/** GATE — new technical reports (ITs) not yet seen: documents whose
  * latest vista predates the IT registration, or that never had a
  * vista (reference src/alertas/alerta_gate.py:25-43, the positional
  * union U1 site). */
class GateAlert(clock: RunClock) extends Alert {
  val sigla = "GATE"
  val family = SchemaConform.Mgp
  val keyCols = Seq("alrt_docu_dk", "alrt_dk_referencia")

  def build(spark: SparkSession): DataFrame = {
    val vistaMax = spark.table("vista")
      .groupBy(col("vist_docu_dk"))
      .agg(max(col("vist_dt_abertura_vista")).as("dt_max_vista"))
    val docVista = spark.table("documento")
      .join(broadcast(spark.table("mmps_classe_hierarquia")),
        col("docu_cldc_dk") === col("cldc_dk"), "left")
      .join(broadcast(spark.table("gate_info_tecnica")),
        col("docu_dk") === col("itcn_docu_dk"))
      .join(vistaMax, col("docu_dk") === col("vist_docu_dk"), "left")
    val semVista = docVista.filter(col("dt_max_vista").isNull)
    val vistaAnterior = docVista.filter(col("itcn_dt_cadastro") > col("dt_max_vista"))
    semVista.union(vistaAnterior) // positional union, as the reference
      .withColumn("elapsed",
        datediff(lit(clock.ts).cast("date"), col("itcn_dt_cadastro")).cast("int"))
      .select(
        col("itcn_dk").as("alrt_dk_referencia"),
        col("docu_dk").as("alrt_docu_dk"),
        col("docu_nr_mp").as("alrt_docu_nr_mp"),
        col("itcn_dt_cadastro").as("alrt_date_referencia"),
        col("docu_orgi_orga_dk_responsavel").as("alrt_orgi_orga_dk"),
        col("elapsed").as("alrt_dias_referencia"))
  }
}

/** OFFP — official letter past its one-year deadline (reference
  * src/alertas/alerta_offp.py:23-48).
  *
  * Deliberate divergence, documented: the reference's key recipe
  * references pre-aggregation columns that no longer exist after its
  * groupBy (offp.py:45-47 vs key_columns docu_dk/dt_fim_prazo — the
  * alert is disabled in its registry, jobs.py:106). We key on the
  * aliased equivalents (alrt_docu_dk, alrt_date_referencia), which is
  * the recipe's intent, and emit the grouped max-elapsed as
  * alrt_dias_referencia. */
class OffpAlert(clock: RunClock) extends Alert {
  val sigla = "OFFP"
  val family = SchemaConform.Mgp
  val keyCols = Seq("alrt_docu_dk", "alrt_date_referencia")

  def build(spark: SparkSession): DataFrame = {
    val doc = spark.table("documento")
      .filter(col("docu_tpst_dk") =!= 11)
      .filter(col("docu_fsdc_dk") === 1)
    doc
      .join(broadcast(spark.table("mmps_classe_hierarquia")),
        col("docu_cldc_dk") === col("cldc_dk"), "left")
      .join(spark.table("vista"), col("docu_dk") === col("vist_docu_dk"))
      .join(spark.table("mcpr_andamento").filter(col("pcao_dt_cancelamento").isNull),
        col("vist_dk") === col("pcao_vist_dk"))
      .join(spark.table("mcpr_sub_andamento").filter(col("stao_tppr_dk") === 6497),
        col("pcao_dk") === col("stao_pcao_dk"))
      .withColumn("dt_fim_prazo",
        date_add(col("pcao_dt_andamento"), 365).cast("timestamp"))
      .withColumn("elapsed",
        datediff(lit(clock.ts).cast("date"), col("dt_fim_prazo")).cast("int"))
      .filter(col("elapsed") > 0)
      .groupBy(
        col("docu_dk").as("alrt_docu_dk"),
        col("docu_nr_mp").as("alrt_docu_nr_mp"),
        col("dt_fim_prazo").as("alrt_date_referencia"),
        col("docu_orgi_orga_dk_responsavel").as("alrt_orgi_orga_dk"))
      .agg(max(col("elapsed")).as("alrt_dias_referencia"))
  }
}

/** DT2I — movement in a second-instance case within the last week,
  * after an appeal that followed a ciência (reference
  * src/alertas/alerta_dt2i.py:29-96). */
class Dt2iAlert(clock: RunClock) extends Alert {
  val sigla = "DT2I"
  val family = SchemaConform.Mgp
  val keyCols = Seq("alrt_docu_dk", "alrt_date_referencia")

  /** Ciência (awareness) sub-andamento codes (dt2i.py:20). */
  val ciencias: Seq[Int] = Seq(6374, 6375, 6376, 6377, 6378)
  /** Appeal sub-andamento codes (dt2i.py:21-25). */
  val recursos: Seq[Int] = Seq(
    6449, 6451, 6453, 6454, 6455, 6456, 6457, 6458, 6459, 6460, 6461, 6462,
    6463, 6464, 6465, 6466, 6467, 6468, 6470, 6471, 6472, 6473, 6474, 6475,
    6476, 6477, 6478, 6479, 6529, 6530, 6554, 6555, 7824, 7825, 7850)

  def build(spark: SparkSession): DataFrame = {
    val sub = spark.table("mcpr_sub_andamento")
    val docAndamento = spark.table("documento")
      .join(broadcast(spark.table("mmps_classe_hierarquia")),
        col("docu_cldc_dk") === col("cldc_dk"), "left")
      .join(spark.table("vista"), col("docu_dk") === col("vist_docu_dk"))
      .join(spark.table("mcpr_andamento").filter(col("pcao_dt_cancelamento").isNull),
        col("vist_dk") === col("pcao_vist_dk"))

    val recente = docAndamento
      .withColumn("elapsed",
        datediff(lit(clock.ts).cast("date"), col("pcao_dt_andamento")).cast("int"))
      .filter(col("elapsed") <= 7)
      .select(
        col("docu_dk").as("alrt_docu_dk"),
        col("docu_nr_mp").as("alrt_docu_nr_mp"),
        col("pcao_dt_andamento"),
        col("docu_orgi_orga_dk_responsavel").as("alrt_orgi_orga_dk"),
        col("elapsed"))

    val ciencia = docAndamento
      .join(sub.filter(col("stao_tppr_dk").isin(ciencias: _*)),
        col("pcao_dk") === col("stao_pcao_dk"))
      .select(col("docu_dk").as("cie_docu_dk"),
        col("pcao_dt_andamento").as("cie_dt_mov"))
    val recurso = docAndamento
      .join(sub.filter(col("stao_tppr_dk").isin(recursos: _*)),
        col("pcao_dk") === col("stao_pcao_dk"))
      .select(col("docu_dk").as("rec_docu_dk"),
        col("pcao_dt_andamento").as("rec_dt_mov"))

    ciencia.join(recurso, col("cie_docu_dk") === col("rec_docu_dk"))
      .filter(col("rec_dt_mov") >= col("cie_dt_mov"))
      .join(recente, col("rec_docu_dk") === col("alrt_docu_dk"))
      .groupBy(col("alrt_docu_dk"), col("alrt_docu_nr_mp"), col("alrt_orgi_orga_dk"))
      .agg(
        max(col("pcao_dt_andamento")).as("alrt_date_referencia"),
        min(col("elapsed")).as("alrt_dias_referencia"))
  }
}

/** MVVD — recurring domestic-violence victims in documents registered
  * in the last 30 days: a 5-way identity-match union (person id, CPF,
  * RG, name+mother, name+birthdate) against victims of past cases
  * (reference src/alertas/alerta_mvvd.py:29-69, the U2 union site). */
class MvvdAlert(clock: RunClock) extends Alert {
  val sigla = "MVVD"
  val family = SchemaConform.Mgp
  val keyCols = Seq("alrt_docu_dk")

  def build(spark: SparkSession): DataFrame = {
    val pessoaVitima = spark.table("mcpr_pessoa_fisica")
      .join(spark.table("mcpr_personagem")
        .filter(col("pers_tppe_dk") === 3 || col("pers_tppe_dk") === 290),
        col("pesf_pess_dk") === col("pers_pess_dk"))

    val vitimasPassadas = pessoaVitima
      .join(spark.table("documento").filter(col("docu_mate_dk") === 43),
        col("pers_docu_dk") === col("docu_dk"))
      .select(
        col("pesf_pess_dk").as("vict_pess_dk"),
        col("pesf_cpf").as("vict_cpf"),
        col("pesf_nr_rg").as("vict_rg"),
        col("pesf_nm_pessoa_fisica").as("vict_nome"),
        col("pesf_nm_mae").as("vict_mae"),
        col("pesf_dt_nasc").as("vict_nasc"),
        col("docu_dk").as("vict_docu_dk"))

    val docRecente = spark.table("documento")
      .filter(datediff(lit(clock.ts).cast("date"), col("docu_dt_cadastro")) <= 30)
      .filter(col("docu_mate_dk") === 43)
      .join(broadcast(spark.table("mmps_classe_hierarquia")),
        col("docu_cldc_dk") === col("cldc_dk"), "left")
    val docVitima = pessoaVitima
      .join(docRecente, col("pers_docu_dk") === col("docu_dk"))
      .select(col("docu_dk"), col("docu_nr_mp"),
        col("docu_orgi_orga_dk_responsavel"), col("pesf_pess_dk"),
        col("pesf_cpf"), col("pesf_nr_rg"), col("pesf_nm_pessoa_fisica"),
        col("pesf_nm_mae"), col("pesf_dt_nasc"))

    val out = Seq(
      col("docu_dk").as("alrt_docu_dk"),
      col("docu_nr_mp").as("alrt_docu_nr_mp"),
      col("docu_orgi_orga_dk_responsavel").as("alrt_orgi_orga_dk"))
    def matchOn(cond: org.apache.spark.sql.Column,
                extra: org.apache.spark.sql.Column = lit(true)): DataFrame =
      docVitima.join(vitimasPassadas,
        cond && col("vict_docu_dk") =!= col("docu_dk"))
        .filter(extra).select(out: _*)

    matchOn(col("pesf_pess_dk") === col("vict_pess_dk"))
      .union(matchOn(col("pesf_cpf") === col("vict_cpf"),
        col("pesf_cpf") =!= "00000000000"))
      .union(matchOn(col("pesf_nr_rg") === col("vict_rg")))
      .union(matchOn(col("pesf_nm_pessoa_fisica") === col("vict_nome") &&
        col("pesf_nm_mae") === col("vict_mae")))
      .union(matchOn(col("pesf_nm_pessoa_fisica") === col("vict_nome") &&
        col("pesf_dt_nasc") === col("vict_nasc")))
      .distinct()
  }
}
