package graft.harness

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.SchemaConform
import graft.operators.Relational

/** BDPA — delayed return from police ("baixa à delegacia sem
  * retorno"): open status-3 documents whose latest (post-2013)
  * andamento is a "baixa" sub-andamento with a deadline, and whose
  * latest case-file routing went to a police organ longer ago than
  * that deadline allows (reference src/alertas/alerta_bdpa.py:24-97,
  * SURVEY.md §3.2 — the double max-per-group chain).
  *
  * Shape preserved Spark-first:
  *  - reads raw `documento` (status 3, open — alerta_bdpa.py:25), NOT
  *    the documentos_ativos spine: BDPA alerts even on documents the
  *    shared spine excludes (routed/archived);
  *  - `nm_delegacia` comes from a left join of `mprj_orgao_ext` on the
  *    document's originating police station
  *    (docu_orge_orga_dk_deleg_origem, alerta_bdpa.py:27-32) and is
  *    emitted as `alrt_info_adicional`. The reference joins the name in
  *    FIRST and carries the string through the whole chain; since the
  *    name is functionally dependent on the (unique-keyed) origin
  *    organ, this plan carries only the int key through both
  *    max-per-group shuffles and resolves the name against the
  *    broadcast dim at the end — same rows, narrower shuffles;
  *  - andamentos are floored at 2013-01-01 (alerta_bdpa.py:38) — both
  *    a semantic bound and a scan-pruning predicate at scale;
  *  - latest andamento per document and latest movimentação per
  *    document are both the reference's J7 groupBy+join-back (ties
  *    keep all rows, as the reference does); the final `distinct()`
  *    (alerta_bdpa.py:97) collapses tie-duplicated alert rows;
  *  - the `mmps_tp_andamento` join (alerta_bdpa.py:55-57) is a pure
  *    filter on its 10-id baixa set, expressed as a direct `isin`;
  *  - the reference also left-joins the class-hierarchy dim
  *    (alerta_bdpa.py:33-34) but never consumes its columns — a
  *    row-preserving no-op on a unique-keyed dim, omitted here;
  *  - `movi_dt_guia = coalesce(recebimento, envio, criação)` (P9);
  *  - deadline arithmetic `date_add` + `datediff` against the
  *    injectable run clock (no current_date drift, §7.3 risk 2);
  *  - police-organ filter on the external-organ type
  *    (alerta_bdpa.py:85-90).
  *
  * Scale: the movimentação max-per-group runs AFTER the join to the
  * baixa candidates (the reference's own order, alerta_bdpa.py:60-74),
  * so the aggregate shuffles only the candidate documents' routing
  * rows, never the full movimentação table.
  */
class BdpaAlert(clock: RunClock,
                baixaCodes: Seq[Int] =
                  Seq(6006, 6010, 6363, 6494, 6495, 6519, 6520, 6521, 6522, 6523),
                policeOrganTypes: Seq[Int] = Seq(60, 61, 68)) extends Alert {
  val sigla = "BDPA"
  val family = SchemaConform.Mgp
  val keyCols = Seq("alrt_docu_dk", "alrt_date_referencia")

  def build(spark: SparkSession): DataFrame = {
    val orgaoExt = spark.table("mprj_orgao_ext")

    val docs = spark.table("documento")
      .filter(col("docu_tpst_dk") === 3 && col("docu_fsdc_dk") === 1)
      .select("docu_dk", "docu_nr_mp", "docu_orgi_orga_dk_responsavel",
        "docu_orge_orga_dk_deleg_origem")

    // latest post-2013 andamento per document (J7 #1)
    val andamentos = docs
      .join(spark.table("vista"), col("vist_docu_dk") === col("docu_dk"))
      .join(spark.table("mcpr_andamento")
          .filter(col("pcao_dt_andamento") >= lit("2013-01-01").cast("date")),
        col("pcao_vist_dk") === col("vist_dk"))
    val lastAnd = Relational.maxPerGroupJoinBack(
      andamentos, "docu_dk", "pcao_dt_andamento")

    // its "baixa" sub-andamento with a deadline
    val withPrazo = lastAnd
      .join(spark.table("mcpr_sub_andamento"), col("stao_pcao_dk") === col("pcao_dk"))
      .filter(col("stao_tppr_dk").isin(baixaCodes: _*) &&
        col("stao_nr_dias_prazo").isNotNull)

    // candidate docs' routings only, then latest per document (J7 #2);
    // guia date by coalesce (P9)
    val movs = withPrazo
      .join(spark.table("mcpr_item_movimentacao"),
        col("item_docu_dk") === col("docu_dk"))
      .join(spark.table("mcpr_movimentacao"), col("item_movi_dk") === col("movi_dk"))
      .withColumn("movi_dt_guia", coalesce(
        col("movi_dt_recebimento_guia"), col("movi_dt_envio_guia"),
        col("movi_dt_criacao_guia")))
    val lastMov = Relational.maxPerGroupJoinBack(movs, "docu_dk", "movi_dt_guia")
      .join(orgaoExt
          .filter(col("orge_tpoe_dk").isin(policeOrganTypes: _*))
          .select(col("orge_orga_dk").as("orge_orga_dk_policia")),
        col("movi_orga_dk_destino") === col("orge_orga_dk_policia"))

    lastMov
      .withColumn("dt_fim_prazo",
        date_add(col("movi_dt_guia"), col("stao_nr_dias_prazo")))
      .withColumn("elapsed", datediff(lit(clock.ts).cast("date"), col("dt_fim_prazo")))
      .filter(col("elapsed") > 0)
      .select(
        col("docu_dk").as("alrt_docu_dk"),
        col("docu_nr_mp").as("alrt_docu_nr_mp"),
        col("docu_orgi_orga_dk_responsavel").cast("int").as("alrt_orgi_orga_dk"),
        col("dt_fim_prazo").cast("timestamp").as("alrt_date_referencia"),
        col("elapsed").as("alrt_dias_referencia"),
        col("docu_orge_orga_dk_deleg_origem"))
      .distinct()
      // resolve the station name on the reduced alert set only
      .join(broadcast(orgaoExt.select(col("orge_orga_dk"),
          col("orge_nm_orgao").as("alrt_info_adicional"))),
        col("docu_orge_orga_dk_deleg_origem") === col("orge_orga_dk"), "left")
      .drop("docu_orge_orga_dk_deleg_origem", "orge_orga_dk")
  }
}
