package graft.harness

import java.time.LocalDateTime

import org.apache.spark.sql.SparkSession

/** Catalog-to-view mapping: the engine's detectors read flat temp views
  * (`documento`, `vista`, ...); a deployment's entity tables live under
  * Hive schemas. The reference resolves this by interpolating schema
  * names into every query (src/alertas/main.py:22-30 options dict +
  * per-alert `.format(schema_...)` calls); here it is one registration
  * pass, so query code stays environment-free. */
object EntityViews {

  /** view name -> physical table, per option key (main.py:22-30). */
  val exadata: Seq[(String, String)] = Seq(
    "documento" -> "mcpr_documento",
    "vista" -> "mcpr_vista",
    "mcpr_andamento" -> "mcpr_andamento",
    "mcpr_sub_andamento" -> "mcpr_sub_andamento",
    "mcpr_item_movimentacao" -> "mcpr_item_movimentacao",
    "mcpr_movimentacao" -> "mcpr_movimentacao",
    "mcpr_personagem" -> "mcpr_personagem",
    "mcpr_pessoa" -> "mcpr_pessoa",
    "mcpr_pessoa_fisica" -> "mcpr_pessoa_fisica",
    "mcpr_correlacionamento" -> "mcpr_correlacionamento",
    "mcpr_assunto_documento" -> "mcpr_assunto_documento",
    "orgi_orgao" -> "orgi_orgao",
    "mprj_orgao_ext" -> "mprj_orgao_ext",
    "gate_info_tecnica" -> "gate_info_tecnica")

  val exadataAux: Seq[(String, String)] = Seq(
    "mmps_classe_hierarquia" -> "mmps_classe_hierarquia",
    "mmps_tp_andamento" -> "mmps_tp_andamento",
    "mmps_alias" -> "mmps_alias",
    "atualizacao_pj_pacote" -> "atualizacao_pj_pacote",
    "tb_penas_assuntos" -> "tb_penas_assuntos",
    "tb_pip_cisp" -> "tb_pip_cisp")

  val openGeo: Seq[(String, String)] = Seq(
    "seg_pub_in_pol_procedimento" -> "seg_pub_in_pol_procedimento",
    "institucional_orgaos_meio_ambiente" -> "institucional_orgaos_meio_ambiente",
    "plataforma_amb_saneamento_snis_info_indic_agua" ->
      "plataforma_amb_saneamento_snis_info_indic_agua",
    "plataforma_amb_saneamento_snis_info_indic_esgoto" ->
      "plataforma_amb_saneamento_snis_info_indic_esgoto",
    "plataforma_amb_saneamento_snis_info_indic_drenagem" ->
      "plataforma_amb_saneamento_snis_info_indic_drenagem",
    "meio_ambiente_amb_saneamento_snis_drenagem_info_indic_2018" ->
      "meio_ambiente_amb_saneamento_snis_drenagem_info_indic_2018")

  val compras: Seq[(String, String)] = Seq(
    "compras_fora_padrao_capital" -> "compras_fora_padrao_capital")

  def register(spark: SparkSession, schemaExadata: String, schemaAux: String,
               schemaOpenGeo: String, schemaCompras: String): Unit = {
    def reg(schema: String, views: Seq[(String, String)]): Unit =
      views.foreach { case (view, table) =>
        spark.table(s"$schema.$table").createOrReplaceTempView(view)
      }
    reg(schemaExadata, exadata)
    reg(schemaAux, exadataAux)
    reg(schemaOpenGeo, openGeo)
    reg(schemaCompras, compras)
  }
}

/** The spark-submit entry point — the reference's CLI run
  * (src/alertas/main.py:10-32 arg surface; alertas.sh:3-27 submit).
  *
  *   spark-submit --class graft.harness.RunAlerts <jar> \
  *     -e exadata -a exadata_aux -g opengeo -al alertas -ac compras \
  *     [-pl 90] [--include-disabled] [--date 2026-08-12T12:00]
  *
  * `-i/-o` (Impala host/port) are accepted and ignored: the reference
  * uses them only for a post-write INVALIDATE METADATA metadata hook
  * (src/alertas/utils.py:8-24), an out-of-engine concern here.
  * `--date` pins the run clock (defaults to now), the injectable-clock
  * replacement for the reference's current_date() drift. */
object RunAlerts {

  final case class Options(
    schemaExadata: String = "exadata",
    schemaExadataAux: String = "exadata_aux",
    schemaOpenGeo: String = "opengeo",
    schemaAlertas: String = "alertas",
    schemaCompras: String = "compras",
    prescricaoLimiar: Int = 90,
    includeDisabled: Boolean = false,
    clock: RunClock = RunClock(LocalDateTime.now()))

  def parse(args: Array[String]): Options = {
    @annotation.tailrec
    def loop(rest: List[String], o: Options): Options = rest match {
      case ("-e" | "--schemaExadata") :: v :: t => loop(t, o.copy(schemaExadata = v))
      case ("-a" | "--schemaExadataAux") :: v :: t => loop(t, o.copy(schemaExadataAux = v))
      case ("-g" | "--schemaOpenGeo") :: v :: t => loop(t, o.copy(schemaOpenGeo = v))
      case ("-al" | "--schemaAlertas") :: v :: t => loop(t, o.copy(schemaAlertas = v))
      case ("-ac" | "--schemaAlertasCompras") :: v :: t => loop(t, o.copy(schemaCompras = v))
      case ("-pl" | "--prescricaoLimiar") :: v :: t => loop(t, o.copy(prescricaoLimiar = v.toInt))
      case ("-i" | "--impalaHost" | "-o" | "--impalaPort") :: _ :: t => loop(t, o)
      case "--include-disabled" :: t => loop(t, o.copy(includeDisabled = true))
      case "--date" :: v :: t =>
        loop(t, o.copy(clock = RunClock(LocalDateTime.parse(v))))
      case Nil => o
      case bad :: _ => throw new IllegalArgumentException(s"unknown arg: $bad")
    }
    loop(args.toList, Options())
  }

  /** Library surface: register entity views from the catalog and run
    * the full alert lifecycle into `schemaAlertas`. */
  def run(spark: SparkSession, o: Options): Unit = {
    EntityViews.register(spark, o.schemaExadata, o.schemaExadataAux,
      o.schemaOpenGeo, o.schemaCompras)
    AlertRegistry.runAll(spark, o.schemaAlertas, o.clock,
      includeDisabled = o.includeDisabled, prescricaoLimiar = o.prescricaoLimiar)
  }

  def main(args: Array[String]): Unit = {
    val o = parse(args)
    // master/memory/shuffle tuning come from spark-submit conf
    // (the reference's alertas.sh:3-27); Hive catalog for entity tables
    val spark = SparkSession.builder()
      .appName("alertas_dominio")
      .enableHiveSupport()
      .getOrCreate()
    run(spark, o)
    spark.stop()
  }
}
