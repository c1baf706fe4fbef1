package graft.harness

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.SchemaConform

/** The shared "active documents" spine every document-family alert
  * filters through (reference src/alertas/jobs.py:202-248): open,
  * non-status-11 documents, excluding (a) documents routed to the two
  * special organs and (b) documents with an archival sub-andamento.
  *
  * Re-expressed Spark-first: the reference emulates both exclusions
  * with LEFT JOIN + IS NULL over a doubled join; here each exclusion
  * is a native left_anti join (same semantics — PropertySpec holds the
  * equivalence generally, ActiveDocsSpec pins the planted cases).
  *
  * Subtle semantics preserved (SURVEY.md §7.3 risk #3): the archival
  * CASE consults `cod_pct` from a LEFT JOIN against the organ-package
  * map — documents whose organ has NO package row get NULL `cod_pct`,
  * fall through every CASE branch to NULL, and are therefore NOT
  * archived, even if their sub-andamento code is in an archival set.
  *
  * Scale: both exclusion sets are tiny relative to the document table
  * (routing rows for 2 organs; archival vistas), so Catalyst/AQE
  * broadcast them as anti-join build sides; the spine is one scan of
  * `documento` with two broadcast anti probes, then cached once and
  * shared by every downstream alert (reference jobs.py:249-250).
  */
object ActiveDocs {

  /** Organs whose routed documents leave the active set
    * (reference jobs.py:210). */
  val routingExcludedOrgans: Seq[Int] = Seq(200819, 100500)

  /** Packages of the first archival branch (reference jobs.py:216). */
  val branchAPackages: Seq[Int] =
    (20 to 33) ++ (180 to 183)

  /** Archival sub-andamento type codes, branch A (packages 20-33 /
    * 180-183; reference jobs.py:217-227). */
  val branchACodes: Seq[Int] = Seq(
    7912, 6548, 6326, 6681, 6678, 6645, 6682, 6680, 6679,
    6644, 6668, 6666, 6665, 6669, 6667, 6664, 6655, 6662,
    6659, 6658, 6663, 6661, 6660, 6657, 6670, 6676, 6674,
    6673, 6677, 6675, 6672, 6018, 6341, 6338, 6019, 6017,
    6591, 6339, 6553, 7871, 6343, 6340, 6342, 6021, 6334,
    6331, 6022, 6020, 6593, 6332, 7872, 6336, 6333, 6335,
    7745, 6346, 6345, 6015, 6016, 6325, 6327, 6328, 6329,
    6330, 6337, 6344, 6656, 6671, 7869, 7870, 6324, 7834,
    7737, 6350, 6251, 6655, 6326)

  /** Archival codes, branch B (`cod_pct >= 200`; jobs.py:229-235). */
  val branchBCodes: Seq[Int] = Seq(
    6682, 6669, 6018, 6341, 6338, 6019, 6017, 6591, 6339,
    7871, 6343, 6340, 6342, 7745, 6346, 7915, 6272, 6253,
    6392, 6377, 6378, 6359, 6362, 6361, 6436, 6524, 7737,
    7811, 6625, 6718, 7834, 6350)

  /** The archival flag CASE (reference jobs.py:213-236): NULL unless a
    * branch matches — and NULL `cod_pct` never matches. */
  def isArquivamento(codPct: org.apache.spark.sql.Column,
                     staoTppr: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(codPct.isin(branchAPackages: _*) && staoTppr.isin(branchACodes: _*), 1)
      .when(codPct >= 200 && staoTppr.isin(branchBCodes: _*), 1)
      .otherwise(lit(null).cast("int"))

  /** Build the spine from registered temp views (documento, vista,
    * mcpr_andamento, mcpr_sub_andamento, mcpr_item_movimentacao,
    * mcpr_movimentacao, atualizacao_pj_pacote). */
  def spine(spark: SparkSession): DataFrame = {
    val documento = spark.table("documento")
    val routedAway = spark.table("mcpr_item_movimentacao")
      .join(spark.table("mcpr_movimentacao"),
        col("item_movi_dk") === col("movi_dk"))
      .filter(col("movi_orga_dk_destino").isin(routingExcludedOrgans: _*))
      .select(col("item_docu_dk"))
    val archived = documento
      .join(spark.table("atualizacao_pj_pacote"),
        col("id_orgao") === col("docu_orgi_orga_dk_responsavel"), "left")
      .join(spark.table("vista"), col("vist_docu_dk") === col("docu_dk"))
      .join(spark.table("mcpr_andamento"), col("pcao_vist_dk") === col("vist_dk"))
      .join(spark.table("mcpr_sub_andamento"), col("stao_pcao_dk") === col("pcao_dk"))
      .withColumn("is_arquivamento",
        isArquivamento(col("cod_pct"), col("stao_tppr_dk")))
      .filter(col("is_arquivamento").isNotNull)
      .select(col("vist_docu_dk"))
    documento
      .filter(col("docu_fsdc_dk") === 1 && col("docu_tpst_dk") =!= 11)
      .join(routedAway, col("docu_dk") === col("item_docu_dk"), "left_anti")
      .join(archived, col("docu_dk") === col("vist_docu_dk"), "left_anti")
  }

  /** Cache + force the spine and register it as `documentos_ativos`
    * (reference jobs.py:248-250 materialization barrier). */
  def registerCached(spark: SparkSession): DataFrame = {
    val s = spine(spark).cache()
    s.count()
    s.createOrReplaceTempView("documentos_ativos")
    s
  }
}

/** VADF — "vista aberta em documento fechado": an open vista on a
  * closed document (reference src/alertas/alerta_vadf.py:22-33).
  * One inner join + three filters + composite key; the minimum
  * end-to-end alert (SURVEY.md §7.1 build-order step 2). */
object VadfAlert extends Alert {
  val sigla = "VADF"
  val family = SchemaConform.Mgp
  val keyCols = Seq("alrt_docu_dk", "alrt_dk_referencia")

  /** The detection core over explicit frames: stateless join + filter
    * + project, so the same plan runs batch (build) or with a
    * streaming `vista` side (streaming/IncrementalAlerts). */
  def detect(documento: DataFrame, vista: DataFrame): DataFrame =
    documento
      .filter(col("docu_fsdc_dk") =!= 1)
      .filter(col("docu_tpst_dk") =!= 11)
      .join(vista.filter(col("vist_dt_fechamento_vista").isNull),
        col("vist_docu_dk") === col("docu_dk"))
      .select(
        col("docu_dk").as("alrt_docu_dk"),
        col("docu_nr_mp").as("alrt_docu_nr_mp"),
        col("vist_orgi_orga_dk").cast("int").as("alrt_orgi_orga_dk"),
        col("vist_dk").as("alrt_dk_referencia"))

  def build(spark: SparkSession): DataFrame =
    detect(spark.table("documento"), spark.table("vista"))
}
