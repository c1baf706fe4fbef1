package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Output-family schema enforcement.
  *
  * Re-expresses the reference harness's column conformance (reference
  * src/alertas/jobs.py:273-277): every alert family has a fixed column
  * layout (jobs.py:61-96) that must be stable because the final write
  * is a positional `insertInto`; missing columns are added as typed
  * NULLs and the frame is order-normalized.
  */
object SchemaConform {

  /** Family layouts (reference jobs.py:61-96). */
  val Base: StructType = StructType(Seq(
    StructField("alrt_key", StringType),
    StructField("alrt_sigla", StringType),
    StructField("alrt_orgi_orga_dk", IntegerType)))

  private def extend(fields: (String, DataType)*): StructType =
    StructType(Base.fields ++ fields.map { case (n, t) => StructField(n, t) })

  val Abr1: StructType = extend(
    "abr1_nr_procedimentos" -> IntegerType, "abr1_ano_mes" -> StringType)

  val Ro: StructType = extend(
    "ro_nr_delegacia" -> StringType, "ro_qt_ros_faltantes" -> IntegerType,
    "ro_max_proc" -> StringType, "ro_cisp_nome_apresentacao" -> StringType)

  val Comp: StructType = extend(
    "comp_contratacao" -> IntegerType, "comp_item" -> StringType,
    "comp_id_item" -> IntegerType, "comp_contrato_iditem" -> StringType,
    "comp_dt_contratacao" -> StringType, "comp_var_perc" -> DoubleType)

  val Isps: StructType = extend(
    "isps_municipio" -> StringType, "isps_indicador" -> StringType,
    "isps_ano_referencia" -> IntegerType)

  val Mgp: StructType = extend(
    "alrt_docu_dk" -> IntegerType, "alrt_docu_nr_mp" -> StringType,
    "alrt_date_referencia" -> TimestampType, "alrt_dias_referencia" -> IntegerType,
    "alrt_dk_referencia" -> IntegerType, "alrt_info_adicional" -> StringType)

  /** Null-pad missing columns with their declared type and project into
    * declared order. Extra columns are dropped (the reference's
    * positional `select(colnames)`). */
  def conform(df: DataFrame, schema: StructType): DataFrame = {
    val padded = schema.fields.foldLeft(df) { (acc, f) =>
      if (acc.columns.contains(f.name)) acc
      else acc.withColumn(f.name, lit(null).cast(f.dataType))
    }
    padded.select(schema.fieldNames.map(col).toIndexedSeq: _*)
  }
}
