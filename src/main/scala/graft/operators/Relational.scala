package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable relational operator patterns from the reference's inventory
  * (SURVEY.md §2.3/§2.5), expressed Spark-first.
  */
object Relational {

  /** Max-per-group via groupBy + join-back — the reference's J7 pattern
    * (reference src/alertas/alerta_bdpa.py:40-51,72-82): ties on the max
    * value keep ALL tied rows. One shuffle for the aggregate, one for the
    * join; at scale, prefer [[latestPerGroup]] unless tie-keeping
    * semantics are required.
    */
  def maxPerGroupJoinBack(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val mx = df.groupBy(col(groupCol).as("__k"))
      .agg(max(col(valueCol)).as("__max"))
    df.join(mx, col(groupCol) === col("__k") && col(valueCol) === col("__max"))
      .drop("__k", "__max")
  }

  /** Idiomatic latest-row-per-group: window row_number == 1 with a
    * deterministic tie-break. Single shuffle on the partition keys —
    * the 100 TB-friendly replacement for J7 (SURVEY.md §2.5).
    */
  def latestPerGroup(df: DataFrame, partCols: Seq[String], orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(orderBy: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Unpivot n (name, value) measure pairs into rows — the reference's
    * U2 UNION-ALL unpivot (reference src/alertas/alerta_isps.py:78-92)
    * as a single-pass `stack`: no repeated scans of the input.
    */
  def unpivot(df: DataFrame, idCols: Seq[String], measures: Seq[(String, String)],
              nameCol: String = "measure", valueCol: String = "val"): DataFrame = {
    val pairs = measures.map { case (label, c) => s"'$label', $c" }.mkString(", ")
    val stackExpr = s"stack(${measures.size}, $pairs) as ($nameCol, $valueCol)"
    df.select(idCols.map(col) :+ expr(stackExpr): _*)
  }
}
