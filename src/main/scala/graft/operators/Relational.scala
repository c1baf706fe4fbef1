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

  /** As-of join: for every left row, attach the latest right row with
    * `right.ts <= left.ts` (inclusive) on the same key — the classic
    * time-series operator Spark lacks natively (builder guidance:
    * compose built-ins before custom plans).
    *
    * Implementation is a single-shuffle union + window carry:
    * tag both sides, union them conformed, sort each key partition by
    * (ts, side) so right rows precede left rows at equal timestamps,
    * and carry the last non-null right payload forward with
    * `last(..., ignoreNulls)` over an unbounded-preceding frame. At
    * 100 TB this beats the range-join formulation (one shuffle on the
    * key, linear scan per partition, no candidate blow-up) and is the
    * same topology a dedicated SortMergeAsofJoin physical operator
    * would use.
    *
    * Right payload columns are emitted as `r_<name>`. Assumes (key,
    * ts) is unique on the right side (ties among right rows at the
    * same instant would be resolved arbitrarily).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               ts: String, rightCols: Seq[String]): DataFrame = {
    val leftSchema = left.schema
    val lPart = left.select(
      (leftSchema.fieldNames.map(col).toSeq :+
        col(ts).as("__ts") :+ lit(1).as("__is_l")) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val rPart = right.select(
      (leftSchema.fields.map(f =>
        if (f.name == key) col(key) else lit(null).cast(f.dataType).as(f.name)).toSeq :+
        col(ts).as("__ts") :+ lit(0).as("__is_l")) ++
        rightCols.map(c => col(c).as(s"__r_$c")): _*)
    val unioned = lPart.union(rPart)
    // right rows (0) sort before left rows (1) at equal ts → inclusive
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts").asc, col("__is_l").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = unioned.withColumn("__r",
      last(when(col("__is_l") === 0,
        struct(rightCols.map(c => col(s"__r_$c").as(c)): _*)), ignoreNulls = true)
        .over(w))
    carried.filter(col("__is_l") === 1)
      .select(leftSchema.fieldNames.map(col).toSeq ++
        rightCols.map(c => col(s"__r.$c").as(s"r_$c")): _*)
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
