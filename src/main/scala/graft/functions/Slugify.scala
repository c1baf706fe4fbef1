package org.apache.spark.sql.graftext

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `slugify(s)`: NFD-normalize, drop non-ascii (so accents become their
  * base letters), collapse whitespace runs to `-`, lowercase — the
  * reference's `custom_slugify` UDF, which it registers for SQL use
  * (reference src/alertas/alerta_isps.py:27-34). Re-expressed as a
  * Catalyst expression (no Python worker); CodegenFallback is fine
  * because it is registered for parity, not on any hot path.
  */
case class Slugify(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "slugify"

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val decomposed = Normalizer.normalize(s, Normalizer.Form.NFD)
    val ascii = decomposed.filter(_ < 128)
    val slug = ascii.trim.toLowerCase.replaceAll("[\\s]+", "-")
    UTF8String.fromString(slug)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Slugify {
  def slugify(c: Column): Column =
    ExpressionUtils.column(Slugify(ExpressionUtils.expression(c)))

  /** Register for SQL use, mirroring the reference's
    * `spark.udf.register('SLUGIFY', ...)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "slugify", exprs => Slugify(exprs.head), "scala_udf")
}
