package org.apache.spark.sql.graftext

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd membership probe against a pre-built Bloom filter — the
  * manual form of Spark's own runtime row-level filtering
  * (InjectRuntimeFilter): build a bounded sketch of the dimension keys
  * once, broadcast it inside the expression tree, and drop
  * non-matching fact rows BEFORE they reach the join shuffle.
  *
  * The filter travels as serialized bytes (compact task binary) and is
  * deserialized once per JVM lazily; the codegen path references the
  * deserialized sketch directly, so the per-row cost is two hash
  * probes on a long — no boxing, no UDF. `Array[Byte]` has
  * reference-based equals, so equality/hashCode are overridden to
  * compare sketch CONTENT — without this, semantically identical
  * probes would never canonicalize equal and Catalyst's
  * common-expression reuse would always miss.
  *
  * Lives in a subpackage of org.apache.spark.sql because
  * `AbstractDataType`/`ExpressionUtils` are `private[sql]`; the
  * graft-facing API is [[graft.operators.Skew.bloomSemiJoin]].
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression with ExpectsInputTypes {

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $bloomRef.mightContainLong($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def equals(other: Any): Boolean = other match {
    case b: BloomMightContain =>
      child == b.child && java.util.Arrays.equals(bloomBytes, b.bloomBytes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bloomBytes)
}

object BloomColumns {
  def serialize(bloom: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    bloom.writeTo(out)
    out.toByteArray
  }

  def mightContain(key: Column, bloomBytes: Array[Byte]): Column =
    ExpressionUtils.column(BloomMightContain(
      ExpressionUtils.expression(key), bloomBytes))
}
