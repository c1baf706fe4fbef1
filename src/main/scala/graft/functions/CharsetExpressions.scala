package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression decoding a binary column to UTF-8 text
  * under a PER-ROW charset label — the legacy-encoding rung of real
  * web ingest (~10–20% of a live crawl is windows-125x / Shift_JIS /
  * GBK / EUC; decoding those bytes as UTF-8 silently yields mojibake
  * that then passes every downstream quality gate with garbage
  * trigram scores).
  *
  * Why a custom Expression (the §4 preference ladder, step b):
  * Spark's built-in `decode(bin, cs)` takes a LITERAL charset
  * restricted to the six UTF family/latin-1 names — it cannot decode
  * windows-1251, and it cannot vary by row, which is the whole point
  * of charset sniffing. One static-call scalar keeps the decode
  * inside whole-stage codegen, riding the scan like the entity
  * decoder.
  *
  * Label semantics (WHATWG-leaning, documented):
  *  - labels are trimmed + matched case-insensitively;
  *  - `iso-8859-1` / `latin1` / `us-ascii` / `ascii` decode as
  *    windows-1252 (the WHATWG encoding spec's remap — what every
  *    browser actually does; byte-identical to latin-1 outside the
  *    0x80–0x9F band, where real pages mean the windows glyphs);
  *  - `gb2312` decodes as GBK (same remap rationale);
  *  - an empty, unknown, or unsupported label falls back to UTF-8 —
  *    the modern-web default, never an error (a crawl must not die on
  *    a typo'd `charset=utf8mb4`);
  *  - malformed byte sequences and unmappable characters decode to
  *    U+FFFD (java.nio REPLACE semantics), never an exception.
  *
  * NULL propagates from either child (null bytes or null label →
  * null out, the standard binary-expression contract). */
case class CharsetDecode(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "charset_decode"

  override def nullSafeEval(bytes: Any, label: Any): Any =
    CharsetDecode.decode(bytes.asInstanceOf[Array[Byte]],
      label.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, l) =>
      s"org.apache.spark.sql.graftext.CharsetDecode.decode($b, $l)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CharsetDecode {

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  /** WHATWG label remaps applied before the JDK lookup. */
  private val remap: Map[String, String] = Map(
    "iso-8859-1" -> "windows-1252", "iso8859-1" -> "windows-1252",
    "latin1" -> "windows-1252", "l1" -> "windows-1252",
    "us-ascii" -> "windows-1252", "ascii" -> "windows-1252",
    "gb2312" -> "GBK")

  /** Resolve a label to a JDK Charset, or UTF-8 when the label is
    * empty/unknown/unsupported. Charset.forName hits the JDK's
    * two-level lookup cache, so per-row resolution is a map probe,
    * not a provider scan. */
  private[graftext] def charsetFor(label: String): java.nio.charset.Charset = {
    val name = label.trim.toLowerCase(java.util.Locale.ROOT)
    if (name.isEmpty) Utf8
    else
      try java.nio.charset.Charset.forName(remap.getOrElse(name, name))
      catch { case _: IllegalArgumentException | _: UnsupportedOperationException => Utf8 }
  }

  /** The codegen target: decode `bytes` under `label` with REPLACE
    * semantics (the `new String` constructor's contract — malformed
    * and unmappable input become U+FFFD, never an exception). */
  def decode(bytes: Array[Byte], label: UTF8String): UTF8String =
    UTF8String.fromString(new String(bytes, charsetFor(label.toString)))

  def column(bytes: Column, label: Column): Column =
    ExpressionUtils.column(CharsetDecode(
      ExpressionUtils.expression(bytes), ExpressionUtils.expression(label)))
}
