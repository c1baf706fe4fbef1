package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression decoding HTML character references —
  * the entity step (step 4) of [[graft.operators.Html.extractText]]'s
  * contract — in ONE left-to-right pass:
  *
  *  - numeric references `&#NNN;` / `&#xHH;` / `&#XHH;` per the
  *    WHATWG "numeric character reference end state"
  *    (html.spec.whatwg.org §13.2.5.80): NUL, surrogates
  *    (U+D800–DFFF), and codepoints above U+10FFFF decode to U+FFFD;
  *    0x80–0x9F decode through the windows-1252 remap table (the
  *    `&#146;` → U+2019 legacy-CMS apostrophe every real crawl hits);
  *    everything else decodes to the codepoint itself, supplementary
  *    planes included (surrogate-pair emit);
  *  - the fixed named table `&lt; &gt; &quot; &apos; &nbsp; &amp;`
  *    (nbsp normalizes to a PLAIN space — the extractor's whitespace
  *    step treats it like any other separator);
  *  - the terminating `;` is REQUIRED (semicolon-less legacy forms
  *    pass through verbatim — documented, spec-pinned);
  *  - anything that is not a complete reference passes through
  *    unchanged, and scanning resumes AFTER each decoded reference's
  *    replacement, so no output of one decode can seed another:
  *    `&amp;lt;` → `&lt;` and `&amp;#39;` → `&#39;` (the
  *    double-decode discipline the old replace-chain enforced by
  *    ordering `&amp;` last, now structural).
  *
  * Why a custom Expression (the §4 preference ladder, step b): the
  * named table was a replace-chain (fine), but decoding `&#NNN;`
  * needs a computed codepoint → string step no built-in scalar
  * provides (`chr` is ASCII-only in Spark, and a regexp split/zip
  * reassembly pays three pattern passes plus array churn per row).
  * One fused pass does table + numeric together, participates in
  * whole-stage codegen via a single static call, and replaces eight
  * chained `replace` expressions with one. Zero shuffle, rides the
  * scan.
  *
  * Lives in a subpackage of org.apache.spark.sql because
  * `AbstractDataType`/`ExpressionUtils` are `private[sql]`.
  */
case class HtmlEntityDecode(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "html_entity_decode"

  override def nullSafeEval(input: Any): Any =
    HtmlEntityDecode.decode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftext.HtmlEntityDecode.decode($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HtmlEntityDecode {

  /** WHATWG windows-1252 remap for numeric references 0x80–0x9F
    * (html.spec.whatwg.org §13.2.5.80 table; 0x81/0x8D/0x8F/0x90/0x9D
    * have no mapping and stay themselves). */
  private val win1252: Array[Int] = Array(
    0x20AC, 0x81, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021,
    0x02C6, 0x2030, 0x0160, 0x2039, 0x0152, 0x8D, 0x017D, 0x8F,
    0x90, 0x2018, 0x2019, 0x201C, 0x201D, 0x2022, 0x2013, 0x2014,
    0x02DC, 0x2122, 0x0161, 0x203A, 0x0153, 0x9D, 0x017E, 0x0178)

  /** Named table (semicolon excluded here, required by the scanner).
    * `&#39;`/`&#34;` from the old table are now the numeric path.
    * Names are pure ASCII, so the scanner compares raw UTF-8 bytes. */
  private val names: Array[Array[Byte]] =
    Array("lt", "gt", "quot", "apos", "nbsp", "amp")
      .map(_.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
  private val repls: Array[Byte] =
    Array('<', '>', '"', '\'', ' ', '&').map(_.toByte)

  private def mapCodepoint(v: Int): Int =
    if (v == 0 || v > 0x10FFFF || (v >= 0xD800 && v <= 0xDFFF)) 0xFFFD
    else if (v >= 0x80 && v <= 0x9F) win1252(v - 0x80)
    else v

  /** UTF-8-encode one codepoint into `out` at `pos`; returns the new
    * position. mapCodepoint never yields a surrogate, so the 3-byte
    * band is safe to emit unconditionally. */
  private def putCp(out: Array[Byte], pos: Int, cp: Int): Int = {
    if (cp < 0x80) { out(pos) = cp.toByte; pos + 1 }
    else if (cp < 0x800) {
      out(pos) = (0xC0 | (cp >> 6)).toByte
      out(pos + 1) = (0x80 | (cp & 0x3F)).toByte
      pos + 2
    } else if (cp < 0x10000) {
      out(pos) = (0xE0 | (cp >> 12)).toByte
      out(pos + 1) = (0x80 | ((cp >> 6) & 0x3F)).toByte
      out(pos + 2) = (0x80 | (cp & 0x3F)).toByte
      pos + 3
    } else {
      out(pos) = (0xF0 | (cp >> 18)).toByte
      out(pos + 1) = (0x80 | ((cp >> 12) & 0x3F)).toByte
      out(pos + 2) = (0x80 | ((cp >> 6) & 0x3F)).toByte
      out(pos + 3) = (0x80 | (cp & 0x3F)).toByte
      pos + 4
    }
  }

  /** One pass over the RAW UTF-8 BYTES; called from both interpreted
    * eval and codegen. All reference syntax (`&`, `#`, hex digits,
    * the named table, `;`) is ASCII, and UTF-8 continuation bytes are
    * >= 0x80, so a byte scan can never split a multi-byte character.
    * A decoded reference is never longer than its source text
    * (minimal numeric `&#N;` is 4 bytes in vs <= 3 out; named are
    * 4+ in vs 1 out), so one input-sized buffer suffices — no
    * String/StringBuilder round-trip per row (the q141 hot path). */
  def decode(text: UTF8String): UTF8String = {
    val n = text.numBytes
    var j = 0
    while (j < n && text.getByte(j) != '&') j += 1
    if (j == n) return text // fast path: no reference can exist
    val in = text.getBytes
    val out = new Array[Byte](n)
    var o = j
    if (j > 0) System.arraycopy(in, 0, out, 0, j)
    var i = j // next un-copied input byte; in(j) == '&'
    while (j < n) {
      // copy the run before this '&'
      if (j > i) { System.arraycopy(in, i, out, o, j - i); o += j - i; i = j }
      if (j + 1 < n && in(j + 1) == '#') {
        // numeric reference
        var k = j + 2
        val hex = k < n && (in(k) == 'x' || in(k) == 'X')
        if (hex) k += 1
        val start = k
        var v = 0
        var ok = true
        while (ok && k < n) {
          val c = in(k)
          val d =
            if (c >= '0' && c <= '9') c - '0'
            else if (hex && c >= 'a' && c <= 'f') c - 'a' + 10
            else if (hex && c >= 'A' && c <= 'F') c - 'A' + 10
            else -1
          if (d < 0) ok = false
          else {
            // clamp: anything past U+10FFFF is FFFD regardless of digits
            if (v <= 0x10FFFF) v = v * (if (hex) 16 else 10) + d
            k += 1
          }
        }
        if (k > start && k < n && in(k) == ';') {
          o = putCp(out, o, mapCodepoint(v))
          i = k + 1
        } else { out(o) = '&'; o += 1; i = j + 1 } // not a reference
      } else {
        // named reference
        var hit = -1
        var t = 0
        while (hit < 0 && t < names.length) {
          val name = names(t)
          val end = j + 1 + name.length
          if (end < n && in(end) == ';') {
            var m = 0
            while (m < name.length && in(j + 1 + m) == name(m)) m += 1
            if (m == name.length) hit = t
          }
          t += 1
        }
        if (hit >= 0) {
          out(o) = repls(hit); o += 1
          i = j + 2 + names(hit).length
        } else { out(o) = '&'; o += 1; i = j + 1 }
      }
      // scanning resumes AFTER the replacement: find the next '&'
      j = i
      while (j < n && in(j) != '&') j += 1
    }
    if (n > i) { System.arraycopy(in, i, out, o, n - i); o += n - i }
    UTF8String.fromBytes(out, 0, o)
  }

  def column(text: Column): Column =
    ExpressionUtils.column(HtmlEntityDecode(ExpressionUtils.expression(text)))
}
