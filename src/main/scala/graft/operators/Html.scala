package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → visible-text extraction: the step-0 ingest rung of every
  * web-scale corpus pipeline (C4 §2.1 and RefinedWeb §3.1 both start
  * from raw markup; the reference engine's corpora arrive pre-cleaned,
  * so this is an extension surface). Everything here is a staged
  * scalar `regexp_replace`/`replace` chain — codegen'd, zero shuffle,
  * the [[TextAnalysis.redactPii]] shape — and every pattern avoids
  * backreferences/lookaround so it runs identically on Java regex
  * (Spark) and RE2-based engines (the DuckDB oracle).
  *
  * Contract (the common-crawl-extractor core, kept deliberately
  * closed-form so an oracle can replay it):
  *   1. `<script>`/`<style>` elements are dropped WITH their content
  *      (case-insensitive, multiline, attributes allowed).
  *   2. HTML comments `<!-- ... -->` are dropped.
  *   3. Remaining tags are replaced by a space. The tag pattern
  *      tolerates `>` inside single- or double-quoted attribute
  *      values (`<a title="a > b">`) — the naive `<[^>]*>` truncates
  *      there. Unterminated `<` (a bare less-than in prose) is left
  *      alone: prose is not markup.
  *   4. A fixed entity table is decoded: `&lt; &gt; &quot; &apos;
  *      &#39; &#34; &nbsp;` and — LAST, so `&amp;lt;` cannot
  *      double-decode into `<` — `&amp;`. Arbitrary numeric entities
  *      are out of scope for the codegen path (decoding `&#NNN;`
  *      needs a computed chr(), not a replace table); they pass
  *      through verbatim, documented and spec-pinned.
  *   5. Whitespace (including the newlines block tags became) is
  *      collapsed to single spaces and trimmed.
  *
  * Scale shape: per-row scalar work inside one whole-stage-codegen
  * projection. No UDF, no shuffle, no driver round-trip; at 100 TB
  * this rides the scan like any other projection. */
object Html {

  /** Tag pattern step 3 above: quoted attribute values may contain
    * `>`; alternation consumes quoted runs atomically. RE2-safe. */
  private[graft] val tagPattern = "<[!/]?[A-Za-z](?:[^>\"']|\"[^\"]*\"|'[^']*')*>"

  /** `<!DOCTYPE ...>` and XML prolog-ish declarations match the tag
    * pattern's `<!` branch; `</p>` the `</` branch. */
  private[graft] val scriptPattern =
    "(?is)<script\\b(?:[^>\"']|\"[^\"]*\"|'[^']*')*>.*?</script\\s*>"
  private[graft] val stylePattern =
    "(?is)<style\\b(?:[^>\"']|\"[^\"]*\"|'[^']*')*>.*?</style\\s*>"
  private[graft] val commentPattern = "(?s)<!--.*?-->"

  /** Ordered entity table; `&amp;` deliberately last (see contract). */
  private[graft] val entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&apos;" -> "'",
    "&#39;" -> "'", "&#34;" -> "\"", "&nbsp;" -> " ", "&amp;" -> "&")

  /** Visible text of an HTML column per the five-step contract. */
  def extractText(html: Column): Column = {
    val noScript = regexp_replace(html, scriptPattern, " ")
    val noStyle = regexp_replace(noScript, stylePattern, " ")
    val noComment = regexp_replace(noStyle, commentPattern, " ")
    val noTags = regexp_replace(noComment, tagPattern, " ")
    val decoded = entities.foldLeft(noTags) { case (c, (from, to)) =>
      // literal replace (not regexp): left-to-right non-overlapping,
      // identical semantics in Spark and DuckDB (SCALE.md portable set)
      replace(c, lit(from), lit(to))
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }
}
