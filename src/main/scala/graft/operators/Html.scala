package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  *   4. Character references are decoded in ONE left-to-right pass
  *      ([[org.apache.spark.sql.graftext.HtmlEntityDecode]]): the
  *      named table `&lt; &gt; &quot; &apos; &nbsp; &amp;` plus
  *      numeric `&#NNN;`/`&#xHH;` per WHATWG semantics (NUL /
  *      surrogates / >U+10FFFF → U+FFFD; 0x80–0x9F through the
  *      windows-1252 remap; supplementary planes emitted as
  *      surrogate pairs; `;` required). Scanning resumes after each
  *      replacement, so no decode can seed another: `&amp;lt;` →
  *      `&lt;` and `&amp;#39;` → `&#39;` — the double-decode
  *      discipline the old `&amp;`-last replace chain enforced by
  *      ordering is now structural.
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

  /** Named entity surface (the numeric forms ride the WHATWG numeric
    * path); decode itself is the single-pass [[HtmlEntityDecode]]. */
  private[graft] val entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&apos;" -> "'",
    "&nbsp;" -> " ", "&amp;" -> "&")

  /** C4's LINE-level cleaning rules (Raffel et al., "Exploring the
    * Limits of Transfer Learning…", JMLR 2020 §2.1) — the step C4
    * applies right after HTML extraction, and the one rule set here
    * that works BELOW document granularity (every other gate in the
    * engine judges whole docs):
    *
    *  - keep only lines ending in terminal punctuation (`. ! ? "`),
    *  - drop lines with fewer than `minWords` words,
    *  - drop lines containing the word "javascript" (the
    *    enable-javascript boilerplate marker),
    *  - drop the WHOLE page if it contains "lorem ipsum" or a curly
    *    brace (placeholder text / leftover code).
    *
    * Pure scalar work: one split + one higher-order `filter` per row,
    * zero shuffle; the page-level drops are plain filters. Returns
    * (idCol, clean_text, n_kept, n_dropped) with clean_text the
    * surviving lines rejoined by '\n'; pages failing the page rules —
    * or keeping zero lines — are absent from the result (C4 drops
    * them). Word counting is whitespace-split, matching
    * [[TextAnalysis]]'s convention and bit-portable to a SQL oracle. */
  def cleanLines(df: org.apache.spark.sql.DataFrame, idCol: String,
                 textCol: String, minWords: Int = 3):
      org.apache.spark.sql.DataFrame = {
    val t = col(textCol)
    val lines = split(t, "\n")
    val keep = filter(lines, l =>
      size(split(trim(l), " ")) >= minWords &&
        l.rlike("[.!?\"]$") &&
        !lower(l).contains("javascript"))
    df.filter(!lower(t).contains("lorem ipsum") &&
        !t.contains("{") && !t.contains("}"))
      .select(col(idCol), keep.as("__k"), size(lines).as("__n"))
      .filter(size(col("__k")) > 0)
      .select(col(idCol),
        array_join(col("__k"), "\n").as("clean_text"),
        size(col("__k")).cast("long").as("n_kept"),
        (col("__n") - size(col("__k"))).cast("long").as("n_dropped"))
  }

  /** Block-boundary tags that become line breaks under
    * `keepLineBreaks` — the C4-extractor behavior [[cleanLines]]
    * needs upstream (its rules are LINE-level; an extractor that
    * flattens the page to one line starves them). */
  private[graft] val blockBreakPattern =
    "(?i)<br\\s*/?>|</(?:p|div|li|tr|h[1-6])\\s*>"

  /** Anchor-element pattern for [[extractLinks]]: group 1 captures a
    * DOUBLE-quoted href value, group 2 the raw anchor body. Contract
    * choices, each pinned in HtmlSpec:
    *  - `<a\s` requires whitespace after the tag name, so `<abbr>` /
    *    `<area>` never match;
    *  - the lazy pre-href run tolerates other attributes (quoted runs
    *    consumed atomically, so an `href` INSIDE another attribute's
    *    quotes cannot terminate it) but — like [[tagPattern]] — can
    *    never cross the tag-closing `>`; when present it must end in
    *    whitespace, so `href` binds only as an attribute NAME, never
    *    as the tail of one (`data-href="…"` cannot match);
    *  - href must be double-quoted (the dominant form); single-quoted
    *    or unquoted hrefs and href-less anchors (`<a name=…>`) are
    *    skipped, not misparsed — documented, lookaround-free (RE2-safe)
    *    in exchange;
    *  - `(?s)` lets anchors span lines; `</a\s*>` tolerates the
    *    whitespace-before-`>` close the tag pattern accepts;
    *  - the body run cannot cross a NEW anchor opener (`<a` followed
    *    by whitespace or `>`): real crawl HTML routinely drops `</a>`,
    *    and a lazy `.*?` body would swallow the next anchor whole —
    *    one unclosed tag eating its well-formed neighbor. Instead the
    *    unclosed anchor itself fails to match (dropped — it has no
    *    close) and the following anchor is found intact. Literal
    *    `<<` inside a body also terminates the run (vanishingly rare;
    *    the match then fails like any other unclosed anchor). The
    *    plain-text run is POSSESSIVE (`[^<]++`): the two body
    *    alternatives are disjoint on `<`, so possessiveness loses no
    *    match, and without it an unclosed `<a href=…>` followed by a
    *    few hundred chars of text backtracks exponentially in
    *    java.util.regex — one pathological crawl page would hang the
    *    task (pinned in HtmlSpec). */
  private[graft] val anchorPattern =
    "(?is)<a\\s(?:(?:[^>\"']|\"[^\"]*\"|'[^']*')*?\\s)?href\\s*=\\s*\"([^\"]*)\"" +
      "(?:[^>\"']|\"[^\"]*\"|'[^']*')*>((?:[^<]++|<(?:[^aA<]|[aA][^\\s>]))*?)</a\\s*>"

  /** Steps 1-2 of the contract, shared by [[extractText]] and
    * [[extractLinks]]: drop script/style elements with their content,
    * then comments — BEFORE any tag or anchor matching, so markup
    * inside code or commented-out regions can never leak out. */
  private def stripNonContent(html: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(html, scriptPattern, " "),
        stylePattern, " "),
      commentPattern, " ")

  /** Character-reference decode (contract step 4): named table +
    * WHATWG numeric, one fused codegen'd pass. */
  private def decodeEntities(c: Column): Column =
    org.apache.spark.sql.graftext.HtmlEntityDecode.column(c)

  /** Hyperlink extraction — the web-graph construction rung (the link
    * structure Common Crawl-style pipelines feed to
    * [[Graph.pageRank]], and the anchor-text signal IR pipelines
    * aggregate per target). One row per matched anchor:
    * `(idCol, link_no, href, anchor)` with `link_no` the 0-based
    * document order, `href` the entity-decoded raw target (NOT
    * resolved/normalized — compose [[UrlNormalize]] for that), and
    * `anchor` the anchor body with inner tags stripped, entities
    * decoded, and whitespace collapsed (the [[extractText]] steps 3-5
    * applied inside the anchor). Anchors inside scripts, styles, or
    * comments never match (they are stripped first); docs with no
    * links contribute no rows.
    *
    * Scale shape: two `regexp_extract_all` passes over the same
    * pattern (hrefs then anchors — Spark's extract-all surfaces one
    * group per call), zipped positionally and exploded. All scalar
    * expressions on the scan — the only rows that survive into any
    * downstream shuffle are the links themselves, so at 100 TB this
    * rides the ingest scan like [[extractText]]. */
  def extractLinks(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val content = stripNonContent(col(htmlCol))
    val pairs = zip_with(
      regexp_extract_all(content, lit(anchorPattern), lit(1)),
      regexp_extract_all(content, lit(anchorPattern), lit(2)),
      (h, a) => struct(h.as("href"), a.as("anchor")))
    df.select(col(idCol), posexplode(pairs).as(Seq("link_no", "link")))
      .select(col(idCol),
        col("link_no").cast("int").as("link_no"),
        trim(decodeEntities(col("link.href"))).as("href"),
        trim(regexp_replace(
          decodeEntities(regexp_replace(col("link.anchor"), tagPattern, " ")),
          "\\s+", " ")).as("anchor"))
  }

  /** Media-element attribute pattern: `<elem … attr="value">` with the
    * [[anchorPattern]] front-half guarantees — whitespace required
    * after the element name (`<imgx>` never matches), the optional
    * pre-attribute run consumes quoted values atomically and must end
    * in whitespace (so `attr` binds only as an attribute NAME —
    * `data-src="…"` cannot match `src`), the value must be
    * double-quoted, and the run can never cross the tag's `>`.
    * Media elements are void/self-contained, so no body half. */
  private def mediaAttrPattern(elem: String, attr: String): String =
    s"(?is)<$elem\\s(?:(?:[^>\"']|\"[^\"]*\"|'[^']*')*?\\s)?" +
      s"$attr\\s*=\\s*\"([^\"]*)\""

  /** The media-reference kinds [[extractMediaLinks]] emits, in output
    * order: (kind label, element, attribute, srcset?). `srcset`
    * values hold comma-separated candidates (`url 1x, url2 2x`) and
    * explode one row per candidate URL (descriptors dropped). */
  private[graft] val mediaKinds: Seq[(String, String, String, Boolean)] = Seq(
    ("img", "img", "src", false),
    ("img_srcset", "img", "srcset", true),
    ("source", "source", "src", false),
    ("source_srcset", "source", "srcset", true),
    ("video", "video", "src", false),
    ("audio", "audio", "src", false),
    ("poster", "video", "poster", false))

  /** MEDIA-link extraction — the discovery rung a multimodal corpus
    * pipeline starts from (`<a href>` feeds the page frontier;
    * `<img src>`/`srcset`/`<video>`/`<audio>`/`<source>`/`poster`
    * feed the image/audio/video fetch lists that the binary-column
    * family — [[graft.sources.Multimodal]] decode, aHash/audio-FP
    * dedup — then consumes; the round-16 verdict's third fidelity
    * gap). One row per media reference:
    * `(idCol, media_no, tag, src)` with `tag` ∈ [[mediaKinds]]'
    * labels, `src` the entity-decoded raw target (compose
    * [[UrlNormalize]] to canonicalize), and `media_no` the 0-based
    * position in the concatenated kind-major sequence (document
    * order within each kind; srcset candidates in list order) — ONE
    * deterministic per-document numbering with no window. References
    * inside scripts, styles, or comments never match (stripped
    * first); empty values and empty srcset candidates are dropped.
    *
    * Scale shape: one `regexp_extract_all` per kind over the same
    * stripped content, concatenated into a single array and exploded
    * — one projection on the scan (NOT a per-kind union, which would
    * scan the corpus seven times), rows only for actual references.
    * All scalar codegen'd work, zero shuffle. */
  def extractMediaLinks(df: DataFrame, idCol: String,
                        htmlCol: String): DataFrame = {
    val content = stripNonContent(col(htmlCol))
    val perKind: Seq[Column] = mediaKinds.map { case (k, elem, attr, isSet) =>
      val vals = regexp_extract_all(content,
        lit(mediaAttrPattern(elem, attr)), lit(1))
      // candidate = first non-ws token after any whitespace (srcset
      // lists wrap across lines; Spark's trim strips spaces only, so
      // the leading-ws consumption lives in the pattern)
      val urls =
        if (isSet) flatten(transform(vals, v =>
          transform(split(v, ","), c => regexp_extract(c, "^\\s*(\\S+)", 1))))
        else vals
      // decode/trim/drop-empties INSIDE the array, so media_no stays
      // a contiguous per-document numbering after the drops
      val clean = filter(transform(urls, u => trim(decodeEntities(u))),
        u => u =!= "")
      transform(clean, u => struct(lit(k).as("tag"), u.as("src")))
    }
    df.select(col(idCol), posexplode(concat(perKind: _*))
        .as(Seq("media_no", "m")))
      .select(col(idCol), col("media_no").cast("int").as("media_no"),
        col("m.tag").as("tag"), col("m.src").as("src"))
  }

  /** Visible text of an HTML column per the five-step contract.
    * `keepLineBreaks = true` turns block-closing tags (`</p>`,
    * `</div>`, `</li>`, `</tr>`, `</h1..6>`, `<br>`) into newlines
    * and collapses whitespace WITHIN lines only — feed this form to
    * [[cleanLines]]; the default flattens to one space-collapsed
    * line (the q136 oracle's closed form). */
  def extractText(html: Column, keepLineBreaks: Boolean = false): Column = {
    val noComment = stripNonContent(html)
    val broken =
      if (keepLineBreaks) regexp_replace(noComment, blockBreakPattern, "\n")
      else noComment
    val noTags = regexp_replace(broken, tagPattern, " ")
    // single-pass reference decode (named + WHATWG numeric); oracles
    // replay the PLANTING formula, so no SQL twin of the decode exists
    val decoded = decodeEntities(noTags)
    if (keepLineBreaks)
      // collapse within lines, trim each line, drop blank lines —
      // the result's lines are exactly the page's block runs
      array_join(filter(transform(split(decoded, "\n"),
        l => trim(regexp_replace(l, "[ \\t\\r\\f]+", " "))),
        l => l =!= ""), "\n")
    else trim(regexp_replace(decoded, "\\s+", " "))
  }
}
