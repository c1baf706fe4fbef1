package graft

import org.apache.spark.sql.functions._
import graft.operators.Html

/** Hand-written HTML fixtures the q136 synthesizer never emits —
  * pins [[Html.extractText]]'s five-step contract including the
  * WHATWG numeric-reference semantics (windows-1252 band, U+FFFD
  * fallbacks, single-pass no-double-decode) and prose `<`. */
class HtmlSpec extends SparkTestBase {

  private def extract(html: String): String = {
    import spark.implicits._
    Seq(html).toDF("h").select(Html.extractText(col("h")).as("t"))
      .head.getString(0)
  }

  test("nested and uppercase tags strip; block structure collapses to spaces") {
    assert(extract("<DIV><UL><li>one</li>\n<li>two</li></UL></DIV>")
      == "one two")
  }

  test("script content drops even with decoy closers in strings and case-mixed tags") {
    assert(extract(
      "before<SCRIPT a=\"x\">var s = '</div>'; if (1<2) go();</ScRiPt >after")
      == "before after")
  }

  test("style blocks and comments drop; comment may contain tags") {
    assert(extract(
      "a<style media='all'>p > b { x: 1 }</style>b<!-- <p>hidden</p> -->c")
      == "a b c")
  }

  test("attributes holding > in quotes do not truncate the tag") {
    assert(extract("""<a href="u" title="5 > 3" data-x='a > b'>link</a>""")
      == "link")
  }

  test("bare less-than in prose is not markup and survives") {
    // '<' followed by a non-letter is prose (HTML5 tokenizer: only a
    // letter after '<' opens a tag) — survives the tag strip
    assert(extract("<p>x < y and 1<2 holds</p>") == "x < y and 1<2 holds")
    // ...whereas '<z' IS a (bogus) tag open: browsers consume it to
    // the next '>', and so does the extractor — pinned deliberately
    assert(extract("<p>y<z holds</p>x") == "y x")
  }

  test("entity table decodes; &amp;lt; must NOT double-decode") {
    assert(extract("&lt;tag&gt; &quot;q&quot; &apos;a&apos; &#39;b&#39; A&nbsp;B")
      == "<tag> \"q\" 'a' 'b' A B")
    assert(extract("&amp;lt;literal") == "&lt;literal")
    // the numeric analog of the trap: the &amp; decode must not seed
    // a second (numeric) decode — single-pass, structural
    assert(extract("&amp;#39;x") == "&#39;x")
    assert(extract("&amp;#x27;x") == "&#x27;x")
  }

  test("numeric references decode per WHATWG: dec, hex, case, supplementary") {
    assert(extract("it&#8217;s an em&#8212;dash") == "it’s an em—dash")
    assert(extract("caf&#233; &#xE9; &#Xe9;") == "café é é")
    // supplementary plane → surrogate-pair emit
    assert(extract("ok &#x1F600;!") == "ok 😀!")
    // adjacent references, no separator needed
    assert(extract("&#65;&#x42;&#67;") == "ABC")
  }

  test("numeric references: windows-1252 remap band 0x80-0x9F") {
    // the legacy-CMS apostrophe/quotes band every real crawl page hits
    assert(extract("don&#146;t &#147;q&#148; &#150; &#151; &#133;")
      == "don’t “q” – — …")
    assert(extract("&#128;") == "€")
    // unmapped cells of the band stay themselves
    assert(extract("a&#129;b") == "a\u0081b") // U+0081: not regex whitespace, survives
  }

  test("numeric references: NUL, surrogates, out-of-range → U+FFFD") {
    assert(extract("x&#0;y") == "x�y")
    assert(extract("x&#xD800;y &#xDFFF;") == "x�y �")
    assert(extract("x&#1114112;y &#x110000; &#999999999999999999999;")
      == "x�y � �")
    // top of the valid range still decodes
    assert(extract("&#x10FFFF;") == new String(Character.toChars(0x10FFFF)))
  }

  test("incomplete numeric forms pass through: no semicolon, no digits") {
    assert(extract("<p>a &#39 b</p>") == "a &#39 b")
    assert(extract("<p>a &# b &#; c &#x; d &#xG; e &amp f</p>")
      == "a &# b &#; c &#x; d &#xG; e &amp f")
    assert(extract("<p>tail&#</p>") == "tail&#")
    assert(extract("<p>amp at end &</p>") == "amp at end &")
  }

  test("doctype and xml-ish declarations strip; whitespace collapses and trims") {
    assert(extract("<!DOCTYPE html>\n <html>\n\n<body>  hi\t there </body></html> ")
      == "hi there")
  }

  test("full page: head title text is visible text (kept)") {
    assert(extract(
      "<html><head><title>T</title><script>s</script></head><body>B</body></html>")
      == "T B")
  }

  private def links(html: String): Seq[(Int, String, String)] = {
    import spark.implicits._
    Html.extractLinks(Seq((1L, html)).toDF("doc_id", "h"), "doc_id", "h")
      .collect().map(r => (r.getInt(1), r.getString(2), r.getString(3))).toSeq
  }

  test("extractLinks: basic anchor, attribute order and inner markup") {
    assert(links("""<a href="http://x.example/1">one</a>""")
      == Seq((0, "http://x.example/1", "one")))
    // href not first; quoted '>' in another attribute; nested tags and
    // entities in the body; multiline body
    assert(links("<a title=\"a > b\" class='k' href=\"/p?x=1&amp;y=2\">\n " +
      "see <b>this &amp; that</b> now </a>")
      == Seq((0, "/p?x=1&y=2", "see this & that now")))
  }

  test("extractLinks: document order and per-doc numbering") {
    assert(links("""<a href="u1">a</a> text <a href="u2">b</a>""")
      == Seq((0, "u1", "a"), (1, "u2", "b")))
  }

  test("extractLinks: contract skips — script/comment/anchorless/single-quoted") {
    assert(links(
      "<script>document.write('<a href=\"spam\">x</a>');</script>" +
        "<!-- <a href=\"c\">hidden</a> -->" +
        "<a name=\"frag\">no href</a>" +
        "<a href='single'>quoted</a>" +
        "<a href=\"keep\">kept</a>")
      == Seq((0, "keep", "kept")))
  }

  test("extractLinks: href inside another attribute's quotes cannot bind") {
    // data-href's VALUE contains href=; the matcher must consume the
    // quoted run atomically and bind the real href attribute
    assert(links("""<a data-href="href=decoy" href="real">t</a>""")
      == Seq((0, "real", "t")))
    // <abbr>/<area> never match the <a\s requirement
    assert(links("""<abbr href="u">x</abbr><area href="v">""") == Seq())
  }

  test("extractLinks: docs with no links emit no rows") {
    assert(links("<p>plain text, no anchors</p>") == Seq())
  }

  test("extractLinks: an unclosed anchor cannot swallow its neighbor") {
    // real crawl HTML drops </a> constantly: the unclosed anchor is
    // itself dropped (it has no close), and the following well-formed
    // anchor survives intact — a lazy .*? body would instead emit ONE
    // link (u1, body "a b") and lose u2 entirely
    assert(links("""<a href="u1">a <a href="u2">b</a>""")
      == Seq((0, "u2", "b")))
    // uppercase opener terminates the run the same way
    assert(links("""<a href="u1">a <A HREF="u2">b</A>""")
      == Seq((0, "u2", "b")))
    // a non-anchor tag starting with 'a' does NOT terminate the body
    assert(links("""<a href="u">x <abbr>y</abbr> z</a>""")
      == Seq((0, "u", "x y z")))
  }

  test("extractLinks: pathological unclosed anchor terminates (possessive body run)") {
    // an unclosed <a href=…> followed by a long plain-text run is the
    // catastrophic-backtracking shape for a NON-possessive [^<]+ body
    // alternative (exponential in the run length — a single crawl page
    // would hang the task). The possessive [^<]++ loses no match (the
    // alternatives are disjoint on '<') and must fail fast.
    val page = "<a href=\"bad\">" + ("lorem ipsum " * 2000)
    val t0 = System.nanoTime()
    assert(links(page) == Seq())
    val elapsedSec = (System.nanoTime() - t0) / 1e9
    assert(elapsedSec < 20, f"unclosed-anchor scan took $elapsedSec%.1fs")
    // and a well-formed anchor after the pathological run still binds
    assert(links(page + "<a href=\"good\">ok</a>")
      == Seq((0, "good", "ok")))
  }

  test("cleanLines: C4 rules on hand-written pages the planting never emits") {
    import spark.implicits._
    val pages = Seq(
      (1L, "A good sentence here.\nShort.\nno terminal punct\n" +
        "He said \"stop\"\nPlease enable JAVASCRIPT now.\nAnother fine keeper!"),
      (2L, "only lorem ipsum filler.\nA fine line."),   // page killed
      (3L, "var f = function() { return 1; }\nGood line."), // brace kill
      (4L, "no punct at all\nme neither"),              // zero kept -> absent
      (5L, "Tiny page here.\n\n\nWith some blanks?")            // blanks dropped
    ).toDF("doc_id", "text")
    val out = graft.operators.Html.cleanLines(pages, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // doc 1: keeps the '.' line, the quote-terminal line, and the '!'
    // line; drops the 1-word line, the no-punct line, the javascript
    // line (case-insensitive)
    assert(out(1L) == (("A good sentence here.\nHe said \"stop\"\nAnother fine keeper!", 3L, 3L)), s"${out(1L)}")
    assert(!out.contains(2L) && !out.contains(3L), "page-level kills")
    assert(!out.contains(4L), "zero surviving lines -> page absent")
    assert(out(5L) == (("Tiny page here.\nWith some blanks?", 2L, 2L)))
  }

  test("extractMediaLinks: every kind, kind-major numbering, decoys skipped, " +
      "srcset descriptors dropped, entities decoded") {
    import spark.implicits._
    def media(html: String): Seq[(Int, String, String)] =
      graft.operators.Html.extractMediaLinks(
          Seq((1L, html)).toDF("doc_id", "html"), "doc_id", "html")
        .collect().map(r => (r.getInt(1), r.getString(2), r.getString(3)))
        .sortBy(_._1).toSeq
    val page =
      """<img class="a" src="http://i.example/a.jpg">""" +
      "<img srcset=\"http://i.example/b-1x.jpg 1x,\n" +
      """  http://i.example/b-2x.jpg 2x">""" +
      """<source src="http://v.example/c.webm" type="video/webm">""" +
      """<video controls src="http://v.example/d.mp4"""" +
      """ poster="http://i.example/e.jpg"></video>""" +
      """<audio src="http://a.example/f.ogg"></audio>"""
    assert(media(page) == Seq(
      (0, "img", "http://i.example/a.jpg"),
      (1, "img_srcset", "http://i.example/b-1x.jpg"),
      (2, "img_srcset", "http://i.example/b-2x.jpg"),
      (3, "source", "http://v.example/c.webm"),
      (4, "video", "http://v.example/d.mp4"),
      (5, "audio", "http://a.example/f.ogg"),
      (6, "poster", "http://i.example/e.jpg")), s"${media(page)}")
    // decoys: data-src can't bind src (attr-name boundary), single-
    // quoted skipped, comments/scripts stripped, imgx not an img; an
    // src inside ANOTHER attribute's quotes can't match
    assert(media("""<img data-src="http://l.example/x.jpg">""" +
      """<img src='http://sq.example/q.jpg'>""" +
      """<!-- <img src="http://c.example/c.jpg"> -->""" +
      """<script>var i = '<img src="http://s.example/s.jpg">';</script>""" +
      """<imgx src="http://n.example/n.jpg">""" +
      """<img alt="src=&quot;nope&quot;">""").isEmpty)
    // entity-decoded target; empty src dropped without breaking the
    // numbering of later kinds
    assert(media("""<img src=""><img src="http://i.example/p?a=1&amp;b=2">""" +
      """<audio src="http://a.example/g.ogg"></audio>""") == Seq(
      (0, "img", "http://i.example/p?a=1&b=2"),
      (1, "audio", "http://a.example/g.ogg")))
  }
}
