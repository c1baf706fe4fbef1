package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Charset SNIFFING for crawled documents — which encoding a page's
  * bytes are actually in, resolved the way browsers and crawl
  * extractors do (WHATWG encoding sniffing, abridged to the two
  * signals a WARC pipeline has):
  *
  *   1. the HTTP `Content-Type` header's `charset=` parameter
  *      (transport wins — it is the server's own declaration);
  *   2. else an in-document `<meta>` declaration within the first
  *      [[MetaScanBytes]] bytes — both forms: `<meta charset="x">`
  *      and `<meta http-equiv="Content-Type" content="text/html;
  *      charset=x">` (the prefix bound is the WHATWG prescan window:
  *      the declaration must sit in pure-ASCII markup before any
  *      encoding-dependent bytes, so scanning the prefix through the
  *      byte-transparent latin-1 map is sound for every ASCII-compat
  *      encoding — and the legacy encodings a real crawl carries are
  *      all ASCII-compatible);
  *   3. else UTF-8, the modern-web default.
  *
  * The returned LABEL feeds
  * [[org.apache.spark.sql.graftext.CharsetDecode]], which owns alias
  * remaps (latin1 → windows-1252 per WHATWG) and the
  * unknown-label → UTF-8 fallback, so sniffing stays a pure scalar
  * projection: two regexp extracts over a bounded prefix, zero
  * shuffle, riding the scan. */
object Charsets {

  /** WHATWG prescan window: the spec scans the first 1024 bytes for
    * a `<meta>` charset declaration. */
  val MetaScanBytes = 1024

  /** The `<meta …charset=…>` pattern over the lowercased prefix:
    * both declaration forms funnel through a `charset=` token inside
    * the meta tag (quoted or bare value; the tag-bounded `[^>]*` run
    * keeps a `charset=` in prose or a query string from matching). */
  private[operators] val metaCharsetPattern =
    "<meta[^>]*charset[ \\t]*=[ \\t]*[\"']?([a-z0-9._-]+)"

  /** Sniff the charset label for one document: `httpCharset` is the
    * transport declaration ('' or NULL when absent — e.g.
    * [[graft.sources.Warc.httpResponses]]'s `http_charset`), `body`
    * the entity BYTES. Returns a non-empty lowercase label, 'utf-8'
    * when neither signal is present. */
  def sniff(httpCharset: Column, body: Column): Column = {
    val head = lower(decode(substring(body, 1, MetaScanBytes), "ISO-8859-1"))
    val meta = regexp_extract(head, metaCharsetPattern, 1)
    when(coalesce(httpCharset, lit("")) =!= "", lower(httpCharset))
      .when(meta =!= "", meta)
      .otherwise(lit("utf-8"))
  }

  /** Decode `body` bytes to UTF-8 text under a per-row `label` —
    * the [[org.apache.spark.sql.graftext.CharsetDecode]] column. */
  def decodeCharset(body: Column, label: Column): Column =
    org.apache.spark.sql.graftext.CharsetDecode.column(body, label)
}
