package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + exact URL-level dedup — the first gate of a
  * web-crawl training-data pipeline (a CommonCrawl-style corpus dedups
  * on canonical URL before any content hashing: it is the only dedup
  * that can drop a record without fetching/decoding the body).
  *
  * The canonicalizer is the standard conservative rule set (RFC 3986
  * §6 syntax-based normalization plus the usual crawl conventions):
  *   - drop the fragment (never sent to the server)
  *   - lowercase the scheme and the authority (case-insensitive per
  *     RFC 3986 §3.1/§3.2.2); strip a default port (:80 http, :443
  *     https)
  *   - strip one trailing slash from a non-root path (crawl
  *     convention — most servers alias the two)
  *   - sort query parameters (the common crawl-dedup convention;
  *     applications overwhelmingly treat the query as a map)
  *
  * Everything is built from codegen'd string expressions
  * (regexp_extract / regexp_replace / split / array_sort) — no UDF, so
  * the whole canonicalization inlines into whole-stage codegen and
  * runs at scan throughput. At 100 TB the subsequent dedup shuffles
  * only (canonical_url_hash, doc_id) pairs, never bodies.
  */
object UrlNormalize {

  /** Canonical form of a URL column, as pure expressions. */
  def canonicalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([^:/?#]+)://", 1))
    val rest = regexp_replace(noFrag, "^[^:/?#]+://", "")
    val authority = lower(regexp_extract(rest, "^([^/?]*)", 1))
    val host = when(scheme === "https", regexp_replace(authority, ":443$", ""))
      .when(scheme === "http", regexp_replace(authority, ":80$", ""))
      .otherwise(authority)
    val pathQuery = regexp_replace(rest, "^[^/?]*", "")
    val path = regexp_extract(pathQuery, "^([^?]*)", 1)
    // strip ONE trailing slash unless the path is exactly "/" (root);
    // an empty path canonicalizes to "/"
    val pathNorm = when(path === "", lit("/"))
      .when(path === "/", lit("/"))
      .otherwise(regexp_replace(path, "/$", ""))
    val query = regexp_extract(pathQuery, "\\?(.*)$", 1)
    val querySorted = array_join(array_sort(split(query, "&")), "&")
    // hierarchical-URL guard: scheme-less, relative, and
    // non-hierarchical inputs (mailto:, data:, "foo/bar") that real
    // crawl data contains have no "://" to anchor the rules above —
    // without the guard they canonicalize to garbage like
    // "://host/..." and silently group under one key. Pass them
    // through unchanged: an un-canonicalized URL dedups only against
    // byte-identical copies of itself, which is the conservative
    // behavior for inputs outside the canonicalizer's contract.
    when(scheme === "", url).otherwise(
      concat(scheme, lit("://"), host, pathNorm,
        when(query === "", lit("")).otherwise(concat(lit("?"), querySorted))))
  }

  /** Planted messy-URL table for the registered query: four
    * presentation variants per base URL (doc_id div 4), exercising
    * every canonicalization rule — upper-cased scheme/host, explicit
    * default port, trailing slash, shuffled query order, fragments.
    * The planting formula is the oracle's ground truth: the SQL
    * oracle never re-runs the canonicalizer, it states the expected
    * canonical form directly. */
  def synthesizeUrls(docs: DataFrame): DataFrame = {
    val base = expr("doc_id div 4")
    val h = pmod(base, lit(50)).cast("string")
    val a = pmod(base, lit(5)).cast("string")
    val b = pmod(base, lit(7)).cast("string")
    val bs = base.cast("string")
    val v = pmod(col("doc_id"), lit(4))
    val url = when(v === 0, concat(lit("HTTPS://EXAMPLE"), h,
        lit(".COM:443/p/"), bs, lit("?a="), a, lit("&b="), b,
        lit("#sec"), col("doc_id").cast("string")))
      .when(v === 1, concat(lit("https://example"), h, lit(".com/p/"), bs,
        lit("/?b="), b, lit("&a="), a))
      .when(v === 2, concat(lit("https://Example"), h, lit(".Com/p/"), bs,
        lit("?a="), a, lit("&b="), b))
      .otherwise(concat(lit("https://example"), h, lit(".com:443/p/"), bs,
        lit("?b="), b, lit("&a="), a, lit("#x")))
    docs.select(col("doc_id"), url.as("url"))
  }

  /** Host of a URL column: lower-cased authority minus port/userinfo.
    * Scheme-less inputs (outside the canonicalizer's contract) yield
    * '' — they match no blocklist entry and pass the gate untouched,
    * the same conservative pass-through [[canonicalize]] applies. */
  def hostOf(url: Column): Column =
    lower(regexp_extract(regexp_replace(url, "#.*$", ""),
      "^[^:/?#]+://(?:[^/?#@]*@)?([^/?#:]*)", 1))

  /** Every dot-suffix of a host, longest first: `a.b.c` →
    * [`a.b.c`, `b.c`, `c`] — the UT1-style domain-blocklist match
    * unit (an entry `b.c` must block `a.b.c`). Bounded by the label
    * count (hosts have a handful), so the explode below is a small
    * constant fan-out, not a blow-up. */
  def hostSuffixes(host: Column): Column = {
    val labels = split(host, "\\.")
    transform(sequence(lit(1), size(labels)),
      i => array_join(slice(labels, i, size(labels)), "."))
  }

  /** UT1-style category gate: match each document's URL host against
    * a (domain, category) blocklist by host-suffix, emit the audit
    * surface (id, host, matched category or NULL, keep flag). A doc
    * matching several entries takes the alphabetically first
    * category (deterministic; UT1 semantics only need "any match
    * blocks").
    *
    * Scale shape: suffixes explode the corpus by the label count
    * (≤ ~5×), the blocklist joins BROADCAST on the suffix (an
    * equi-join — a raw `endswith` condition would plan a nested-loop
    * scan of corpus × blocklist), and one hash aggregate on the id
    * folds the fan-out back and carries the verdict. One shuffle
    * total; the blocklist (even UT1's ~millions of rows) broadcasts
    * as a few-hundred-MB hash map, far under the corpus side. A
    * pipeline that only wants the gate composes
    * `.filter(col("keep"))` — or an anti join against the matched-id
    * set when the audit columns aren't needed. */
  def categoryGate(docs: DataFrame, idCol: String, urlCol: String,
                   blocklist: DataFrame, domainCol: String = "domain",
                   categoryCol: String = "category"): DataFrame = {
    val host = hostOf(col(urlCol))
    val bl = broadcast(blocklist.select(
      col(domainCol).as("__bl_domain"), col(categoryCol).as("__bl_cat")))
    docs.select(col(idCol), host.as("host"))
      .select(col(idCol), col("host"),
        explode(hostSuffixes(col("host"))).as("__suf"))
      .join(bl, col("__suf") === col("__bl_domain"), "left")
      .groupBy(col(idCol), col("host"))
      .agg(min(col("__bl_cat")).as("category"))
      .withColumn("keep", col("category").isNull)
  }

  /** URL-level dedup over (doc_id, url): group by canonical form, keep
    * the smallest doc_id as the canonical record (first-crawled wins
    * under a monotone id), count the dupes. The shuffle carries only
    * the canonical string + id — at 100 TB, hash the canonical form
    * first and shuffle 8-byte digests. */
  def dedupByUrl(docs: DataFrame, urlCol: String): DataFrame =
    docs.withColumn("url_canon", canonicalize(col(urlCol)))
      .groupBy(col("url_canon"))
      .agg(min(col("doc_id")).as("canonical_doc"),
        count(lit(1)).as("n_dupes"))
}
