package graft

import org.apache.spark.sql.functions._

import graft.operators.UrlNormalize

/** Canonicalization rules pinned on hand-written URLs NOT produced by
  * the synthesizer, then the synthesizer's four presentation variants
  * pinned to collapse onto one canonical form per base. */
class UrlNormalizeSpec extends SparkTestBase {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("url").select(UrlNormalize.canonicalize(col("url"))).
      collect().map(_.getString(0)).toSeq
  }

  test("each canonicalization rule, on URLs the synthesizer never emits") {
    val cases = Seq(
      // scheme + host case, default http port, fragment
      "HTTP://WWW.Foo.COM:80/a/b?z=1&a=2#frag" -> "http://www.foo.com/a/b?a=2&z=1",
      // trailing slash stripped on non-root path
      "https://foo.com/a/b/" -> "https://foo.com/a/b",
      // root path kept; empty path becomes root
      "https://foo.com/" -> "https://foo.com/",
      "https://foo.com" -> "https://foo.com/",
      // NON-default port survives; :443 is only default for https
      "https://foo.com:8443/x" -> "https://foo.com:8443/x",
      "http://foo.com:443/x" -> "http://foo.com:443/x",
      "https://foo.com:443/x" -> "https://foo.com/x",
      // query-less URL gets no '?'; single param untouched
      "https://foo.com/x?b=2" -> "https://foo.com/x?b=2",
      // fragment-only difference collapses
      "https://foo.com/x?a=1#top" -> "https://foo.com/x?a=1")
    cases.foreach { case (in, want) =>
      assert(canon(in) == Seq(want), s"for $in")
    }
  }

  test("non-hierarchical and scheme-less inputs pass through unchanged") {
    // real crawl data contains these; without the scheme guard they
    // canonicalized to garbage like "://host/..." and silently grouped
    // under one key
    val cases = Seq(
      "mailto:someone@example.com",
      "data:text/plain;base64,SGVsbG8=",
      "foo/bar/baz",
      "/relative/path?b=1&a=2",
      "www.foo.com/x")
    cases.foreach { in =>
      assert(canon(in) == Seq(in), s"expected pass-through for $in")
    }
  }

  test("all four planted presentation variants collapse to one canonical form") {
    import spark.implicits._
    val docs = (0L until 40L).toDF("doc_id")
    val out = UrlNormalize.dedupByUrl(UrlNormalize.synthesizeUrls(docs), "url")
    assert(out.count() == 10)
    val rows = out.collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dupes") == 4, r.toString)
      val canonicalDoc = r.getAs[Long]("canonical_doc")
      assert(canonicalDoc % 4 == 0, "min doc of each group is the v0 id")
      val base = canonicalDoc / 4
      assert(r.getAs[String]("url_canon") ==
        s"https://example${base % 50}.com/p/$base?a=${base % 5}&b=${base % 7}")
    }
  }

  test("the canonicalization plan is pure codegen'd expressions — no UDF, no shuffle before the dedup agg") {
    import spark.implicits._
    val docs = (0L until 8L).toDF("doc_id")
    val df = UrlNormalize.synthesizeUrls(docs)
      .select(UrlNormalize.canonicalize(col("url")))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
    assert(!plan.contains("Exchange"))
  }

  test("categoryGate: suffix match, specificity, multi-match min, scheme-less pass") {
    import spark.implicits._
    val docs = Seq(
      (1L, "https://ads.example.com/x"),        // suffix match -> ads
      (2L, "https://example.com/x"),            // exact match -> ads
      (3L, "https://user:pw@Sub.Tracker.NET:8443/p"), // userinfo+port+case
      (4L, "https://safe.org/x"),               // no match -> keep
      (5L, "https://both.example.com/x"),       // matches 2 entries -> min
      (6L, "mailto:a@tracker.net")              // scheme-less contract: host ''
    ).toDF("doc_id", "url")
    val bl = Seq(
      ("example.com", "ads"),
      ("tracker.net", "tracking"),
      ("both.example.com", "zzz-specific")      // min() picks 'ads', not this
    ).toDF("domain", "category")
    val out = UrlNormalize.categoryGate(docs, "doc_id", "url", bl)
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(2)), r.getBoolean(3))).toMap
    assert(out(1L) == (Some("ads"), false))
    assert(out(2L) == (Some("ads"), false))
    assert(out(3L) == (Some("tracking"), false), "host must lower-case and strip userinfo/port")
    assert(out(4L) == (None, true))
    assert(out(5L) == (Some("ads"), false), "multi-match takes the alphabetical min")
    assert(out(6L) == (None, true), "non-hierarchical URLs match nothing")
  }

  test("robotsGate: RFC 9309 edges the q146 planting never exercises") {
    import spark.implicits._
    val robots = Seq(
      // consecutive UA lines share ONE group; CRLF + comments ignored;
      // empty Disallow contributes no rule; tie: Allow wins at equal
      // octet length (/dir vs /dir)
      ("a.com",
        "# policy\r\nUser-agent: one\r\nUser-agent: *\r\n" +
          "Disallow:\r\nDisallow: /dir\r\nAllow: /dir\r\n"),
      // exact group selected even when it appears AFTER the * group,
      // and * rules must not leak into the verdict
      ("b.com",
        "User-agent: *\nDisallow: /\n\nUser-agent: graftbot\n" +
          "Allow: /only\nDisallow: /only/sub\n"),
      // agent match is case-insensitive; regex specials in rules are
      // literals (the '.' must not match 'xhtml')
      ("c.com", "User-agent: GRAFTBOT\nDisallow: /a.b\n")
    ).toDF("domain", "robots_txt")
    val urls = Seq(
      (1L, "https://a.com/dir/x"),    // tie -> Allow wins
      (2L, "https://a.com/other"),    // no rule -> allowed
      (3L, "https://b.com/only/page"),// exact group Allow /only
      (4L, "https://b.com/only/sub/p"),// longer Disallow wins inside it
      (5L, "https://b.com/elsewhere"),// * Disallow / must NOT apply
      (6L, "https://c.com/a.b/z"),    // literal dot blocks
      (7L, "https://c.com/axb/z"),    // '.' is not a regex any-char
      (8L, "https://d.com/whatever")  // no robots.txt -> allowed
    ).toDF("doc_id", "url")
    val out = UrlNormalize.robotsGate(urls, "doc_id", "url", robots,
        "graftbot")
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(2), Option(r.getString(3))))).toMap
    assert(out(1L) == ((true, Some("/dir"))),
      "Allow must beat Disallow on an octet-length tie")
    assert(out(2L) == ((true, None)))
    assert(out(3L) == ((true, Some("/only"))))
    assert(out(4L) == ((false, Some("/only/sub"))),
      "longest octet match must win")
    assert(out(5L) == ((true, None)),
      "* group must not apply when an exact group exists")
    assert(out(6L) == ((false, Some("/a.b"))))
    assert(out(7L) == ((true, None)),
      "a '.' in a rule is a literal octet, not a regex metachar")
    assert(out(8L) == ((true, None)), "no robots.txt defaults to allow")
  }

  test("crawlDelay: tier suppression, largest-wins, non-numeric ignored") {
    import spark.implicits._
    val robots = Seq(
      // exact group wins over * even with a larger * value
      ("a.com", "User-agent: *\nCrawl-delay: 30\n\n" +
        "User-agent: graftbot\nCrawl-delay: 2\n"),
      // two applicable values -> largest; 'fast' ignored
      ("b.com", "User-agent: *\nCrawl-delay: 1\nCrawl-delay: 5\n" +
        "Crawl-delay: fast\n"),
      // delay in a group for ANOTHER agent only -> absent
      ("c.com", "User-agent: otherbot\nCrawl-delay: 9\n"),
      // fractional seconds parse
      ("d.com", "User-agent: *\nCrawl-delay: 0.25\n")
    ).toDF("domain", "robots_txt")
    val got = UrlNormalize.crawlDelay(robots, "domain", "robots_txt",
        "graftbot")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("a.com" -> 2.0, "b.com" -> 5.0, "d.com" -> 0.25))
  }

  test("robotsPolicy: one parse reproduces the gate AND the delay; " +
      "per-directive-type tiering preserved") {
    import spark.implicits._
    val robots = Seq(
      ("a.com",
        "User-agent: *\nDisallow: /dir\nAllow: /dir\nCrawl-delay: 3\n"),
      // exact group publishes ONLY a delay: the * group's access
      // rules must still apply (per-directive-type tiering — the
      // standalone parseRobots/crawlDelay behavior, preserved)
      ("b.com", "User-agent: *\nDisallow: /blocked\n\n" +
        "User-agent: graftbot\nCrawl-delay: 7\n"),
      // rules only, no delay
      ("c.com", "User-agent: graftbot\nDisallow: /x\n"),
      // delay only, NO rules anywhere: the policy row must exist
      // (empty rules array) and the gate must read it as allow-all
      ("e.com", "User-agent: *\nCrawl-delay: 4\n")
    ).toDF("domain", "robots_txt")
    val urls = Seq(
      (1L, "https://a.com/dir/p"),
      (2L, "https://b.com/blocked/p"),
      (3L, "https://b.com/open"),
      (4L, "https://c.com/x/y"),
      (5L, "https://d.com/any"),
      (6L, "https://e.com/anything")
    ).toDF("doc_id", "url")
    val policy = UrlNormalize.robotsPolicy(robots, "domain",
      "robots_txt", "graftbot")
    // the gate evaluated against the policy == the standalone gate
    val viaPolicy = UrlNormalize
      .robotsGateFromPolicy(urls, "doc_id", "url", policy)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(2), Option(r.getString(3))))).toMap
    val standalone = UrlNormalize
      .robotsGate(urls, "doc_id", "url", robots, "graftbot")
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(2), Option(r.getString(3))))).toMap
    assert(viaPolicy == standalone,
      s"policy gate diverged: $viaPolicy vs $standalone")
    assert(viaPolicy(2L) == ((false, Some("/blocked"))),
      "* rules must survive an exact group publishing only a delay")
    assert(viaPolicy(5L) == ((true, None)))
    assert(viaPolicy(6L) == ((true, None)),
      "an empty rules array (delay-only domain) must read allow-all")
    // the delay column == the standalone crawlDelay
    val dViaPolicy = policy.filter(col("crawl_delay").isNotNull)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val dStandalone = UrlNormalize
      .crawlDelay(robots, "domain", "robots_txt", "graftbot")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(dViaPolicy == dStandalone && dViaPolicy ==
      Map("a.com" -> 3.0, "b.com" -> 7.0, "e.com" -> 4.0))
    // e.com's policy row exists with an EMPTY rules array, not null
    val eRow = policy.filter(col("domain") === "e.com").collect()
    assert(eRow.length == 1 && eRow(0).getSeq[Any](1).isEmpty)
    // c.com publishes rules but no delay: present with NULL delay
    val cRow = policy.filter(col("domain") === "c.com").collect()
    assert(cRow.length == 1 && cRow(0).isNullAt(2))
  }

  test("politenessSchedule: host-local slots, delay spacing, default " +
      "for unpublished hosts") {
    import spark.implicits._
    val urls = Seq(
      (1L, "https://a.com/x"), (2L, "https://a.com/y"),
      (3L, "https://a.com/z"), (4L, "https://b.com/only")
    ).toDF("doc_id", "url")
    val delays = Seq(("a.com", 2.5)).toDF("domain", "crawl_delay")
    val out = UrlNormalize.politenessSchedule(urls, "doc_id", "url",
        delays)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(2), r.getInt(3), r.getDouble(4)))).toMap
    // a.com: three URLs get slots 0,1,2 spaced by its 2.5s delay
    val aSlots = Seq(1L, 2L, 3L).map(out(_)).sortBy(_._2)
    assert(aSlots.map(_._1).forall(_ == "a.com"))
    assert(aSlots.map(_._2) == Seq(0, 1, 2))
    assert(aSlots.map(_._3) == Seq(0.0, 2.5, 5.0),
      s"delay spacing wrong: $aSlots")
    // b.com published no delay: the 1.0s default prices its slots
    assert(out(4L) == (("b.com", 0, 0.0)))
    // determinism: the slot order is the content hash, not input order
    val rev = UrlNormalize.politenessSchedule(
        urls.orderBy(col("doc_id").desc).repartition(7),
        "doc_id", "url", delays)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(id => rev(id) == out(id)._2),
      "slot assignment must be partitioning/order-invariant")
  }

  test("specificity is octet length: a non-ASCII rule outranks an " +
      "ASCII rule of equal character count") {
    import spark.implicits._
    // 'é' is 2 octets in UTF-8: Allow /aé (4 octets) must beat
    // Disallow /abc (4 chars but tie... use /ab, 3 octets) — plant
    // Disallow /aéx? Simplest: /é (3 octets) vs /ab (3 octets) tie;
    // use Allow: /é + Disallow: /a — /é = 3 octets > /a = 2 octets.
    val robots = Seq(
      ("a.com", "User-agent: *\nDisallow: /é\nAllow: /éb\n")
    ).toDF("domain", "robots_txt")
    val rules = UrlNormalize.parseRobots(robots, "domain",
        "robots_txt", "graftbot")
      .collect().map(r => r.getString(2) -> r.getInt(3)).toMap
    // /é = 1 + 2 octets = 3; /éb = 1 + 2 + 1 = 4
    assert(rules == Map("/é" -> 3, "/éb" -> 4),
      s"octet specificity wrong: $rules")
    val urls = Seq((1L, "https://a.com/éb/x")).toDF("doc_id", "url")
    val out = UrlNormalize.robotsGate(urls, "doc_id", "url", robots,
        "graftbot")
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(2), Option(r.getString(3))))).toMap
    assert(out(1L) == ((true, Some("/éb"))),
      "longer-octet Allow must win")
  }

  test("robotsSitemaps: group-independent, case-insensitive, comments " +
      "stripped, relative and schemeless values dropped") {
    import spark.implicits._
    val robots = Seq(
      ("a.com",
        "# header comment\n" +
        "Sitemap: https://a.com/sm.xml\n" +          // before any group
        "User-agent: *\nDisallow: /x\n" +
        "SITEMAP:https://a.com/sm2.xml # trailing\n" + // inside a group, no space
        "sitemap:   http://cdn.a.com/sm3.xml   \n" +   // lower, padded
        "Sitemap: /relative.xml\n" +                   // spec violation
        "Sitemap: ftp://a.com/nope.xml\n"),            // wrong scheme
      ("b.com", "User-agent: *\nAllow: /\n"))          // no directive
      .toDF("domain", "robots_txt")
    val got = graft.operators.UrlNormalize
      .robotsSitemaps(robots, "domain", "robots_txt")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(got == Seq(
      ("a.com", "http://cdn.a.com/sm3.xml"),
      ("a.com", "https://a.com/sm.xml"),
      ("a.com", "https://a.com/sm2.xml")), s"$got")
  }

  test("sitemapUrls: entity decode, whitespace trim, defaults, loc-less drop") {
    import spark.implicits._
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url>
        |    <loc>
        |      https://a.com/p?x=1&amp;y=2
        |    </loc>
        |    <lastmod>2026-01-05</lastmod>
        |    <priority>0.8</priority>
        |  </url>
        |  <url><loc>https://a.com/bare</loc></url>
        |  <url><lastmod>2026-01-06</lastmod></url>
        |  <url>
        |    <loc>https://a.com/apos&apos;d</loc>
        |    <priority>0.1</priority>
        |  </url>
        |</urlset>""".stripMargin
    val got = graft.operators.UrlNormalize.sitemapUrls(
        Seq(("a.com", xml)).toDF("domain", "xml"), "domain", "xml")
      .collect()
      .map(r => r.getString(1) ->
        ((Option(r.getString(2)), r.getDouble(3)))).toMap
    assert(got == Map(
      "https://a.com/p?x=1&y=2" -> ((Some("2026-01-05"), 0.8)),
      "https://a.com/bare" -> ((None, 0.5)),      // protocol defaults
      "https://a.com/apos'd" -> ((None, 0.1))),
      s"$got")                                     // loc-less entry dropped
  }

  test("sitemapUrls: a sitemapindex yields no urlset entries by design") {
    import spark.implicits._
    val idx =
      """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <sitemap><loc>https://a.com/sitemap1.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    assert(graft.operators.UrlNormalize.sitemapUrls(
      Seq(("a.com", idx)).toDF("domain", "xml"), "domain", "xml")
      .count() == 0)
  }

  test("sitemapIndexUrls: entity decode, lastmod NULL default, element " +
      "disjointness both ways") {
    import spark.implicits._
    val idx =
      """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <sitemap>
        |    <loc> https://a.com/maps/part1.xml.gz?x=1&amp;y=2 </loc>
        |    <lastmod>2026-03-01</lastmod>
        |  </sitemap>
        |  <sitemap><loc>https://a.com/maps/part2.xml</loc></sitemap>
        |  <sitemap><lastmod>2026-03-02</lastmod></sitemap>
        |</sitemapindex>""".stripMargin
    val urlset = "<urlset><url><loc>https://a.com/p1</loc></url></urlset>"
    val got = graft.operators.UrlNormalize.sitemapIndexUrls(
        Seq(("a.com", idx), ("b.com", urlset)).toDF("domain", "xml"),
        "domain", "xml")
      .collect().map(r => (r.getString(1), Option(r.getString(2)))).toMap
    assert(got == Map(
      "https://a.com/maps/part1.xml.gz?x=1&y=2" -> Some("2026-03-01"),
      "https://a.com/maps/part2.xml" -> None), s"$got") // loc-less dropped
    // and the index doc yields no urlset rows (the reverse direction)
    assert(graft.operators.UrlNormalize.sitemapUrls(
      Seq(("a.com", idx)).toDF("domain", "xml"), "domain", "xml")
      .count() == 0)
  }

  test("prioritySchedule: priority desc, lastmod desc NULLS LAST, hash ties; " +
      "delay pricing") {
    import spark.implicits._
    val urls = Seq(
      ("https://a.com/low", 0.1, Some("2026-02-20")),
      ("https://a.com/hi-old", 0.9, Some("2026-02-01")),
      ("https://a.com/hi-new", 0.9, Some("2026-02-15")),
      ("https://a.com/hi-nolm", 0.9, None),
      ("https://b.com/only", 0.5, None)
    ).toDF("url", "priority", "lastmod")
    val delays = Seq(("a.com", 2.0)).toDF("domain", "crawl_delay")
    val got = graft.operators.UrlNormalize.prioritySchedule(
        urls, "url", "priority", "lastmod", delays)
      .collect().map(r => r.getString(0) ->
        ((r.getInt(3), r.getDouble(4)))).toMap
    // a.com: 0.9 group first, within it lastmod desc (2026-02-15 then
    // 2026-02-01), NULL lastmod last of the group; 0.1 last overall
    assert(got("https://a.com/hi-new") == ((0, 0.0)), s"$got")
    assert(got("https://a.com/hi-old") == ((1, 2.0)), s"$got")
    assert(got("https://a.com/hi-nolm") == ((2, 4.0)), s"$got")
    assert(got("https://a.com/low") == ((3, 6.0)), s"$got")
    assert(got("https://b.com/only") == ((0, 0.0)), s"$got") // default 1.0s
  }
}
