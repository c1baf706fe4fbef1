package graft

import graft.operators.CorpusPipeline

/** Planted-case semantics for the end-to-end corpus cleaner: each
  * gate (language, length, quality, exact-dup, near-dup) removes
  * exactly its planted document. */
class CorpusPipelineSpec extends SparkTestBase {

  private val cfg = CorpusPipeline.Config(
    keepLangs = Seq("en"), minWords = 4, minQualityScore = 0.01,
    minhashK = 16, minhashBands = 2)

  test("each gate drops its planted doc; near-dup keeps the lowest id") {
    import spark.implicits._
    val en = "the quick fast query scans a wide table of rows"
    val docs = Seq(
      (1, en),                                        // survives
      (2, en),                                        // exact dup of 1 -> dropped
      (3, en + " extra"),                             // near dup of 1 -> dropped
      (4, "el la de el la de query data el la"),      // es -> dropped
      (5, "the a and"),                               // too short -> dropped
      (6, "the of and a fast unique words here now")  // survives
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.clean(docs, "doc_id", "text", cfg)
    val ids = out.select("doc_id").collect().map(_.getInt(0)).toSet
    assert(ids == Set(1, 6))
    // survivors carry the metrics that drove the decisions
    assert(out.columns.toSet ==
      Set("doc_id", "pred_lang", "n_words", "quality_score"))
    assert(out.filter($"pred_lang" =!= "en").isEmpty)
  }

  test("htmlExtract stage: gates judge visible text, not tag soup") {
    import spark.implicits._
    val en = "the quick fast query scans a wide table of rows"
    val docs = Seq(
      // markup-heavy page whose VISIBLE text is good English — must
      // survive once extracted (raw, it fails the quality/lang gates)
      (1, s"<html><head><script>var x = 1 &amp;&amp; 2;</script></head>" +
        s"<body><div class='c'><p>$en</p></div></body></html>"),
      // page whose visible text is too short — dropped by the gate
      (2, "<html><body><p>the a and</p><!-- lots of hidden markup --></body></html>")
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.clean(docs, "doc_id", "text",
      cfg.copy(htmlExtract = true))
    assert(out.select("doc_id").collect().map(_.getInt(0)).toSet == Set(1))
  }

  test("htmlExtract + c4 line stage composed: block breaks survive to the line rules") {
    import spark.implicits._
    val en = "the quick fast query scans a wide table of rows."
    val docs = Seq(
      // good prose in <p> blocks + a boilerplate block the LINE rules
      // must drop (doc-level gates alone could not remove just it)
      (1, s"<html><body><p>$en</p>" +
        "<p>Please enable javascript to continue.</p>" +
        s"<p>$en</p></body></html>"),
      // every block fails the line rules -> zero lines -> page dropped
      (2, "<html><body><p>no punct block</p><p>x.</p></body></html>")
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.clean(docs, "doc_id", "text",
      cfg.copy(htmlExtract = true, c4LineMinWords = Some(3),
        // the two surviving identical lines make doc 1 self-similar,
        // not cross-doc duplicated; keep near-dup verification on
        minAgree = Some(13)))
    assert(out.select("doc_id").collect().map(_.getInt(0)).toSet == Set(1))
  }

  test("trigram language ID classifies real sentences in all five languages") {
    import spark.implicits._
    val docs = Seq(
      (1, "the cat sat on the mat and the dog was there", "en"),
      (2, "la casa de la familia que vive en la ciudad de madrid", "es"),
      (3, "der schnelle braune fuchs springt über den faulen hund und die sonne", "de"),
      (4, "les enfants de la ville qui jouent dans le parc pendant une heure", "fr"),
      (5, "zhong guo shang hai xiang gang bei jing chang jiang huang he", "zh"),
      (6, "xy", "und") // shorter than one trigram: zero scores, tie fallback
    ).toDF("doc_id", "text", "expected")
    val out = graft.operators.TextAnalysis.languageId(docs, "doc_id", "text")
    val pred = out.collect().map(r => r.getAs[Int]("doc_id") ->
      r.getAs[String]("pred_lang")).toMap
    val expected = docs.collect().map(r => r.getInt(0) -> r.getString(2)).toMap
    // the all-zero tie falls to the first language in precedence order
    assert(pred == expected + (6 -> "en"))
  }

  test("repetition signals: planted fractions; one-word doc yields zeros") {
    import spark.implicits._
    val docs = Seq(
      (1, "a b a b"),   // words: 4 total / 2 distinct; bigrams: a b, b a, a b
      (2, "x y z w"),   // all unique
      (3, "solo")       // one word, no bigrams: guard path
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.repetitionSignals(docs, "doc_id", "text")
      .collect().map(r => r.getInt(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out(1) == ((0.5, 0.333333, 0.5)))  // 2 dup words; 1 dup bigram of 3 (rounded); 'a' 2/4
    assert(out(2) == ((0.0, 0.0, 0.25)))
    assert(out(3) == ((0.0, 0.0, 1.0)))
  }

  test("ngramCounts: corpus-wide bigram counts honor the frequency floor") {
    import spark.implicits._
    val docs = Seq(
      (1, "a b c"), (2, "a b d"), (3, "a b e"))  // 'a b' x3, others x1
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.ngramCounts(docs, "text", 2, 2L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a b" -> 3L))
  }

  test("ngramLmScore: corpus-bigram log-probs; sub-bigram docs absent") {
    import spark.implicits._
    val docs = Seq(
      (1, "a b c"),   // bigrams: "a b", "b c"
      (2, "a b"),     // bigram:  "a b"
      (3, "a d"),     // bigram:  "a d"
      (4, "solo")     // no bigrams → absent
    ).toDF("doc_id", "text")
    // counts: C("a b")=2, C("b c")=1, C("a d")=1; prefixes: C1(a)=3, C1(b)=1
    // P(b|a)=2/3, P(c|b)=1/1, P(d|a)=1/3
    val out = graft.operators.TextAnalysis.ngramLmScore(docs, "doc_id", "text")
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def r6(d: Double) = math.round(d * 1e6) / 1e6
    assert(out(1) == ((2L, r6((math.log(2.0 / 3) + math.log(1.0)) / 2))))
    assert(out(2) == ((1L, r6(math.log(2.0 / 3)))))
    assert(out(3) == ((1L, r6(math.log(1.0 / 3)))))
    assert(!out.contains(4))
  }

  test("corpusStats: per-source counts, word quantiles, language entropy") {
    import spark.implicits._
    val docs = Seq(
      (1, "a b c", "en", "web"),      // 3 words
      (2, "a b c d e", "en", "web"),  // 5 words
      (3, "x y", "de", "web"),        // 2 words
      (4, "solo doc here", "en", "books")) // single-source, one lang
      .toDF("doc_id", "text", "lang", "source")
    val out = graft.operators.TextAnalysis
      .corpusStats(docs, "source", "text", "lang")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(5))).toMap
    // web: 3 docs, 10 words, median 3; langs {en:2, de:1} →
    // H = ln3 − (2·ln2 + 1·ln1)/3
    val hWeb = math.log(3.0) - 2 * math.log(2.0) / 3
    assert(out("web") == ((3L, 10L, 3.0, math.round(hWeb * 1e6) / 1e6)))
    // books: one doc, one lang → zero entropy
    assert(out("books") == ((1L, 3L, 3.0, 0.0)))
  }

  test("PII redaction scrubs emails and long digit runs, leaves prose") {
    import spark.implicits._
    val docs = Seq(
      (1, "contact me at jane.doe+spam@ex-mail.co.uk or call 5551234567 now"),
      (2, "pin 123 is short but 1234 is not"),
      (3, "no pii here at all")
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.redactPii(docs, "doc_id", "text")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out(1) == "contact me at <EMAIL> or call <NUM> now")
    assert(out(2) == "pin 123 is short but <NUM> is not")
    assert(out(3) == "no pii here at all")
  }

  test("chunking: stride windows cover the doc; tail kept; short docs = 1 chunk") {
    import spark.implicits._
    val docs = Seq(
      (1, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 words, 2 chunks
      (2, "a b c")                                   // within budget
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .chunkByTokens(docs, "doc_id", "text", maxTokens = 6, stride = 4)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> (r.getString(2), r.getInt(3)))
      .toMap
    assert(out((1, 0)) == ("w1 w2 w3 w4 w5 w6", 6))
    assert(out((1, 1)) == ("w5 w6 w7 w8 w9 w10", 6)) // overlap of 2
    assert(out((2, 0)) == ("a b c", 3))
    assert(out.size == 3)
  }

  test("tfidf: shared terms score 0, distinctive terms score tf*ln(N/df)") {
    import spark.implicits._
    val docs = Seq(
      (1, "cat cat dog"), (2, "cat fish"), (3, "cat bird")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.tfidf(docs, "doc_id", "text")
      .collect().map(r => (r.getInt(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // 'cat' appears in every doc -> idf = ln(3/3) = 0
    assert(out((1, "cat")) == (2L, 0.0))
    // 'dog' in 1 of 3 docs, tf 1 -> ln(3) rounded to 6
    assert(out((1, "dog")) ==
      (1L, BigDecimal(math.log(3.0)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble))
    assert(out.size == 6) // (1,cat),(1,dog),(2,cat),(2,fish),(3,cat),(3,bird)
  }

  test("packSequences: contiguous fill respects start offsets; repartition-stable") {
    import spark.implicits._
    val chunks = (0 until 10).flatMap(d =>
      (0 until 4).map(i => (d.toLong, i, 10 + (d + i) % 7)))
      .toDF("doc_id", "chunk_idx", "n_tokens")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.operators.TextAnalysis
        .packSequences(df, "doc_id", "chunk_idx", "n_tokens",
          budget = 32, shards = 3)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1)) ->
          (r.getInt(3), r.getLong(4), r.getInt(5))).toMap
    val out = run(chunks)
    // every row's START offset lies in its pack's budget window
    out.foreach { case ((d, i), (shard, cum, pack)) =>
      val nTokens = 10 + (d + i) % 7
      val start = cum - nTokens
      assert(start / 32 == pack, s"row ($d,$i): start $start pack $pack")
    }
    // shard-local packs start at 0 and are contiguous
    out.values.groupBy(_._1).foreach { case (_, rows) =>
      val packs = rows.map(_._3).toSet
      assert(packs == (0 until packs.size).toSet)
    }
    assert(run(chunks.repartition(7)) == out) // partitioning-invariant
  }

  test("buildVocab: ids are contiguous frequency ranks with word tiebreak") {
    import spark.implicits._
    val docs = Seq((1, "b a b c b a"), (2, "a c d")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.buildVocab(docs, "text", minCount = 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    // b:3 a:3 c:2, d dropped (minCount); tie a/b at 3 -> 'a' first
    assert(out == Map("a" -> ((3L, 0)), "b" -> ((3L, 1)), "c" -> ((2L, 2))))
  }

  test("stripBoilerplate: df>=minDocs segments vanish everywhere; order kept") {
    import spark.implicits._
    // 4-word window -> doc 1/2/3 share the boilerplate segment
    // "cookie banner accept all"; doc 1 also repeats a segment with
    // doc 2 only (df=2, stays). Doc 4 is PURE boilerplate -> dropped.
    val boiler = "cookie banner accept all"
    val docs = Seq(
      (1, s"$boiler unique one text here rare tail words"),
      (2, s"$boiler unique one text here other body words"),
      (3, s"$boiler third doc body stays fully intact now"),
      (4, boiler)
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .stripBoilerplate(docs, "doc_id", "text", windowWords = 4, minDocs = 3)
      .collect().map(r => r.getInt(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(!out.contains(4)) // nothing left to keep
    assert(out(1) == (("unique one text here rare tail words", 2L, 1L)))
    assert(out(2) == (("unique one text here other body words", 2L, 1L)))
    assert(out(3) == (("third doc body stays fully intact now", 2L, 1L)))
    // df=2 segment ("unique one text here") survives in both docs
    assert(out(1)._1.startsWith("unique one text here"))
  }

  test("importanceWeights: target-like docs score higher; partition-invariant") {
    import spark.implicits._
    // target vocabulary {alpha beta} vs raw vocabulary {gamma delta};
    // a raw doc written in target vocabulary must out-score raw-like
    // raw docs (that is the whole point of the scorer)
    val docs = Seq(
      (1, "alpha beta alpha beta alpha beta", true),
      (2, "beta alpha beta alpha beta alpha", true),
      (3, "gamma delta gamma delta gamma delta", false),
      (4, "delta gamma delta gamma delta gamma", false),
      (5, "alpha beta alpha beta beta alpha", false), // target-like raw doc
      (6, "x", false)                                 // <2 words: no features
    ).toDF("doc_id", "text", "is_t")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Sampling
        .importanceWeights(df, "doc_id", "text", org.apache.spark.sql.functions.col("is_t"), 64)
        .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val out = run(docs)
    assert(!out.contains(6))
    assert(out(5)._2 > out(3)._2 && out(5)._2 > out(4)._2)
    assert(out(1)._2 > out(3)._2)
    assert(out(1)._1 == 5L) // 6 words -> 5 bigrams
    assert(run(docs.repartition(7)) == out) // hash-keyed, partition-invariant
  }

  test("near-dup removal is off-able via bands beyond signature width") {
    import spark.implicits._
    val en = "the quick fast query scans a wide table of rows"
    val docs = Seq((1, en), (3, en + " extra")).toDF("doc_id", "text")
    // k/bands rows per band: full-width single band only merges exact
    // signature matches; doc 3's extra word shifts some of the 16 mins
    val strict = CorpusPipeline.clean(docs, "doc_id", "text",
      cfg.copy(minhashBands = 1))
    assert(strict.count() == 2)
  }

  test("substrWindow stage: gates judge the residual after span removal") {
    import spark.implicits._
    // doc 11 survives intact; doc 12 lifts 11's 6-token span and adds
    // only 3 original words — with the exact-substring stage on (w=4),
    // the lifted span vanishes and the 3-word residual fails the
    // minWords=4 gate; with the stage off, its full 9 words pass
    val span = "the fast query scans wide tables"
    val docs = Seq(
      (11, s"$span of the rows here"),
      (12, s"$span another the unique")
    ).toDF("doc_id", "text")
    val without = CorpusPipeline.clean(docs, "doc_id", "text", cfg)
      .select("doc_id").collect().map(_.getInt(0)).toSet
    assert(without == Set(11, 12))
    val withStage = CorpusPipeline.clean(docs, "doc_id", "text",
      cfg.copy(substrWindow = Some(4)))
    val rows = withStage.collect()
      .map(r => r.getInt(0) -> r.getAs[Int]("n_words")).toMap
    assert(rows.keySet == Set(11))
    // and the survivor's metrics reflect its own (unchanged) text
    assert(rows(11) == 10)
  }

  test("gopherQualityFlags: each rule fires on its planted violator only") {
    import spark.implicits._
    // a compliant base doc: 60 words, mean length in band, all alpha,
    // no symbols, stopwords present
    val good = ("the data " * 15 + "be to of and that have with " +
      "table scan rows join " * 8).trim.split(" ").take(60).mkString(" ")
    val docs = Seq(
      (1L, good),                                    // passes all
      (2L, "short doc the be"),                      // too few words
      (3L, (1 to 60).map(_ => "a").mkString(" ") +
        " the be to"),                               // mean word len < 3
      (4L, (1 to 60).map(_ => "1234").mkString(" ") +
        " the be to of"),                            // alpha frac low
      (5L, good.split(" ").map(w => w + " #").mkString(" ")), // symbols
      (6L, (1 to 60).map(i => s"w$i").mkString(" ")) // no stopwords
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .gopherQualityFlags(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("ok_n_words"), r.getAs[Boolean]("ok_word_len"),
         r.getAs[Boolean]("ok_alpha"), r.getAs[Boolean]("ok_symbols"),
         r.getAs[Boolean]("ok_stopwords"), r.getAs[Boolean]("keep")))
      .toMap
    assert(out(1L) == ((true, true, true, true, true, true)))
    assert(!out(2L)._1 && !out(2L)._6)
    assert(!out(3L)._2 && !out(3L)._6)
    assert(!out(4L)._3 && !out(4L)._6)
    assert(!out(5L)._4 && !out(5L)._6)
    assert(!out(6L)._5 && !out(6L)._6)
  }
}
