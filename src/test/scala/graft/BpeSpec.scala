package graft

import graft.operators.Bpe

/** Hand-computed fixtures for distributed BPE tokenizer construction. */
class BpeSpec extends SparkTestBase {

  test("train learns the hand-derived merges on a planted corpus") {
    import spark.implicits._
    // corpus: "low" x4, "lower" x2, "west" x3  (one doc per row)
    val docs = Seq(
      "low low low low", "lower lower", "west west west"
    ).toDF("text")
    // char seqs: l o w _ (x4), l o w e r _ (x2), w e s t _ (x3)
    // pair counts: (l,o)=6 (o,w)=6 (w,_)=4 (w,e)=5 (e,r)=2 (r,_)=2
    //              (e,s)=3 (s,t)=3 (t,_)=3
    // merge 1: count 6 tie between "l o" and "o w" -> "l o" (asc)
    // after:  lo w _ x4, lo w e r _ x2, w e s t _ x3
    // merge 2: (lo,w)=6 -> "lo w"
    // after:  low _ x4, low e r _ x2, w e s t _ x3
    // merge 3: counts (low,_)=4 (low,e)=2 (e,r)=2 (r,_)=2 (w,e)=3
    //          (e,s)=3 (s,t)=3 (t,_)=3 -> max 4: "low _"
    val got = Bpe.train(docs, "text", merges = 3, minPairCount = 2L)
      .orderBy("merge_rank")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1, "l o", "lo", 6L),
      (2, "lo w", "low", 6L),
      (3, "low _", "low_", 4L)))
  }

  test("train stops emitting ranks once no pair reaches minPairCount") {
    import spark.implicits._
    val docs = Seq("ab ab").toDF("text") // pairs: (a,b)=2, (b,_)=2
    val got = Bpe.train(docs, "text", merges = 5, minPairCount = 2L)
      .orderBy("merge_rank").collect()
    // merge1 "a b"(2), merge2 "ab _"(2) -> word "ab_" single token,
    // no pairs remain; ranks 3..5 are absent, not null rows
    assert(got.length == 2)
    assert(got.map(_.getString(2)).toSeq == Seq("ab", "ab_"))
  }

  test("encode applies the greedy left-to-right merge rule") {
    import spark.implicits._
    val train = Seq("low low low low", "lower lower", "west west west")
      .toDF("text")
    val merges = Bpe.train(train, "text", merges = 3, minPairCount = 2L)
    val docs = Seq(
      (1L, "low lower"), // low_ -> 1 tok; low e r _ -> 4 toks
      (2L, "west")       // w e s t _ -> 5 toks (no merge touches it)
    ).toDF("doc_id", "text")
    val got = Bpe.encode(docs, "doc_id", "text", merges)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 5L), (2L, 1L, 5L)))
  }

  test("encode is invariant to input partitioning") {
    import spark.implicits._
    val docs = (0 until 40).map(i => (i.toLong,
      Seq.fill(3 + i % 5)(Seq("slow", "grow", "lowest")(i % 3)).mkString(" ")))
      .toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", merges = 4, minPairCount = 2L)
    val a = Bpe.encode(docs.repartition(1), "doc_id", "text", merges)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val b = Bpe.encode(docs.repartition(13), "doc_id", "text", merges)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(a == b)
    // merging can only shrink the per-word token count below
    // chars+1 and never below 1 token per word
    val words = docs.as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(" ") }.toMap
    a.foreach { case (id, nTok) =>
      val ws = words(id)
      assert(nTok <= ws.map(_.length + 1).sum, s"doc $id")
      assert(nTok >= ws.length, s"doc $id")
    }
  }

  test("OOV contract: unknown chars pass through as single-char tokens, encode total") {
    import spark.implicits._
    // merges trained on an {s,l,o,w,g,r,e,t} alphabet; encode words
    // with characters no merge rule references
    val docs = (0 until 12).map(i => (i.toLong, "slow slow grow"))
      .toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", merges = 3, minPairCount = 2L)
    val got = Bpe.encode(
        Seq((1L, "xz"),          // x z _ -> 3 tokens, nothing merges
            (2L, "sxlow"),       // s x l o w _ -> merges apply around x
            (3L, "slow")).toDF("doc_id", "text"),
        "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // whatever 'slow' costs with the learned merges, 'sxlow' costs at
    // most 2 more than 'xz'-style pass-through and x stays un-merged:
    assert(got(1L) == 3L, s"$got")
    // 'slow' must compress below chars+1; the OOV word must not
    assert(got(3L) < 5L, s"$got")
    assert(got(2L) >= got(3L), s"$got")
  }

  test("byte-level family: hand-derived hex merges; multi-byte chars encode totally") {
    import spark.implicits._
    // corpus "ab" x3: byte seq "61 62 _"; pairs (61,62)=3, (62,_)=3
    // merge 1: count tie 3 -> '61 62' (asc, digits before _)
    // merge 2: (6162,_)=3 -> '6162 _'
    val docs = Seq.fill(3)("ab").toDF("text")
    val merges = Bpe.trainBytes(docs, "text", merges = 2, minPairCount = 2L)
      .orderBy("merge_rank")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq == Seq(
      (1, "61 62", "6162", 3L),
      (2, "6162 _", "6162_", 3L)))
    // encode: 'ab' -> 1 token; 'café' -> c a f é(2 bytes) + _ = 5
    // tokens (no rule matches); '世' -> 3 byte tokens + _ = 4. No UNK,
    // no dropped word: encode is total BY CONSTRUCTION
    val mt = Bpe.trainBytes(docs, "text", merges = 2, minPairCount = 2L)
    val enc = Bpe.encodeBytes(
        Seq((1L, "ab"), (2L, "café"), (3L, "世")).toDF("doc_id", "text"),
        "doc_id", "text", mt)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(enc(1L) == (1L, 1L), s"$enc")
    assert(enc(2L) == (1L, 6L), s"$enc") // 3 ascii + 2 bytes of é + _
    assert(enc(3L) == (1L, 4L), s"$enc") // 3 bytes + _
  }

  /** Naive driver-side BPE: the spec the distributed trainer must
    * match — char seeding, (count DESC, pair ASC) pick, left-to-right
    * non-overlapping single-pass replace (the engine's applyMerge). */
  private def naiveBpe(texts: Seq[String], merges: Int,
                       minPair: Long): Seq[(Int, String, String, Long)] = {
    var words: Map[String, Long] = texts.flatMap(_.split(" "))
      .filter(_.nonEmpty).groupBy(identity).view.mapValues(_.size.toLong)
      .toMap.map { case (w, c) => (w.map(_ + " ").mkString + "_", c) }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var i = 1
    var done = false
    while (i <= merges && !done) {
      val pairs = words.toSeq.flatMap { case (seq, c) =>
        val ts = seq.split(" ")
        ts.sliding(2).filter(_.length == 2).map(p => (p.mkString(" "), c))
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum)
        .filter(_._2 >= minPair)
      if (pairs.isEmpty) done = true
      else {
        val (p, c) = pairs.toSeq.minBy { case (pr, ct) => (-ct, pr) }
        val m = p.replace(" ", "")
        out += ((i, p, m, c))
        words = words.map { case (seq, ct) =>
          ((" " + seq + " ").replace(" " + p + " ", " " + m + " ").trim, ct)
        }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      }
      i += 1
    }
    out.result()
  }

  test("train matches the naive driver-side BPE past the rechain barrier") {
    // merges = 9 > TrainRechainEvery = 6: exercises the lazily-chained
    // literal rewrite AND the mid-loop re-materialization barrier the
    // round-17 loop rework introduced (the old per-round broadcast
    // crossJoin form is the naive spec here, computed on the driver)
    import spark.implicits._
    val texts = (0 until 60).map(i =>
      Seq.fill(2 + i % 4)(Seq("lowest", "slower", "glowing", "stow",
        "low")(i % 5)).mkString(" "))
    val got = Bpe.train(texts.toDF("text"), "text",
        merges = 9, minPairCount = 2L)
      .orderBy("merge_rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == naiveBpe(texts, 9, 2L), "distributed != naive spec")
  }

  test("shared-frame encode is row-identical to encode (all seedings)") {
    import spark.implicits._
    val train = (0 until 30).map(i =>
      Seq.fill(1 + i % 3)(Seq("low", "lower", "west")(i % 3)).mkString(" "))
      .toDF("text")
    val docsDf = (0 until 25)
      .map(i => (i.toLong, s"low lower west word$i"))
      .toDF("doc_id", "text")
    val wc = Bpe.wordCounts(train, "text").localCheckpoint(true)
    val dw = Bpe.docWordCounts(docsDf, "doc_id", "text").localCheckpoint(true)
    val wcE = dw.groupBy(org.apache.spark.sql.functions.col("word"))
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("__c")).as("wcount"))
    val mt = Bpe.trainFromCounts(wc, 4, 2L)
    assert(mt.collect().toSeq ==
      Bpe.train(train, "text", 4, 2L).collect().toSeq,
      "trainFromCounts != train")
    val a = Bpe.encode(docsDf, "doc_id", "text", mt)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val b = Bpe.encodeFromShared(dw, "doc_id", wcE, mt)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(a.toSeq == b.toSeq, "encodeFromShared != encode (char)")
    val mtB = Bpe.trainBytesFromCounts(wc, 4, 2L)
    val ab = Bpe.encodeBytes(docsDf, "doc_id", "text", mtB)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val bb = Bpe.encodeFromShared(dw, "doc_id", wcE, mtB, bytes = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(ab.toSeq == bb.toSeq, "encodeFromShared != encodeBytes")
  }
}
