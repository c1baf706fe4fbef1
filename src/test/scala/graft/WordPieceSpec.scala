package graft

import graft.operators.{Bpe, WordPiece}

/** Hand-computed fixtures for distributed WordPiece construction —
  * the likelihood-gain merge criterion and the greedy max-match
  * encode, each contrasted against [[Bpe]] on the same corpus. */
class WordPieceSpec extends SparkTestBase {

  // corpus: "low" x4, "lower" x2, "west" x3.
  // token counts (round 1): l=6 o=6 w=9 _=9 e=5 r=2 s=3 t=3
  // pair counts:  (l o)=6 (o w)=6 (w _)=4 (w e)=5 (e r)=2 (r _)=2
  //               (e s)=3 (s t)=3 (t _)=3
  // likelihood scores cnt/(l*r):
  //   (s t)=3/9=.333  (e r)=2/10=.2  (e s)=3/15=.2  (l o)=6/36=.167 ...
  // merge 1: "s t" — the EXCLUSIVE pair wins although (l o) has twice
  //   its raw count (BPE's first merge on this corpus is "l o").
  // round 2 (west -> w e st _): (e r)=2/10=.2 ties (e st)=3/15=.2
  //   exactly (both doubles are round(0.2)) -> pair ASC picks "e r".
  // round 3 (lower -> l o w er _): (e st)=3/9=.333 wins.
  private val trainCorpus =
    Seq("low low low low", "lower lower", "west west west")

  test("train picks merges by likelihood gain, not raw count") {
    import spark.implicits._
    val got = WordPiece.train(trainCorpus.toDF("text"), "text",
        merges = 3, minPairCount = 2L)
      .orderBy("merge_rank")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1, "s t", "st", 3L),
      (2, "e r", "er", 2L),
      (3, "e st", "est", 3L)))
    // contrast: BPE's count criterion starts "l o" on the same corpus
    val bpe = Bpe.train(trainCorpus.toDF("text"), "text", 1, 2L)
      .collect().head.getString(1)
    assert(bpe == "l o")
  }

  test("train score is the exact integer-ratio double") {
    import spark.implicits._
    val got = WordPiece.train(trainCorpus.toDF("text"), "text",
        merges = 2, minPairCount = 2L)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(2), r.getDouble(4)))
    // (s t): 3/(3*3); (e r): 2/(5*2) — one IEEE division each
    assert(got.toSeq == Seq(("st", 3.0 / 9.0), ("er", 2.0 / 10.0)))
  }

  test("train stops emitting ranks once no pair reaches minPairCount") {
    import spark.implicits._
    val got = WordPiece.train(Seq("ab ab").toDF("text"), "text",
      merges = 5, minPairCount = 2L).orderBy("merge_rank").collect()
    assert(got.length == 2)
    assert(got.map(_.getString(2)).toSeq == Seq("ab", "ab_"))
  }

  test("encode is greedy longest-match, not a merge-chain replay") {
    import spark.implicits._
    val merges = WordPiece.train(trainCorpus.toDF("text"), "text",
      merges = 3, minPairCount = 2L) // vocab pieces: st, er, est
    val docs = Seq(
      (1L, "west"),  // w·est·_        = 3 (est matched over st)
      (2L, "lower"), // l·o·w·er·_     = 5
      (3L, "low")    // l·o·w·_        = 4 (no piece applies)
    ).toDF("doc_id", "text")
    val got = WordPiece.encode(docs, "doc_id", "text", merges)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 1L, 3L), (2L, 1L, 5L), (3L, 1L, 4L)))
  }

  test("greedyCount takes the longest piece at each position") {
    val v = Set("est", "st", "er")
    assert(WordPiece.greedyCount("west_", v, 3) == 3)  // w, est, _
    assert(WordPiece.greedyCount("wst_", v, 3) == 3)   // w, st, _
    assert(WordPiece.greedyCount("ester_", v, 3) == 3) // est, er, _
  }

  test("OOV contract: unknown characters cost one token each, encode total") {
    import spark.implicits._
    val merges = WordPiece.train(trainCorpus.toDF("text"), "text",
      merges = 3, minPairCount = 2L)
    val got = WordPiece.encode(
        Seq((1L, "xz"),   // x·z·_          = 3, nothing matches
            (2L, "xstz"), // x·st·z·_       = 4, pieces apply around OOV
            (3L, "west")).toDF("doc_id", "text"),
        "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 3L, 2L -> 4L, 3L -> 3L))
  }

  test("trainPublished: load-from-store equals train, second call loads") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("wordpiece_store").toString
    val docs = trainCorpus.toDF("text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("merge_rank", "pair", "merged", "cnt", "score").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getLong(3), r.getDouble(4))).toSet
    val direct = rows(WordPiece.train(docs, "text", 3, 2L))
    val published = rows(WordPiece.trainPublished(docs, root, "c1", "v0001",
      "text", 3, 2L))
    assert(published == direct)
    val again = rows(WordPiece.trainPublished(
      Seq("other corpus entirely").toDF("text"), // ignored: loads
      root, "c1", "v0001", "text", 3, 2L))
    assert(again == direct, "existing snapshot must short-circuit training")
  }

  test("encode is invariant to input partitioning") {
    import spark.implicits._
    val docs = (0 until 40).map(i => (i.toLong,
      Seq.fill(3 + i % 5)(Seq("slow", "grow", "lowest")(i % 3)).mkString(" ")))
      .toDF("doc_id", "text")
    val merges = WordPiece.train(docs, "text", merges = 4, minPairCount = 2L)
    val a = WordPiece.encode(docs.repartition(1), "doc_id", "text", merges)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val b = WordPiece.encode(docs.repartition(13), "doc_id", "text", merges)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(a == b)
    val words = docs.as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(" ") }.toMap
    a.foreach { case (id, nTok) =>
      val ws = words(id)
      assert(nTok <= ws.map(_.length + 1).sum, s"doc $id")
      assert(nTok >= ws.length, s"doc $id")
    }
  }

  test("trainFromCounts/encodeFromShared are row-identical to train/encode") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, sum}
    val train = (0 until 30).map(i =>
      Seq.fill(1 + i % 3)(Seq("low", "lower", "west")(i % 3)).mkString(" "))
      .toDF("text")
    val docs = (0 until 25).map(i => (i.toLong, s"low lower west word$i"))
      .toDF("doc_id", "text")
    val wc = graft.operators.Bpe.wordCounts(train, "text").localCheckpoint(true)
    val dw = graft.operators.Bpe.docWordCounts(docs, "doc_id", "text")
      .localCheckpoint(true)
    val wcE = dw.groupBy(col("word")).agg(sum(col("__c")).as("wcount"))
    val mt = WordPiece.trainFromCounts(wc, 5, 2L)
    assert(mt.collect().toSeq ==
      WordPiece.train(train, "text", 5, 2L).collect().toSeq)
    val a = WordPiece.encode(docs, "doc_id", "text", mt)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val b = WordPiece.encodeFromShared(dw, "doc_id", wcE, mt)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(a.toSeq == b.toSeq, "encodeFromShared != encode")
  }
}
