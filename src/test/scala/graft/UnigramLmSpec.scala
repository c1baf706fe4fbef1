package graft

import graft.operators.UnigramLm

/** Hand-derived unigram-LM fixtures: every log-prob, Viterbi choice,
  * and prune cut below is computed by hand in the comments — the spec
  * is the worked example of the determinism contract. */
class UnigramLmSpec extends SparkTestBase {

  private def trainMap(corpus: Seq[String], p: Int, seedTop: Int,
                       keepMulti: Int, iters: Int): Map[String, (Long, Int)] = {
    import spark.implicits._
    UnigramLm.train(corpus.toDF("text"), "text", p, seedTop, keepMulti, iters)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap
  }

  test("viterbi kernel: longest-piece tie-break, multiplicity, singles fallback") {
    // equal scores: 'ab' (one piece) vs 'a'+'b' (two) — one piece wins
    // outright; on an EXACT tie the smallest start j = longest piece
    val sc = Map("a" -> -1.0, "b" -> -1.0, "ab" -> -2.0)
    assert(UnigramLm.viterbi("ab", sc, 4) == Seq("ab"),
      "tie at -2.0 must keep the smallest j (the 'ab' piece)")
    // repeated use of one piece comes back with multiplicity
    assert(UnigramLm.viterbi("aa", Map("a" -> -1.0), 4) == Seq("a", "a"))
    // pieces missing from the vocab force the single-char fallback
    assert(UnigramLm.viterbi("ab", Map("a" -> -1.0, "b" -> -3.0), 4)
      == Seq("a", "b"))
  }

  test("hand-derived EM round: 'ab ab b'") {
    // words: ab(2), b(1). Seed (P=2): a:2, b:3, ab:2; total 7.
    // scores: a=ab=round(ln(2/7),6)=-1.252763, b=-0.847298.
    // Viterbi 'ab': piece 'ab' (-1.252763) beats a+b (-2.100061);
    // 'b': [b]. Usage: ab:2, b:1. Prune: singles floor a->1, b->1;
    // multi top-2: ab:2. Ranks (cnt DESC, piece ASC): ab,a,b.
    val got = trainMap(Seq("ab ab b"), p = 2, seedTop = 10,
      keepMulti = 2, iters = 1)
    assert(got == Map("ab" -> ((2L, 0)), "a" -> ((1L, 1)), "b" -> ((1L, 2))),
      s"$got")
  }

  test("hand-derived two-round EM: pruning forces re-segmentation") {
    // words: abc(2), ab(1). Seed: a:3 b:3 c:2 ab:3 abc:2 bc:2; total 15.
    // Round 1 Viterbi: 'abc' -> [abc] (ln(2/15) beats every split),
    // 'ab' -> [ab]. Usage: abc:2, ab:1. keepMulti=1 KEEPS only abc —
    // the used piece 'ab' is pruned. Round 2 (vocab a:1 b:1 c:1 abc:2,
    // total 5): 'ab' must now re-segment as [a, b]; 'abc' stays [abc].
    // Usage: abc:2, a:1, b:1; singles floor c->1.
    val got = trainMap(Seq("abc abc ab"), p = 3, seedTop = 10,
      keepMulti = 1, iters = 2)
    assert(got == Map("abc" -> ((2L, 0)), "a" -> ((1L, 1)),
      "b" -> ((1L, 2)), "c" -> ((1L, 3))), s"$got")
  }

  test("hand-derived encode: token counts under the trained vocab") {
    import spark.implicits._
    // train on 'ab ab b' (vocab ab:2, a:1, b:1 — first fixture above;
    // total 4, scores a=b=ln(1/4)=-1.386294, ab=ln(2/4)=-0.693147),
    // then encode a second corpus:
    //  'ab ab b' -> words ab,ab,b -> 1+1+1 tokens
    //  'aab'     -> i3 best is a+ab (-2.079441) over a+a+b (-4.158883)
    //               -> 2 tokens
    val trainDocs = Seq("ab ab b").toDF("text")
    val vocab = UnigramLm.train(trainDocs, "text", 2, 10, 2, 1)
    val got = UnigramLm.encode(
        Seq((1L, "ab ab b"), (2L, "aab")).toDF("doc_id", "text"),
        "doc_id", "text", vocab, maxPieceLen = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> ((3L, 3L)), 2L -> ((1L, 2L))), s"$got")
  }

  test("invariants on the documents corpus + determinism") {
    val d = graft.core.Tables.load(spark, sfDir, "documents")
    def run() = UnigramLm.train(d, "text", 4, 40, 16, 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
      .sortBy(_._3).toSeq
    val v1 = run()
    assert(v1 == run(), "training must be deterministic run-to-run")
    val singles = v1.filter(_._1.length == 1)
    val multi = v1.filter(_._1.length >= 2)
    assert(multi.size <= 16 && multi.nonEmpty)
    assert(v1.forall(_._2 >= 1), "counts floored at 1")
    assert(v1.forall(_._1.length <= 4), "maxPieceLen respected")
    assert(v1.map(_._3) == v1.indices, "token ids are a dense 0-based rank")
    // the alphabet survives pruning: every corpus char is a piece
    val chars = d.select(org.apache.spark.sql.functions.col("text"))
      .collect().flatMap(_.getString(0).replace(" ", "")).toSet
    assert(chars.forall(c => singles.exists(_._1 == c.toString)),
      "every corpus character must stay in the vocab")
  }

  test("OOV contract: unknown chars segment as single-char UNK pieces, encode total") {
    import spark.implicits._
    // vocab trained on 'ab ab b' (alphabet {a,b}, piece ab) — encode a
    // corpus with characters the vocab has never seen
    val vocab = UnigramLm.train(Seq("ab ab b").toDF("text"), "text", 2, 10, 2, 1)
    val got = UnigramLm.encode(
        Seq((1L, "ab zz azb"),   // ab->1; zz->2 UNK; azb->a,z,b = 3 (z UNK)
            (2L, "xyz"),         // 3 UNK tokens, all chars unknown
            (3L, "ab")).toDF("doc_id", "text"),
        "doc_id", "text", vocab, maxPieceLen = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> ((3L, 6L)), 2L -> ((1L, 3L)), 3L -> ((1L, 1L))), s"$got")
    // the r12 ADVICE crash class: a word made ONLY of OOV chars must
    // not throw in the backwalk (was StringIndexOutOfBoundsException)
    val one = UnigramLm.encode(Seq((9L, "qqqq")).toDF("doc_id", "text"),
      "doc_id", "text", vocab, maxPieceLen = 2).collect()
    assert(one.map(r => (r.getLong(1), r.getLong(2))).toSeq == Seq((1L, 4L)))
  }

  test("docScore: hand-derived integer micro-nat sums, OOV sinks to UnkMicros") {
    import spark.implicits._
    // vocab from 'ab ab b': ab:2, a:1, b:1; total 4.
    // micros: ab = round(ln(0.5), 6)·1e6  = -693147
    //         a = b = round(ln(0.25), 6)·1e6 = -1386294
    val vocab = UnigramLm.train(Seq("ab ab b").toDF("text"), "text", 2, 10, 2, 1)
    val got = UnigramLm.docScore(
        Seq((1L, "ab ab b"), // 2·(-693147) + (-1386294) = -2772588, 3 toks
            (2L, "az"))      // [a, z·UNK]: -1386294 - 1e12, 2 toks
          .toDF("doc_id", "text"),
        "doc_id", "text", vocab, maxPieceLen = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map(
      1L -> ((3L, 3L, -2772588L)),
      2L -> ((1L, 2L, -1000001386294L))), s"$got")
  }

  test("docScore is partitioning-invariant (integer sums, no float association)") {
    import spark.implicits._
    val d = graft.core.Tables.load(spark, sfDir, "documents")
    val vocab = UnigramLm.train(d, "text", 4, 40, 16, 2)
    def run(parts: Int) = UnigramLm.docScore(
        d.repartition(parts), "doc_id", "text", vocab, maxPieceLen = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(run(1) == run(13))
  }

  test("trainPublished: load-from-store equals train, second call loads") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("unigram_store").toString
    val docs = Seq("ab ab b").toDF("text")
    val direct = UnigramLm.train(docs, "text", 2, 10, 2, 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val published = UnigramLm.trainPublished(docs, root, "c1", "v0001",
        "text", 2, 10, 2, 1)
      .select("piece", "cnt", "token_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(published == direct)
    // second call must hit the store (same result from the snapshot)
    val again = UnigramLm.trainPublished(
        Seq("completely different corpus").toDF("text"), // ignored: loads
        root, "c1", "v0001", "text", 2, 10, 2, 1)
      .select("piece", "cnt", "token_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(again == direct, "existing snapshot must short-circuit training")
  }

  test("OOV contract: known pieces still win over UNK inside mixed words") {
    // viterbi('azb') must use piece scores for a and b, UNK only for z;
    // and a segmentation avoiding UNK always beats one using it
    val scores = Map("a" -> -1.0, "b" -> -1.0, "ab" -> -0.5)
    assert(UnigramLm.viterbi("azb", scores, 2) == Seq("a", "z", "b"))
    assert(UnigramLm.viterbi("ab", scores, 2) == Seq("ab"))
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
    val v = UnigramLm.trainFromCounts(wc, 4, 10, 4, 2)
    assert(v.collect().toSeq ==
      UnigramLm.train(train, "text", 4, 10, 4, 2).collect().toSeq)
    val a = UnigramLm.encode(docs, "doc_id", "text", v, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val b = UnigramLm.encodeFromShared(dw, "doc_id", wcE, v, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(a.toSeq == b.toSeq, "encodeFromShared != encode")
  }
}
