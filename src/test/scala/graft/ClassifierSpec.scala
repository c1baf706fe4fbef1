package graft

import org.apache.spark.sql.functions._
import graft.operators.Classifier

/** Planted-case semantics for the trained logistic quality gate. */
class ClassifierSpec extends SparkTestBase {

  private def corpus = {
    import spark.implicits._
    // positives speak {good clean prose}, negatives {spam junk noise};
    // doc 9 is an UNLABELED-style holdout written in positive
    // vocabulary but labeled negative — the model must still rank it
    // above true negatives (it generalizes from features, not ids)
    Seq(
      (1, "good clean prose good clean prose good clean", true),
      (2, "clean good prose clean good prose clean good", true),
      (3, "prose good clean prose good clean prose", true),
      (4, "spam junk noise spam junk noise spam junk", false),
      (5, "junk spam noise junk spam noise junk spam", false),
      (6, "noise junk spam noise junk spam noise", false),
      (7, "good prose clean good prose clean good prose", true),
      (8, "spam noise junk spam noise junk spam noise", false),
      (9, "good clean prose clean good prose good clean", false),
      (10, "x", true) // <2 words: no features, dropped
    ).toDF("doc_id", "text", "is_good")
  }

  private def run(df: org.apache.spark.sql.DataFrame) =
    Classifier.logisticQuality(df, "doc_id", "text", col("is_good"),
        buckets = 64, iters = 8, learnRate = 2.0)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

  test("separable vocabularies separate; featureless docs drop out") {
    val out = run(corpus)
    assert(!out.contains(10))
    val pos = Seq(1, 2, 3, 7).map(out(_)._2)
    val neg = Seq(4, 5, 6, 8).map(out(_)._2)
    assert(pos.min > 0.5 && neg.max < 0.5,
      s"positives $pos must clear 0.5, negatives $neg must not")
    // the positive-vocabulary doc with a negative label still scores
    // with its vocabulary: above every true negative
    assert(out(9)._2 > neg.max)
    // n_grams = words - 1
    assert(out(1)._1 == 7L)
  }

  test("training is partition-invariant (hash-keyed, rounded updates)") {
    val a = run(corpus)
    val b = run(corpus.repartition(7))
    assert(a == b)
  }

  test("unlearnable labels converge toward the base rate, not a fit") {
    import spark.implicits._
    // identical text, labels alternate: nothing to learn; every score
    // must land at the shared base rate (0.5 here), same for all docs
    val docs = (1 to 8).map(i => (i, "same words every time here", i % 2 == 0))
      .toDF("doc_id", "text", "is_good")
    val out = run(docs.toDF())
    val scores = out.values.map(_._2).toSet
    assert(scores.size == 1, s"identical docs must share one score: $out")
    assert(math.abs(scores.head - 0.5) < 0.05)
  }

  test("scoreWith(trained weights) reproduces logisticQuality exactly; " +
    "the published roundtrip does too") {
    val direct = run(corpus)
    val w = Classifier.trainWeights(corpus, "doc_id", "text",
      col("is_good"), buckets = 64, iters = 8, learnRate = 2.0)
    val scored = Classifier.scoreWith(corpus, "doc_id", "text", w, 64)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(scored == direct,
      "inference from the weight vector must equal train-and-score")
    // through the store: publish, load, score — still identical
    val root = java.nio.file.Files
      .createTempDirectory("clf_store").toString
    val loaded = Classifier.trainPublished(corpus, root, "c1", "v0001",
      "doc_id", "text", col("is_good"), 64, 8, 2.0)
    val viaStore = Classifier.scoreWith(corpus, "doc_id", "text", loaded, 64)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(viaStore == direct)
    // the model really is buckets+1 rows with the bias at id=buckets
    assert(w.count() == 65)
    assert(w.filter(col("bucket") === 64).count() == 1)
  }
}
