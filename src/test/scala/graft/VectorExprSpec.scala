package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Similarity

/** The custom CosineSim expression must be bit-identical to the
  * built-ins-only formulation (both are sequential left-to-right double
  * sums) — this is what keeps the DuckDB oracle valid. */
class VectorExprSpec extends SparkTestBase {

  test("CosineSim == composable cosine, bit-exact, on real embeddings") {
    val e = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val a = e.select(col("vec_id").as("ia"), col("v").as("va"))
    val b = e.select(col("vec_id").as("ib"), col("v").as("vb"))
    val pairs = a.join(b, col("ia") < col("ib") && col("ib") < col("ia") + 7)
    val diffs = pairs.select(
        Similarity.cosine(col("va"), col("vb")).as("custom"),
        Similarity.cosineComposable(col("va"), col("vb")).as("composed"))
      .filter(col("custom") =!= col("composed"))
      .count()
    assert(diffs == 0)
  }

  test("standardize: per-dim zero mean/unit variance; zero-variance dim -> 0") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, 10.0f, 7.0f)),
      (2L, Array(3.0f, 20.0f, 7.0f)),
      (3L, Array(5.0f, 30.0f, 7.0f))).toDF("vec_id", "embedding")
    val out = Similarity.standardize(df, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // dim0: mean 3, sd_pop sqrt(8/3); dim1: mean 20, sd sqrt(200/3);
    // dim2 constant -> all zeros, never NaN
    val s0 = math.sqrt(8.0 / 3.0)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out(1)(0) == r6((1 - 3) / r6(s0)) && out(3)(0) == r6((5 - 3) / r6(s0)))
    assert(out.values.forall(v => v(2) == 0.0))
    // standardized column has zero mean per dim
    assert(math.abs(out.values.map(_(1)).sum) < 1e-9)
  }

  test("CosineSim interpreted eval matches codegen path") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(3.0, 2.0, 1.0))).toDF("a", "b")
    val v = df.select(Similarity.cosine(col("a"), col("b"))).head.getDouble(0)
    val expected = 10.0 / (math.sqrt(14.0) * math.sqrt(14.0))
    assert(math.abs(v - expected) < 1e-15)
  }

  test("Centroid UDAF: per-dim mean, null rows skipped, partition-invariant") {
    import spark.implicits._
    val rows = Seq(
      (1, Array(1.0f, 2.0f)), (1, Array(3.0f, 6.0f)),
      (1, null.asInstanceOf[Array[Float]]), (2, Array(5.0f, 5.0f)))
    def centroids(parts: Int): Map[Int, Seq[Double]] =
      rows.toDF("k", "v").repartition(parts)
        .groupBy(col("k")).agg(graft.functions.Centroid(col("v")).as("c"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val one = centroids(1)
    assert(one(1) == Seq(2.0, 4.0)) // null row contributes nothing
    assert(one(2) == Seq(5.0, 5.0))
    assert(centroids(7) == one) // merge order cannot change the result
  }

  test("kmeansCells: Lloyd iterations separate planted clusters from a mixed seed") {
    import spark.implicits._
    // three orthogonal-direction clusters; ids are aligned with the
    // id%3 seed for 27 points, and 3 points are planted in the WRONG
    // seed cell — one Lloyd iteration must move them to their true
    // cluster's cell
    def vec(cluster: Int, jitter: Float): Array[Float] = {
      val v = Array.fill(6)(0.01f * jitter)
      v(cluster) = 10.0f + jitter; v
    }
    val aligned = (0 until 27).map(i => (i.toLong, vec(i % 3, (i % 5).toFloat)))
    val planted = Seq( // id%3 != true cluster
      (27L, vec(1, 1.0f)), (28L, vec(2, 2.0f)), (29L, vec(0, 3.0f)))
    val df = (aligned ++ planted).toDF("vid", "emb")
    val cells = Similarity.kmeansCells(df, "vid", "emb", k = 3, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    def trueCluster(id: Long): Int =
      if (id < 27) (id % 3).toInt else Seq(1, 2, 0)((id - 27).toInt)
    // every ground-truth cluster maps to exactly one distinct cell
    val byCluster = cells.groupBy { case (id, _) => trueCluster(id) }
      .view.mapValues(_.values.toSet).toMap
    assert(byCluster.values.forall(_.size == 1), s"mixed cells: $byCluster")
    assert(byCluster.values.flatten.toSet.size == 3)
    // deterministic under repartitioning
    val again = Similarity.kmeansCells(df.repartition(7), "vid", "emb", 3, 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(again == cells)
  }

  test("quantizeInt8: codes span the range, error within half a step") {
    import spark.implicits._
    val df = Seq((1L, Array(0.5f, -0.25f, 0.125f, 0.0f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.quantizeInt8(df, "vec_id", "embedding").head
    assert(r.getAs[Double]("scale_max") == 0.5)
    assert(r.getAs[scala.collection.Seq[Int]]("q_vec").toList ==
      List(127, -64, 32, 0)) // max |x| -> ±127
    // symmetric quantization error bound: half a code step
    assert(r.getAs[Double]("recon_err") <= 0.5 / 127.0 / 2.0 + 1e-12)
  }

  test("Centroid UDAF registers for SQL use") {
    import spark.implicits._
    graft.functions.Centroid.register(spark)
    Seq((1, Array(2.0f, 4.0f)), (1, Array(4.0f, 8.0f)))
      .toDF("k", "v").createOrReplaceTempView("centroid_in")
    val r = spark.sql(
      "SELECT centroid(v) AS c FROM centroid_in GROUP BY k")
      .head.getSeq[Double](0)
    assert(r == Seq(3.0, 6.0))
  }

  test("TrigramScores == the explode+join+sum formulation it replaced") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // real corpus docs + adversarial rows: shorter than one trigram,
    // empty, and a gram shared between languages ("ent" is in both the
    // en and fr tables) which must credit BOTH
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .union(Seq((900001L, "ab"), (900002L, ""), (900003L, "ententement"))
        .toDF("doc_id", "text"))
    val viaExpr = TextAnalysis.languageId(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    // reference formulation: per-occurrence trigrams joined to the dim
    val lt = docs.select(col("doc_id"), lower(col("text")).as("__lt"))
    val grams = lt.select(col("doc_id"), explode_outer(
      when(length(col("__lt")) >= 3,
        expr("transform(sequence(1, length(__lt) - 2), i -> substring(__lt, i, 3))"))
        .otherwise(array().cast("array<string>"))).as("g"))
    val dim = TextAnalysis.langTrigrams.toSeq.sortBy(_._1)
      .flatMap { case (l, gs) => gs.map { case (g, wt) => (l, g, wt) } }
      .toDF("__tg_lang", "g", "wt")
    val scores = TextAnalysis.langOrder.map { lang =>
      sum(when(col("__tg_lang") === lang, col("wt")).otherwise(0))
        .cast("long").as(s"score_$lang")
    }
    val viaJoin = TextAnalysis.languageIdFromScores(
        grams.join(broadcast(dim), Seq("g"), "left")
          .groupBy(col("doc_id")).agg(scores.head, scores.tail: _*))
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(viaExpr == viaJoin)
    assert(viaExpr.size > 3)
    // the shared gram credited both languages in one doc
    val shared = viaExpr(900003L)
    val en = TextAnalysis.langOrder.indexOf("en")
    val fr = TextAnalysis.langOrder.indexOf("fr")
    assert(shared(en).asInstanceOf[Long] > 0 && shared(fr).asInstanceOf[Long] > 0)
  }

  test("TrigramScores plan is a narrow shuffle-free projection, no UDF") {
    val plan = TextPlan.df(spark, sfDir)
    plan.collect()
    val p = plan.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"languageId should not shuffle:\n$p")
    assert(!p.toLowerCase.contains("udf"))
  }

  private object TextPlan {
    def df(s: org.apache.spark.sql.SparkSession, dir: String) =
      graft.operators.TextAnalysis.languageId(
        Tables.load(s, dir, "documents"), "doc_id", "text")
  }

  test("trainLangProfiles: hand-derived top-K, rank weights, gram-asc ties") {
    import spark.implicits._
    // lang a: 'abab ' -> grams aba(1) bab(1) 'ab '(1), doc x3 so all x3;
    // plus one 'ababab' doc -> aba x2, bab x2. Totals: aba 5, bab 5,
    // 'ab ' 3. topK=2 -> rank1 aba (tie 5/5, gram asc), rank2 bab.
    val docs = (Seq.fill(3)(("a", "abab ")) :+ ("a", "ababab") :+
      ("b", "zzzz")).toDF("lang", "text")
    val got = graft.operators.TextAnalysis
      .trainLangProfiles(docs, "lang", "text", topK = 2)
      .orderBy("lang", "wt")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("a", "bab", 1, 5L), ("a", "aba", 2, 5L),
      ("b", "zzz", 2, 2L))) // one distinct gram: rank 1 -> wt topK+1-1=2
  }

  test("trainLangProfiles: sub-trigram and empty docs contribute NO grams " +
      "(Spark's sequence(1,0) steps DESCENDING — the unguarded form emits)") {
    import spark.implicits._
    val docs = Seq(("a", ""), ("a", "ab"), ("a", "x"), ("b", "qqq"))
      .toDF("lang", "text")
    val got = graft.operators.TextAnalysis
      .trainLangProfiles(docs, "lang", "text", topK = 5)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("b", "qqq")), s"$got") // never ("a", "ab") etc.
  }

  test("languageIdWith on the BAKED profile == languageId's argmax (same machinery)") {
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents").limit(200)
    val baked = graft.operators.TextAnalysis.langTrigrams.toSeq
      .flatMap { case (l, gs) => gs.map { case (g, w) => (l, g, w) } }
      .toDF("lang", "gram", "wt")
    import org.apache.spark.sql.functions.{col => c, greatest}
    val trained = graft.operators.TextAnalysis
      .languageIdWith(docs, "doc_id", "text", baked)
      .select(c("doc_id"), c("pred_lang").as("p1"))
    val staticFull = graft.operators.TextAnalysis
      .languageId(docs, "doc_id", "text")
    // the two tie-breaks differ (langOrder vs lexicographic), so the
    // winners must agree exactly where the max is UNIQUE
    val langs = graft.operators.TextAnalysis.langOrder
    val best = greatest(langs.map(l => c(s"score_$l")): _*)
    val nAtMax = langs.map(l =>
        org.apache.spark.sql.functions.when(c(s"score_$l") === best, 1)
          .otherwise(0))
      .reduce(_ + _)
    val static = staticFull.filter(nAtMax === 1)
      .select(c("doc_id"), c("pred_lang").as("p2"))
    val both = trained.join(static, "doc_id")
    assert(both.count() > 0) // the filter must leave something to compare
    val disagree = both.filter(c("p1") =!= c("p2")).count()
    assert(disagree == 0, s"$disagree unique-max disagreements")
  }

  test("languageIdWith breadth: a 12-language trained profile set classifies " +
      "each language's held-out text correctly (no 5-lang assumption anywhere)") {
    import spark.implicits._
    // 12 synthetic "languages", each with a private 3-letter alphabet
    // block so its trigrams are disjoint from every other's; 20
    // training docs per language, one held-out doc each
    def word(li: Int): String = {
      val a = ('a' + (li * 2) % 26).toChar
      val b = ('a' + (li * 2 + 1) % 26).toChar
      s"$a$b$a$b$a"
    }
    val langs = (0 until 12).map(i => f"lg$i%02d")
    val train = langs.zipWithIndex.flatMap { case (l, i) =>
      (0 until 20).map(_ => (l, s"${word(i)} ${word(i)} ${word(i)}"))
    }.toDF("lang", "text")
    val prof = graft.operators.TextAnalysis
      .trainLangProfiles(train, "lang", "text", topK = 10)
    assert(prof.select("lang").distinct().count() == 12)
    val heldOut = langs.zipWithIndex
      .map { case (l, i) => (l, s"${word(i)} ${word(i)}") }
      .toDF("truth", "text")
      .withColumn("doc_id", org.apache.spark.sql.functions
        .monotonically_increasing_id())
    val pred = graft.operators.TextAnalysis
      .languageIdWith(heldOut, "doc_id", "text", prof)
      .join(heldOut, "doc_id")
    val wrong = pred.filter(org.apache.spark.sql.functions
      .col("pred_lang") =!= org.apache.spark.sql.functions.col("truth"))
      .count()
    assert(wrong == 0, s"$wrong misclassified of 12")
  }

  test("single-language profile scores instead of throwing (greatest() needs 2 args)") {
    import spark.implicits._
    val train = Seq(("only", "aaa aaa aaa")).toDF("lang", "text")
    val prof = graft.operators.TextAnalysis
      .trainLangProfiles(train, "lang", "text", topK = 5)
    val docs = Seq((1L, "aaa"), (2L, "zzz")).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis
      .languageIdWith(docs, "doc_id", "text", prof)
      .orderBy("doc_id").collect()
    assert(got.map(_.getString(1)).toSeq == Seq("only", "only"))
    assert(got(0).getLong(2) > 0L && got(1).getLong(2) == 0L)
  }

  test("supplementary-plane grams are excluded at train time (BMP contract): " +
      "the UTF-16 scorer could never match them and the table build would throw") {
    import spark.implicits._
    // an emoji-heavy corpus: every trigram containing the astral char
    // must be dropped BEFORE ranking, so topK fills with scorable
    // grams and profileTable/TrigramTable.build never sees one
    val train = Seq(
      ("em", "ab😀cd ab😀cd xyz xyz xyz"),
      ("pl", "nnn nnn")).toDF("lang", "text")
    val prof = graft.operators.TextAnalysis
      .trainLangProfiles(train, "lang", "text", topK = 10)
    val grams = prof.select("gram").collect().map(_.getString(0))
    assert(grams.nonEmpty)
    grams.foreach(g => assert(g.length == 3 &&
      !g.exists(Character.isSurrogate),
      s"supplementary gram '$g' leaked into the profile"))
    // the trained profile loads and scores end-to-end
    val docs = Seq((1L, "xyz xyz"), (2L, "nnn")).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis
      .languageIdWith(docs, "doc_id", "text", prof)
      .orderBy("doc_id").collect()
    assert(got.map(_.getString(1)).toSeq == Seq("em", "pl"))
  }

  test("languageIdWith plan stays a shuffle-free codegen projection") {
    val docs = Tables.load(spark, sfDir, "documents")
    val prof = graft.operators.TextAnalysis
      .trainLangProfiles(docs, "lang", "text", 15)
    val scored = graft.operators.TextAnalysis
      .languageIdWith(docs, "doc_id", "text", prof)
    scored.collect()
    val p = scored.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"trained scorer should not shuffle:\n$p")
    assert(p.contains("WholeStageCodegen") || p.contains("*("), p)
  }
}
