package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Determinism contracts for hash sampling/splitting — the properties
  * Dataset.sample (per-partition RNG) cannot give. */
class SamplingSpec extends SparkTestBase {

  private def ids = {
    import spark.implicits._
    (1 to 2000).toDF("id")
  }

  test("sample is stable under repartitioning and is a strict subset") {
    val s1 = Sampling.hashSample(ids, "id", 10).collect().map(_.getInt(0)).toSet
    val s2 = Sampling.hashSample(ids.repartition(13), "id", 10)
      .collect().map(_.getInt(0)).toSet
    assert(s1 == s2)
    assert(s1.nonEmpty && s1.size < 2000)
    // ~10% within loose tolerance (hash uniformity, not RNG)
    assert(s1.size > 100 && s1.size < 300)
    // growing the pct only ever adds rows (nested samples)
    val s20 = Sampling.hashSample(ids, "id", 20).collect().map(_.getInt(0)).toSet
    assert(s1.subsetOf(s20))
  }

  test("split assigns every row exactly once, stable across partitioning") {
    val splits = Seq("train" -> 90, "valid" -> 5, "test" -> 5)
    val out = Sampling.hashSplit(ids, "id", splits)
    assert(out.filter(col("split").isNull).count() == 0)
    assert(out.count() == 2000)
    val m1 = out.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val m2 = Sampling.hashSplit(ids.repartition(7), "id", splits)
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(m1 == m2)
    val byName = m1.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(byName("train") > 1600 && byName("valid") > 50 && byName("test") > 50)
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(ids, "id", Seq("a" -> 50, "b" -> 49))
    }
  }

  test("stratified sample applies per-stratum rates, stable and nested") {
    import spark.implicits._
    val rows = (1 to 3000).map(i => (i, Seq("en", "es", "fr")(i % 3)))
      .toDF("id", "lang")
    val out = Sampling.stratifiedSample(rows, "id", "lang",
      Seq("en" -> 10, "es" -> 50), defaultPct = 100)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("fr") == 1000) // default 100% keeps every fr row
    assert(byLang("en") > 50 && byLang("en") < 200) // ~10% of 1000
    assert(byLang("es") > 400 && byLang("es") < 600) // ~50% of 1000
    // stable under repartitioning
    val ids1 = out.select("id").collect().map(_.getInt(0)).toSet
    val ids2 = Sampling.stratifiedSample(rows.repartition(11), "id", "lang",
        Seq("en" -> 10, "es" -> 50), defaultPct = 100)
      .select("id").collect().map(_.getInt(0)).toSet
    assert(ids1 == ids2)
    // a stratum's sample nests inside the plain hashSample at the same pct
    val en10 = out.filter(col("lang") === "en")
      .select("id").collect().map(_.getInt(0)).toSet
    val all10 = Sampling.hashSample(rows, "id", 10)
      .select("id").collect().map(_.getInt(0)).toSet
    assert(en10.subsetOf(all10))
  }

  test("mixToTarget hits target proportions; binding source kept whole") {
    import spark.implicits._
    // 4000 web / 900 code / 2000 other: targets 50/30/20 → code binds
    // (900/0.3 = 3000 feasible), web thins to 1500, other to 600
    val rows = ((1 to 4000).map(i => (i, "web")) ++
      (4001 to 4900).map(i => (i, "code")) ++
      (4901 to 6900).map(i => (i, "other"))).toDF("id", "src")
    val out = Sampling.mixToTarget(rows, "id", "src",
      Seq("web" -> 0.5, "code" -> 0.3, "other" -> 0.2))
    val n = out.groupBy("src").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(n("code") == 900L) // binding source: kept in full, never upsampled
    assert(math.abs(n("web") - 1500.0) / 1500.0 < 0.1)
    assert(math.abs(n("other") - 600.0) / 600.0 < 0.1)
    // decision is partitioning-invariant
    val re = Sampling.mixToTarget(rows.repartition(17), "id", "src",
      Seq("web" -> 0.5, "code" -> 0.3, "other" -> 0.2))
      .select("id").collect().map(_.getInt(0)).toSet
    assert(re == out.select("id").collect().map(_.getInt(0)).toSet)
  }

  test("mixByTemperature flattens toward uniform; alpha=1 is the natural mix") {
    import spark.implicits._
    // 4000 web / 250 books: alpha=0.5 → weights 63.25/15.81, books
    // binds (250/15.81 = 15.81), web thins to 15.81·63.25 = 1000 —
    // the low-resource source's SHARE rises from 5.9% to ~20%
    val rows = ((1 to 4000).map(i => (i, "web")) ++
      (4001 to 4250).map(i => (i, "books"))).toDF("id", "src")
    val n = Sampling.mixByTemperature(rows, "id", "src", alpha = 0.5)
      .groupBy("src").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(n("books") == 250L) // binding source kept whole
    assert(math.abs(n("web") - 1000.0) / 1000.0 < 0.1)
    // alpha = 1: weights ∝ n, every threshold is the full bucket
    // range — the natural distribution passes through untouched
    val nat = Sampling.mixByTemperature(rows, "id", "src", alpha = 1.0)
    assert(nat.count() == 4250L)
  }

  test("weightedSample keeps ~w fraction per weight level; clips outside [0,1]") {
    import spark.implicits._
    val rows = (1 to 9000).map(i => (i, (i % 3) match {
      case 0 => 0.1; case 1 => 0.9; case _ => 7.0 // 7.0 clips to 1.0
    })).toDF("id", "w")
    val kept = Sampling.weightedSample(rows, "id", col("w"))
      .groupBy("w").count().collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(math.abs(kept(0.1) - 300.0) < 60)   // 3000 rows x 0.1
    assert(math.abs(kept(0.9) - 2700.0) < 90)  // 3000 rows x 0.9
    assert(kept(7.0) == 3000L)                 // clipped to certainty
    // negative weights keep nothing
    assert(Sampling.weightedSample(rows.withColumn("w", lit(-1.0)), "id", col("w"))
      .isEmpty)
  }

  test("tokenBudgetMix: per-source budgets honored, hash order, partition-stable") {
    import spark.implicits._
    val docs = (1 to 60).map(i =>
      (i, if (i % 2 == 0) "a" else "b", 100)) // 30 docs x 100 tokens per source
      .toDF("id", "src", "toks")
    // budgets: a gets 1000*0.8=800 → 8 docs; b gets 200 → 2 docs
    val out = Sampling.tokenBudgetMix(docs, "id", "src", col("toks"),
      Seq("a" -> 0.8, "b" -> 0.2), 1000L)
    val bySrc = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc == Map("a" -> 8L, "b" -> 2L))
    // cumulative tokens never exceed the budget
    assert(out.filter(col("src") === "a").agg(sum(col("toks"))).head.getLong(0) <= 800L)
    // deterministic under repartitioning
    val ids = (df: org.apache.spark.sql.DataFrame) =>
      df.select("id").collect().map(_.getInt(0)).toSet
    assert(ids(out) == ids(Sampling.tokenBudgetMix(docs.repartition(7), "id",
      "src", col("toks"), Seq("a" -> 0.8, "b" -> 0.2), 1000L)))
  }

  test("every sampling contract holds under BOTH hash backends (md5, xxhash64)") {
    val prop = graft.functions.PortableHash.BackendProp
    def contracts(): Unit = {
      // stability under repartitioning + plausible fraction + nesting
      val s1 = Sampling.hashSample(ids, "id", 10).collect().map(_.getInt(0)).toSet
      val s2 = Sampling.hashSample(ids.repartition(13), "id", 10)
        .collect().map(_.getInt(0)).toSet
      assert(s1 == s2)
      assert(s1.size > 100 && s1.size < 300)
      assert(s1.subsetOf(
        Sampling.hashSample(ids, "id", 20).collect().map(_.getInt(0)).toSet))
      // split totality + partition invariance
      val splits = Seq("train" -> 90, "valid" -> 5, "test" -> 5)
      val m1 = Sampling.hashSplit(ids, "id", splits).collect()
        .map(r => r.getInt(0) -> r.getString(1)).toMap
      val m2 = Sampling.hashSplit(ids.repartition(7), "id", splits).collect()
        .map(r => r.getInt(0) -> r.getString(1)).toMap
      assert(m1 == m2 && m1.size == 2000)
    }
    val md5Sample =
      try {
        System.setProperty(prop, "md5"); contracts()
        Sampling.hashSample(ids, "id", 10).collect().map(_.getInt(0)).toSet
      } finally System.clearProperty(prop)
    val xxSample =
      try {
        System.setProperty(prop, "xxhash64"); contracts()
        Sampling.hashSample(ids, "id", 10).collect().map(_.getInt(0)).toSet
      } finally System.clearProperty(prop)
    // the backends are genuinely different hash functions — the flag
    // must actually switch the expression, not alias one to the other
    assert(md5Sample != xxSample)
  }

  test("a different salt draws a different sample") {
    val a = Sampling.hashSample(ids, "id", 10).collect().map(_.getInt(0)).toSet
    val b = Sampling.hashSample(ids, "id", 10, salt = "run2")
      .collect().map(_.getInt(0)).toSet
    assert(a != b)
  }

  test("capPerGroup keeps exactly k deterministic winners per group") {
    import spark.implicits._
    val rows = (1 to 900).map(i => (i, s"g${i % 3}")).toDF("id", "g")
    val out = Sampling.capPerGroup(rows, "id", "g", 10)
    val byG = out.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG == Map("g0" -> 10L, "g1" -> 10L, "g2" -> 10L))
    // a group already under the cap passes through whole
    val small = Sampling.capPerGroup(rows.filter(col("id") <= 5), "id", "g", 10)
    assert(small.count() == 5)
    // stable under repartitioning
    val w1 = out.select("id").collect().map(_.getInt(0)).toSet
    val w2 = Sampling.capPerGroup(rows.repartition(13), "id", "g", 10)
      .select("id").collect().map(_.getInt(0)).toSet
    assert(w1 == w2)
    // nested: tightening the cap keeps a subset of the old winners
    val w5 = Sampling.capPerGroup(rows, "id", "g", 5)
      .select("id").collect().map(_.getInt(0)).toSet
    assert(w5.subsetOf(w1) && w5.size == 15)
  }

  test("capPerGroup plans map-side WindowGroupLimit before the shuffle") {
    import spark.implicits._
    val rows = (1 to 900).map(i => (i, s"g${i % 3}")).toDF("id", "g")
    val df = Sampling.capPerGroup(rows, "id", "g", 10)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // both the partial (pre-shuffle) and final WindowGroupLimit must
    // appear — the partial is what keeps the shuffle at O(groups·k)
    assert("WindowGroupLimit".r.findAllIn(plan).length >= 2,
      s"rank-limit pushdown missing:\n$plan")
  }

  test("perplexityBuckets: terciles by rank, ties by id, sub-bigram docs absent") {
    import spark.implicits._
    // Score semantics: lm_score = avg ln P(w2|w1) under the corpus's
    // own bigram counts, so a doc whose bigrams are fully predictable
    // from their prefix scores 0 (the maximum). Docs 6-9 use globally
    // unique words -> every P(w2|w1) = 1 -> all tie at 0.0 (head,
    // tiebroken by id). The clones 1-4 share prefix 'alpha' with doc
    // 5's different continuation, so their P(beta|alpha) < 1; doc 5
    // mixes the diluted prefix with its own branches and scores
    // lowest. One 1-word doc must be absent (nothing to score).
    val docs = ((1L to 4L).map(i => (i, "alpha beta alpha beta gamma")) ++
      Seq((5L, "alpha beta delta epsilon zeta"),
        (6L, "eta theta iota kappa lam"),
        (7L, "mu nu xi omicron pi"),
        (8L, "rho sigma tau upsilon phi"),
        (9L, "chi psi omega aleph bet"),
        (10L, "solo"))).toDF("doc_id", "text")
    val out = graft.operators.Sampling
      .perplexityBuckets(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(!out.contains(10L), "1-word doc has no bigrams")
    assert(out.size == 9)
    // ascending rank: 5 (lowest), clones 1-4 (shared score, id ties),
    // then the four 0.0 docs 6-9 (id ties) -> exact terciles of 3:
    assert(out == Map(5L -> "tail", 1L -> "tail", 2L -> "tail",
      3L -> "middle", 4L -> "middle", 6L -> "middle",
      7L -> "head", 8L -> "head", 9L -> "head"), s"$out")
  }

  test("prioritySample: exact-k winners replay the w/u formula; " +
    "small strata pass whole; partitioning-invariant") {
    import spark.implicits._
    val rows = (1L to 40L).map(i =>
      (i, if (i <= 30) "big" else "small", (i % 7 + 1).toDouble)) ++
      (41L to 43L).map(i => (i, "tiny", i.toDouble))
    val df = rows.toDF("doc_id", "strata", "w")
    val k = 4
    val out = Sampling.prioritySample(df, "doc_id", "strata",
      col("w"), k).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getInt(4), r.getDouble(5)))
    // local replay of the exact priority formula over the same hash
    val hashed = df.select(col("doc_id"), col("strata"), col("w"),
        (pmod(graft.functions.PortableHash.hash60(
          concat(col("doc_id").cast("string"), lit(""))),
          lit(1000000)) + lit(1L)).cast("double").as("u6"))
      .collect().map(r => (r.getString(1), r.getLong(0),
        r.getDouble(2), r.getDouble(2) * 1000000.0 / r.getDouble(3)))
    def expectStratum(s: String): (Seq[(Long, Double, Double)], Option[Double]) = {
      val ranked = hashed.filter(_._1 == s)
        .sortBy { case (_, id, _, p) => (-p, id) }
      val tau = ranked.drop(k).headOption.map(_._4)
      (ranked.take(k).map { case (_, id, w, p) => (id, w, p) }, tau)
    }
    for (s <- Seq("big", "small", "tiny")) {
      val (want, tau) = expectStratum(s)
      val got = out.filter(_._1 == s).sortBy(_._4)
      assert(got.map(_._2).toSeq == want.map(_._1),
        s"winners in $s must be the k highest priorities")
      // the estimator: max(w, tau), plain w when no (k+1)-th row
      got.zip(want).foreach { case ((_, _, wgt, _, est), (_, w, _)) =>
        val e = tau.map(t => math.max(w, t)).getOrElse(w)
        assert(math.abs(est - BigDecimal(e)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
        assert(wgt == w)
      }
    }
    assert(out.count(_._1 == "big") == k)
    assert(out.count(_._1 == "small") == k,
      "10-row stratum still yields k=4 winners with a real tau")
    assert(out.count(_._1 == "tiny") == 3,
      "a stratum below k passes whole, weight_est = w exactly")
    // partition-layout invariance of the whole output
    val re = Sampling.prioritySample(df.repartition(7, col("w")),
      "doc_id", "strata", col("w"), k).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getInt(4), r.getDouble(5))).sortBy(t => (t._1, t._4))
    assert(re.toSeq == out.sortBy(t => (t._1, t._4)).toSeq)
  }
}
