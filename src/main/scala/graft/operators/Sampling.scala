package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PortableHash

/** Deterministic sampling and dataset splitting for training corpora.
  *
  * `Dataset.sample` draws from a per-partition RNG: resplitting the
  * input changes the sample, which is unacceptable for reproducible
  * corpus construction. These operators instead key every decision on
  * a content-derived hash — the same row lands in the same
  * sample/split on any cluster, any partitioning, any engine (the
  * hash is [[PortableHash]], so the decisions are SQL-oracle-able).
  *
  * Scale: a narrow filter/projection over the id column — no shuffle,
  * fully codegen'd, prunes before any downstream work.
  */
object Sampling {

  private def bucket(idCol: Column, buckets: Int, salt: String): Column =
    pmod(PortableHash.hash60(concat(idCol.cast("string"), lit(salt))), lit(buckets))

  // every caller-supplied string that lands inside a generated SQL
  // literal (salt, source labels) goes through this — same hardening
  // as Relational.unpivot's label escaping
  private def sq(s: String): String = s.replace("'", "''")

  private def bucketSql(idExpr: String, buckets: Int, salt: String): String =
    s"${PortableHash.hash60Sql(s"concat(CAST($idExpr AS VARCHAR), '${sq(salt)}')")} % $buckets"

  /** Keep a deterministic `pct`-percent sample keyed on the id. */
  def hashSample(df: DataFrame, idCol: String, pct: Int,
                 salt: String = ""): DataFrame =
    df.filter(bucket(col(idCol), 100, salt) < pct)

  def hashSampleSql(idExpr: String, pct: Int, salt: String = ""): String =
    s"${bucketSql(idExpr, 100, salt)} < $pct"

  /** Assign every row to a named split by cumulative percentage
    * (e.g. Seq("train" -> 90, "valid" -> 5, "test" -> 5)). The split
    * column is stable under repartitioning and across engines. */
  def hashSplit(df: DataFrame, idCol: String, splits: Seq[(String, Int)],
                salt: String = ""): DataFrame = {
    require(splits.map(_._2).sum == 100, "split percentages must sum to 100")
    val b = bucket(col(idCol), 100, salt)
    val cums = splits.scanLeft(0)(_ + _._2).tail
    val expr = splits.zip(cums).foldRight(lit(null).cast("string")) {
      case (((name, _), cum), acc) => when(b < cum, name).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  def hashSplitSql(idExpr: String, splits: Seq[(String, Int)],
                   salt: String = ""): String = {
    val b = bucketSql(idExpr, 100, salt)
    val cums = splits.scanLeft(0)(_ + _._2).tail
    val branches = splits.zip(cums)
      .map { case ((name, _), cum) => s"WHEN ($b) < $cum THEN '${sq(name)}'" }
    s"CASE ${branches.mkString(" ")} END"
  }

  /** Per-stratum sampling rates — the corpus-balancing op (e.g.
    * downsample over-represented languages or sources): the keep
    * decision is the same content-hash bucket as [[hashSample]], but
    * compared against a per-stratum percentage from a literal CASE
    * chain. Still a narrow codegen'd filter — the stratum column is
    * already on the row, so no join, no shuffle, and the same row is
    * kept or dropped identically on any partitioning. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       rates: Seq[(String, Int)], defaultPct: Int,
                       salt: String = ""): DataFrame = {
    val rate = rates.foldRight(lit(defaultPct)) { case ((s, p), acc) =>
      when(col(stratumCol) === s, lit(p)).otherwise(acc)
    }
    df.filter(bucket(col(idCol), 100, salt) < rate)
  }

  def stratifiedSampleSql(idExpr: String, stratumExpr: String,
                          rates: Seq[(String, Int)], defaultPct: Int,
                          salt: String = ""): String = {
    val branches = rates
      .map { case (s, p) => s"WHEN $stratumExpr = '${sq(s)}' THEN $p" }
    s"${bucketSql(idExpr, 100, salt)} < " +
      s"(CASE ${branches.mkString(" ")} ELSE $defaultPct END)"
  }

  /** Hard per-group cap — "at most `k` documents per domain", the
    * C4/Gopher-style host-balancing rule that stops a handful of
    * boilerplate-heavy domains from dominating a crawl corpus. Winners
    * are the `k` smallest content-hash values per group (with the id
    * as a total-order tie-break), so the kept set is a deterministic
    * "random" sample: stable under repartitioning, across engines, and
    * nested (capping at k' < k keeps a subset of the k winners).
    *
    * One shuffle on the group key; Spark plans the rank filter as
    * WindowGroupLimit, so each map task pre-prunes to its local top-k
    * before the exchange — the shuffle carries O(groups · k) rows, not
    * the corpus (pinned in SamplingSpec).
    */
  def capPerGroup(df: DataFrame, idCol: String, groupCol: String, k: Int,
                  salt: String = ""): DataFrame = {
    require(k > 0, "cap must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(
        PortableHash.hash60(concat(col(idCol).cast("string"), lit(salt))).asc,
        col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Oracle twin of [[capPerGroup]]'s ranking expression. */
  def capPerGroupRankSql(idExpr: String, groupExpr: String,
                         salt: String = ""): String =
    s"row_number() OVER (PARTITION BY $groupExpr ORDER BY " +
      s"${PortableHash.hash60Sql(s"concat(CAST($idExpr AS VARCHAR), '${sq(salt)}')")}, $idExpr)"

  /** Priority sampling (Duffield, Lund, Thorup — "Priority sampling
    * for estimation of arbitrary subset sums", JACM 2007): EXACTLY k
    * rows per stratum, drawn without replacement with probability
    * increasing in weight, plus the scheme's unbiased subset-sum
    * estimator. Each row gets priority `q = w / u` with `u` uniform
    * in (0, 1]; the k highest priorities per stratum win, and the
    * (k+1)-th priority `τ` prices the winners: `weight_est =
    * max(w, τ)` is unbiased for the stratum's total weight over any
    * subset (the paper's Theorem 1) — a stratum with ≤ k rows is
    * taken whole with `weight_est = w` exactly.
    *
    * Chosen over the Efraimidis–Spirakis `u^(1/w)` reservoir
    * DELIBERATELY: the priority needs one IEEE-exact division
    * (`u` is the million-bucket content hash as everywhere — here
    * `w · 10⁶ / (bucket+1)`, multiply + divide, both correctly
    * rounded), so the cross-engine ORDER is bit-reproducible, where
    * a pow/ln key would hang the k-th-place cut on last-ulp libm
    * agreement (the q94/temperature-mix advice class). Rounding
    * touches display columns only, never the ranking key.
    *
    * Scale shape: one shuffle on the stratum key; both rank
    * consumers filter on `row_number ≤ k(+1)`, so Spark's
    * WindowGroupLimit caps each map-side group at k+1 rows before
    * the exchange — the window never sees a stratum's full extent.
    * τ rides a broadcast back onto the winners.
    *
    * Rows with non-positive (or NULL) weight are dropped up front:
    * the scheme's unbiasedness (Theorem 1) assumes w > 0 — a zero or
    * negative weight would still rank and could become τ, silently
    * voiding the `weight_est` guarantee for the whole stratum. */
  def prioritySample(df: DataFrame, idCol: String, strataCol: String,
                     weightCol: Column, k: Int,
                     salt: String = ""): DataFrame = {
    require(k >= 1, "k must be at least 1")
    val u = (bucket(col(idCol), 1000000, salt) + lit(1L)).cast("double")
    val prio = weightCol.cast("double") * lit(1000000.0) / u
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(prio.desc, col(idCol).asc)
    val ranked = df.filter(weightCol.cast("double") > 0.0)
      .withColumn("__prio", prio)
      .withColumn("__rn", row_number().over(w))
    val tau = ranked.filter(col("__rn") === k + 1)
      .select(col(strataCol), col("__prio").as("__tau"))
    ranked.filter(col("__rn") <= k)
      .join(broadcast(tau), Seq(strataCol), "left")
      .select(col(strataCol), col(idCol),
        weightCol.cast("double").as("weight"),
        round(col("__prio"), 6).as("priority"),
        col("__rn").as("rn"),
        round(when(col("__tau").isNull, weightCol.cast("double"))
          .otherwise(greatest(weightCol.cast("double"), col("__tau"))), 6)
          .as("weight_est"))
  }

  /** Oracle twin of [[prioritySample]]: the same priority formula,
    * ranking, τ rule, and display rounding as one SQL string over
    * `fromExpr`. */
  def prioritySampleSql(fromExpr: String, idExpr: String,
                        strataExpr: String, weightExpr: String, k: Int,
                        salt: String = ""): String = {
    val b = bucketSql(idExpr, 1000000, salt)
    s"""WITH pr AS (SELECT $strataExpr AS strata, $idExpr AS id,
       |    CAST($weightExpr AS DOUBLE) AS w,
       |    CAST($weightExpr AS DOUBLE) * 1000000.0 / ($b + 1) AS prio
       |  FROM $fromExpr WHERE CAST($weightExpr AS DOUBLE) > 0.0),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY strata
       |    ORDER BY prio DESC, id) AS rn FROM pr),
       |tau AS (SELECT strata, prio AS tau FROM rk WHERE rn = ${k + 1})
       |SELECT rk.strata AS $strataExpr, rk.id AS $idExpr,
       |  rk.w AS weight, round(rk.prio, 6) AS priority,
       |  CAST(rk.rn AS INTEGER) AS rn,
       |  round(CASE WHEN tau.tau IS NULL THEN rk.w
       |    ELSE greatest(rk.w, tau.tau) END, 6) AS weight_est
       |FROM rk LEFT JOIN tau USING (strata) WHERE rk.rn <= $k""".stripMargin
  }

  /** Weighted (soft) sampling: keep each row with probability equal to
    * a per-row weight column in [0, 1] — the "soft filter" form of
    * quality filtering (a doc scoring 0.9 survives 9x more often than
    * one scoring 0.1, instead of a hard threshold discarding tails).
    * The draw is the same million-bucket content hash as everywhere
    * else, so it is deterministic, partitioning-invariant, and
    * SQL-oracle-able; still one narrow codegen'd filter. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: Column,
                     salt: String = ""): DataFrame =
    // explicit floor on both engines: a bare CAST truncates in Spark
    // but rounds in DuckDB
    df.filter(bucket(col(idCol), 1000000, salt) <
      floor(least(greatest(weightCol, lit(0.0)), lit(1.0)) * 1000000.0))

  def weightedSampleSql(idExpr: String, weightExpr: String,
                        salt: String = ""): String =
    s"${bucketSql(idExpr, 1000000, salt)} < " +
      s"CAST(floor(least(greatest($weightExpr, 0.0), 1.0) * 1000000.0) AS BIGINT)"

  /** Token-budget corpus assembly — the form a training run actually
    * orders: "N tokens total, mixed w_s per source", not row
    * percentages. Each source admits documents in content-hash order
    * (deterministic, partitioning-invariant — the same "random but
    * reproducible" order as every sampler here) until its cumulative
    * token count reaches `totalTokens · w_s / Σw`; the running sum is
    * one window per source partition, codegen'd, so the only shuffle
    * is the per-source repartition the window needs. Realized budgets
    * undershoot by at most one document (the straddling doc is
    * excluded, never split — chunk first if that matters).
    */
  def tokenBudgetMix(df: DataFrame, idCol: String, sourceCol: String,
                     tokensCol: Column, weights: Seq[(String, Double)],
                     totalTokens: Long, salt: String = ""): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "weights must be positive")
    val wSum = weights.map(_._2).sum
    val budget = weights.foldRight(lit(null).cast("double")) {
      case ((s, w), acc) =>
        // Scala-side double arithmetic; the oracle replays the SAME
        // expression in SQL (totalTokens * w / wSum, that op order)
        when(col(sourceCol) === s, lit(totalTokens * w / wSum)).otherwise(acc)
    }
    val h = PortableHash.hash60(concat(col(idCol).cast("string"), lit(salt)))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol)).orderBy(h.asc, col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.filter(col(sourceCol).isin(weights.map(_._1): _*))
      .withColumn("__cum", sum(tokensCol).over(win))
      .filter(col("__cum") <= budget)
      .drop("__cum")
  }

  /** Oracle twin of [[tokenBudgetMix]]: identical hash order, window
    * frame, and budget arithmetic in SQL. */
  def tokenBudgetMixSql(table: String, idExpr: String, sourceExpr: String,
                        tokensExpr: String, weights: Seq[(String, Double)],
                        totalTokens: Long, salt: String = "",
                        selectCols: String = "*"): String = {
    val wSum = weights.map(_._2).sum
    val inList = weights.map(w => s"'${sq(w._1)}'").mkString(", ")
    val budget = weights.foldRight("CAST(NULL AS DOUBLE)") {
      case ((s, w), acc) =>
        s"CASE WHEN $sourceExpr = '${sq(s)}' THEN $totalTokens * CAST($w AS DOUBLE) / CAST($wSum AS DOUBLE) ELSE $acc END"
    }
    val h = PortableHash.hash60Sql(s"concat(CAST($idExpr AS VARCHAR), '${sq(salt)}')")
    s"""SELECT $selectCols FROM (
       |  SELECT *, sum($tokensExpr) OVER (PARTITION BY $sourceExpr
       |    ORDER BY $h, $idExpr ROWS UNBOUNDED PRECEDING) AS __cum
       |  FROM $table WHERE $sourceExpr IN ($inList))
       |WHERE __cum <= $budget""".stripMargin
  }

  /** Domain mixing: downsample each source so the output corpus hits
    * the caller's target proportions — the corpus-assembly step that
    * turns raw per-source dumps into a training mix (e.g. 50% web /
    * 30% code / 20% books). Never upsamples: the feasible corpus size
    * is set by the binding source (`min n_s / w_s`), every other
    * source is thinned to match.
    *
    * One partial-aggregated count job reduces to O(#sources) driver
    * scalars (the same budget class as a Bloom sketch or z-order
    * min/max — never rows); the keep decision is then the usual
    * content-hash threshold, a narrow codegen'd filter with
    * million-bucket resolution, reproducible on any partitioning.
    * Rates are drawn i.i.d. per row, so realized counts vary ~√n
    * around the targets — exact-count assembly would need a global
    * sort and is deliberately not this operator.
    */
  def mixToTarget(df: DataFrame, idCol: String, sourceCol: String,
                  weights: Seq[(String, Double)],
                  salt: String = ""): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "weights must be positive")
    val inMix = df.filter(col(sourceCol).isin(weights.map(_._1): _*))
    val counts = inMix.groupBy(col(sourceCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val t = weights.map { case (s, w) => counts.getOrElse(s, 0L) / w }.min
    val thr = weights.map { case (s, w) =>
      val n = counts.getOrElse(s, 0L)
      s -> (if (n == 0L) 0L else math.floor(t * w / n * 1000000.0).toLong)
    }
    val thrCol = thr.foldRight(lit(0L)) { case ((s, v), acc) =>
      when(col(sourceCol) === s, lit(v)).otherwise(acc)
    }
    inMix.filter(bucket(col(idCol), 1000000, salt) < thrCol)
  }

  /** Temperature-scaled domain mixing (the LLaMA/T5 multilingual
    * mixing rule): target proportions p_s ∝ n_s^alpha, so alpha = 1
    * reproduces the natural distribution and alpha → 0 flattens
    * toward uniform — low-resource sources are UP-weighted relative
    * to their share (never upsampled: [[mixToTarget]]'s binding-source
    * rule sets the feasible size and thins everything else).
    *
    * Implementation: one O(#sources) count job derives the weights,
    * then delegates to [[mixToTarget]] — same reproducible
    * content-hash thinning, same scale shape.
    *
    * Cross-engine weight determinism (round-9 ADVICE — the weights
    * CANNOT be driver-interpolated literals here, because unlike
    * [[mixToTargetSql]]'s config weights they derive from the DATA's
    * counts and the oracle is a static string): at alpha = 0.5 — the
    * LLaMA default and the registered q132 point — both engines
    * compute `sqrt(n)`, which IEEE 754 requires CORRECTLY ROUNDED, so
    * the pre-rounding weights are bit-identical and the 6-dp
    * quantization cannot straddle engines (an exact-decimal …5 at the
    * 7th digit would need the dyadic double to be a multiple of
    * 5×10⁻⁷, which a full-mantissa sqrt output is not). At other
    * alphas `pow` is only within-1-ulp on each engine and a
    * quantization-boundary flip, while ~1e-9-improbable per source,
    * is possible — documented residual risk, carried by the operator
    * rather than hidden in the oracle. */
  def mixByTemperature(df: DataFrame, idCol: String, sourceCol: String,
                       alpha: Double, salt: String = ""): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha in (0, 1]")
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "no sources")
    val weights = counts.toSeq.sortBy(_._1).map { case (s, n) =>
      val raw = if (alpha == 0.5) math.sqrt(n.toDouble)
                else math.pow(n.toDouble, alpha)
      s -> BigDecimal(raw)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    mixToTarget(df, idCol, sourceCol, weights, salt)
  }

  /** Oracle twin of [[mixByTemperature]]: the same counts → rounded
    * pow weights → [[mixToTargetSql]] threshold arithmetic, entirely
    * in SQL. alpha = 0.5 emits `sqrt` for the correctly-rounded
    * bit-identical path (see [[mixByTemperature]]'s determinism
    * note). */
  def mixByTemperatureSql(table: String, idExpr: String,
                          sourceExpr: String, alpha: Double,
                          salt: String = ""): String = {
    val h = bucketSql(idExpr, 1000000, salt)
    val powExpr = if (alpha == 0.5) "sqrt(CAST(n AS DOUBLE))"
                  else s"pow(CAST(n AS DOUBLE), $alpha)"
    s"""WITH c AS (SELECT $sourceExpr AS src, count(*) AS n FROM $table
       |    GROUP BY 1),
       |w AS (SELECT src, round($powExpr, 6) AS wt,
       |    n FROM c),
       |tv AS (SELECT min(n / wt) AS t FROM w),
       |thr AS (SELECT src, CAST(floor(t * wt / n * 1000000.0) AS BIGINT)
       |    AS thr FROM w CROSS JOIN tv)
       |SELECT d.* FROM $table d JOIN thr ON d.$sourceExpr = thr.src
       |WHERE $h < thr""".stripMargin
  }

  /** Oracle twin of [[mixToTarget]]: the same threshold arithmetic
    * (identical operation order, so IEEE doubles agree) computed in
    * SQL over the same counts. `w LEFT JOIN c` + coalesce(n, 0)
    * mirrors the Scala `getOrElse(0L)`: a weighted source with zero
    * rows forces t = 0 (empty output) in BOTH engines, instead of the
    * inner join silently dropping the missing source from the min. */
  def mixToTargetSql(table: String, idExpr: String, sourceExpr: String,
                     weights: Seq[(String, Double)],
                     salt: String = ""): String = {
    val inList = weights.map(w => s"'${sq(w._1)}'").mkString(", ")
    val values = weights.map { case (s, w) => s"('${sq(s)}', CAST($w AS DOUBLE))" }
      .mkString(", ")
    s"""WITH c AS (SELECT $sourceExpr AS src, count(*) AS n FROM $table
       |    WHERE $sourceExpr IN ($inList) GROUP BY 1),
       |w AS (SELECT * FROM (VALUES $values) AS t(src, wt)),
       |tv AS (SELECT min(coalesce(n, 0) / wt) AS t
       |  FROM w LEFT JOIN c USING (src)),
       |thr AS (SELECT c.src, CAST(floor(t * wt / n * 1000000.0) AS BIGINT) AS thr
       |  FROM c JOIN w USING (src) CROSS JOIN tv)
       |SELECT d.* FROM $table d JOIN thr ON d.$sourceExpr = thr.src
       |WHERE ${bucketSql(idExpr, 1000000, salt)} < thr""".stripMargin
  }

  /** CCNet-style perplexity bucketing (Wenzek et al., "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl
    * Data", LREC 2020 §4.4): split the corpus into head / middle /
    * tail TERCILES by language-model score — CCNet keeps "head" (the
    * best-scoring third under the reference LM) as its quality tier,
    * and downstream mixes sample per tier. The LM here is the
    * engine's own corpus-bigram scorer
    * ([[TextAnalysis.ngramLmScore]]; higher avg log-prob = more
    * probable = head).
    *
    * Determinism and scale in one move: tier assignment is by GLOBAL
    * RANK over the total order (lm_score, id) — ties broken by id —
    * via [[Relational.globalRowNumber]] (range repartition +
    * broadcast offsets; NO single-partition sort), then the tercile
    * is exact integer arithmetic `((rn-1)·3) div n` — bit-portable,
    * no float quantile thresholds to straddle engines (an
    * interpolated-percentile cut would reintroduce exactly the
    * boundary-flip class the q94 oracle rework removed). The corpus
    * size joins as a broadcast 1-row max over the already-ranked
    * frame, riding its checkpoint — never a driver collect of data.
    * Docs with fewer than two words have no bigrams and are absent
    * (nothing to score), as in the scorer itself. */
  def perplexityBuckets(df: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    val scored = graft.operators.TextAnalysis.ngramLmScore(df, idCol, textCol)
    val ranked = graft.operators.Relational.globalRowNumber(
      scored, Seq("lm_score", idCol), "__rn")
    ranked
      .crossJoin(broadcast(ranked.agg(max(col("__rn")).as("__n"))))
      .select(col(idCol), col("n_bigrams"), col("lm_score"),
        expr("CASE ((__rn - 1) * 3) div __n WHEN 0 THEN 'tail' " +
          "WHEN 1 THEN 'middle' ELSE 'head' END").as("bucket"))
  }

  /** DSIR-style importance weights (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", 2023): score every
    * document by how much more likely its hashed-bigram features are
    * under the TARGET distribution (the high-quality exemplar slice —
    * here a predicate over the corpus) than under the RAW distribution
    * (everything else). Documents with high weight "look like" the
    * target; resampling the raw pool by these weights is the paper's
    * selection step (compose with [[weightedSample]]).
    *
    * Features are bigrams hashed into `buckets` buckets — the paper's
    * hashed n-gram generative model — with add-one smoothing, so the
    * per-gram log-ratio is
    * `ln((t_b+1)/(T+B)) − ln((r_b+1)/(R+B))`; the reported
    * `dsir_weight` is the per-gram MEAN of the ratio (length-normalized
    * — same avg-of-logs determinism as [[TextAnalysis.ngramLmScore]]:
    * rounded to 6 decimals so the float-sum association of any engine
    * or partitioning agrees). Documents with fewer than 2 words have no
    * features and drop out, as in ngramLmScore.
    *
    * Scale shape: the bucket count table is exactly `buckets` rows no
    * matter the corpus size — it (plus the 1-row totals) broadcasts to
    * the scoring join, so the only corpus-sized shuffle is the per-doc
    * aggregate. The hash is [[PortableHash]] → the whole computation is
    * SQL-oracle-able.
    */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
                        isTarget: Column, buckets: Int = 1024): DataFrame = {
    val grams = df.select(col(idCol), isTarget.as("__t"),
        split(col(textCol), " ").as("ws"))
      .select(col(idCol), col("__t"), explode(expr(
        """transform(slice(ws, 1, greatest(size(ws) - 1, 0)),
          |  (w, i) -> concat(w, ' ', element_at(ws, i + 2)))""".stripMargin))
        .as("bg"))
      .withColumn("__b", pmod(PortableHash.hash60(col("bg")), lit(buckets)))
      .cache()
    val counts = grams.groupBy(col("__b")).agg(
      sum(when(col("__t"), 1L).otherwise(0L)).as("tc"),
      sum(when(col("__t"), 0L).otherwise(1L)).as("rc"))
    val ratio = counts
      .crossJoin(broadcast(
        counts.agg(sum(col("tc")).as("T"), sum(col("rc")).as("R"))))
      .select(col("__b"),
        (log((col("tc") + 1).cast("double") / (col("T") + buckets)) -
          log((col("rc") + 1).cast("double") / (col("R") + buckets)))
          .as("__lr"))
    grams.join(broadcast(ratio), Seq("__b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        round(avg(col("__lr")), 6).as("dsir_weight"))
  }

  /** Oracle twin of [[importanceWeights]] (md5 backend only). */
  def importanceWeightsSql(table: String, idExpr: String, textExpr: String,
                           isTargetExpr: String, buckets: Int): String =
    s"""WITH d AS (SELECT $idExpr AS id, $isTargetExpr AS t,
       |    string_split($textExpr, ' ') AS ws FROM $table),
       |bgs AS (SELECT id, t, ws[i] || ' ' || ws[i + 1] AS bg
       |  FROM (SELECT id, t, ws, unnest(generate_series(1, len(ws) - 1)) AS i
       |        FROM d WHERE len(ws) >= 2)),
       |hb AS (SELECT id, t,
       |    ${PortableHash.hash60Sql("bg")} % $buckets AS b FROM bgs),
       |cnt AS (SELECT b,
       |    sum(CASE WHEN t THEN 1 ELSE 0 END) AS tc,
       |    sum(CASE WHEN t THEN 0 ELSE 1 END) AS rc
       |  FROM hb GROUP BY b),
       |tot AS (SELECT CAST(sum(tc) AS BIGINT) AS tt,
       |    CAST(sum(rc) AS BIGINT) AS rt FROM cnt),
       |lr AS (SELECT b,
       |    ln(CAST(tc + 1 AS DOUBLE) / (tt + $buckets)) -
       |    ln(CAST(rc + 1 AS DOUBLE) / (rt + $buckets)) AS lr
       |  FROM cnt CROSS JOIN tot)
       |SELECT id AS doc_id, count(*) AS n_grams,
       |  round(avg(lr), 6) AS dsir_weight
       |FROM hb JOIN lr USING (b) GROUP BY id""".stripMargin
}
