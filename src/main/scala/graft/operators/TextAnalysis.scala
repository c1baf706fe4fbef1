package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.PortableHash

/** Text-analysis operators for a large-scale training-data pipeline:
  * language ID, quality scoring, tokenization stats, fingerprinting.
  *
  * All are single-pass narrow transforms (no shuffle): every score is a
  * scalar expression over the text column, so at 100 TB each document is
  * touched exactly once by whole-stage-codegen'd expressions and the
  * operators scale linearly with input splits. No UDFs anywhere.
  */
object TextAnalysis {

  /** Character-trigram frequency table per language: the most frequent
    * character trigrams of each language (space-padded word boundaries
    * included) from published letter/trigram frequency data, with
    * integer weights by frequency rank. Integer weights keep the
    * scores exactly portable across engines (no float drift in the
    * oracle compare). `zh` is scored on romanized (pinyin) trigram
    * shapes, the printable-Latin stand-in this corpus uses. */
  val langTrigrams: Map[String, Seq[(String, Int)]] = Map(
    "en" -> Seq("the" -> 10, " th" -> 9, "he " -> 9, "and" -> 8, "ing" -> 8,
      "nd " -> 7, "ent" -> 6, "ion" -> 6, " of" -> 5, "of " -> 5,
      "is " -> 4, " to" -> 4, "tio" -> 4, "for" -> 3, "was" -> 3),
    "es" -> Seq(" de" -> 10, "de " -> 9, "os " -> 8, "ión" -> 8, " la" -> 7,
      "la " -> 7, "que" -> 6, " qu" -> 6, "ue " -> 5, "ado" -> 5,
      "as " -> 4, "ar " -> 4, "aci" -> 4, " es" -> 3, "el " -> 3),
    "de" -> Seq("der" -> 10, "ein" -> 9, "sch" -> 8, "ich" -> 8, "die" -> 7,
      "und" -> 7, "nde" -> 6, "che" -> 6, "ung" -> 5, "gen" -> 5,
      "en " -> 4, "er " -> 4, "cht" -> 4, " ge" -> 3, "ver" -> 3),
    "fr" -> Seq("es " -> 10, " le" -> 9, "le " -> 8, "ent" -> 8, "de " -> 7,
      " de" -> 7, "nt " -> 6, "les" -> 6, "our" -> 5, "ait" -> 5,
      "eur" -> 4, "ans" -> 4, " pa" -> 4, "qui" -> 3, "une" -> 3),
    "zh" -> Seq("ng " -> 10, "ang" -> 9, "eng" -> 8, "ong" -> 8, "ian" -> 7,
      "zho" -> 7, "hon" -> 6, "sh " -> 6, "shi" -> 5, "xia" -> 5,
      "ji " -> 4, "qi " -> 4, "uan" -> 4, "ao " -> 3, "ai " -> 3))

  /** Language order for deterministic argmax tie-breaking. */
  val langOrder: Seq[String] = Seq("en", "es", "de", "fr", "zh")

  /** Per-doc language scores + argmax prediction, scored on character
    * trigrams against [[langTrigrams]] — computed by the codegen'd
    * [[org.apache.spark.sql.graftext.TrigramScores]] expression: ONE
    * O(len) rolling-key pass per document producing all five weight
    * sums. Same semantics as the explode + broadcast-dim-join +
    * grouped-conditional-sum formulation it replaced (per-occurrence
    * rank weights; the generated DuckDB oracle still computes that
    * form), but with no row explosion, no join, and NO SHUFFLE — the
    * whole scorer is a narrow projection, which is the shape you want
    * when the input is 100 TB of text. Docs shorter than one trigram
    * (and null texts, via the coalesce) keep their row with all-zero
    * scores. */
  def languageId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val scored = df.select(col(idCol),
      org.apache.spark.sql.graftext.TrigramScores.column(
        lower(coalesce(col(textCol), lit("")))).as("__sc"))
    val agg = scored.select(
      col(idCol) +: langOrder.zipWithIndex.map { case (lang, i) =>
        col("__sc")(i).as(s"score_$lang")
      }: _*)
    languageIdFromScores(agg)
  }

  /** Argmax prediction over already-computed `score_<lang>` columns —
    * strict-> argmax with langOrder precedence on ties. */
  def languageIdFromScores(agg: DataFrame): DataFrame = {
    val pred = langOrder.zipWithIndex.foldRight(lit("und")) { case ((lang, _), acc) =>
      val isMax = langOrder.filter(_ != lang).foldLeft(lit(true)) { (c, other) =>
        val cmp = if (langOrder.indexOf(other) < langOrder.indexOf(lang))
          col(s"score_$lang") > col(s"score_$other")
        else col(s"score_$lang") >= col(s"score_$other")
        c && cmp
      }
      when(isMax, lang).otherwise(acc)
    }
    agg.withColumn("pred_lang", pred)
  }

  /** Argmax CASE chain as DuckDB SQL (same precedence semantics). */
  def languageIdPredSql: String = {
    val branches = langOrder.map { lang =>
      val conds = langOrder.filter(_ != lang).map { other =>
        if (langOrder.indexOf(other) < langOrder.indexOf(lang))
          s"score_$lang > score_$other"
        else s"score_$lang >= score_$other"
      }.mkString(" AND ")
      s"WHEN $conds THEN '$lang'"
    }
    s"CASE ${branches.mkString(" ")} ELSE 'und' END"
  }

  /** DuckDB CTE chain computing the SAME per-doc trigram scores over a
    * `documents`-shaped table: emits CTEs `lt` (lowered text), `lg`
    * (trigram explode; short docs produce no rows), `ltg` (the literal
    * trigram dim), `lraw` (grouped weight sums), and `ls` (one row per
    * doc, zero-coalesced — the twin of Spark's explode_outer keeping
    * short docs). Shared by the q39 and q61 oracle builders so the dim
    * cannot drift between them. */
  def langScoresCtesSql(table: String = "documents"): String = {
    val dimValues = langTrigrams.toSeq.sortBy(_._1)
      .flatMap { case (l, gs) => gs.map { case (g, wt) => s"('$l', '$g', $wt)" } }
      .mkString(", ")
    val sums = langOrder.map { l =>
      s"CAST(sum(CASE WHEN lang = '$l' THEN wt ELSE 0 END) AS BIGINT) AS score_$l"
    }.mkString(", ")
    val coalesced = langOrder
      .map(l => s"coalesce(score_$l, 0) AS score_$l").mkString(", ")
    s"""lt AS (SELECT doc_id, lower(text) AS t FROM $table),
       |lg AS (SELECT doc_id, substr(t, CAST(i AS INTEGER), 3) AS g FROM
       |  (SELECT doc_id, t,
       |     unnest(generate_series(1, greatest(length(t) - 2, 0))) AS i FROM lt)),
       |ltg AS (SELECT * FROM (VALUES $dimValues) AS t(lang, g, wt)),
       |lraw AS (SELECT doc_id, $sums FROM lg LEFT JOIN ltg USING (g) GROUP BY doc_id),
       |ls AS (SELECT d.doc_id, $coalesced FROM $table d LEFT JOIN lraw USING (doc_id))""".stripMargin
  }

  // ------------------------------------------------------------------
  // TRAINABLE language profiles — the lift from 5 baked tables to
  // profiles learned from any labeled corpus and published like every
  // other model artifact (kind `lang_profiles`). The scorer is the
  // same one-pass codegen'd machinery ([[languageId]]'s static table
  // is now just the shipped-default profile of the same class).
  // ------------------------------------------------------------------

  /** Learn per-language trigram profiles from a LABELED corpus: for
    * each language, the `topK` most frequent character trigrams of
    * the lowered text (count DESC, gram ASC — a total order both
    * engines compare identically), weighted by descending rank
    * (rank 1 → topK … rank topK → 1; integers, so scores stay exactly
    * portable). Output: (lang, gram, wt, cnt).
    *
    * Scale shape: the corpus-sized work is one explode + hash
    * aggregate keyed (lang, gram) — partial aggregation collapses the
    * 300× trigram explosion map-side, so the shuffle carries distinct
    * (lang, gram) counts (alphabet-bounded), not corpus rows. The
    * rank filter is `row_number <= topK` over that model-sized frame,
    * which Spark executes as WindowGroupLimit (partial top-K per
    * partition, never a global sort). */
  def trainLangProfiles(df: DataFrame, langCol: String, textCol: String,
                        topK: Int = 15): DataFrame = {
    // guard BEFORE the sequence: Spark's sequence(1, 0) steps
    // DESCENDING ([1, 0]), so an unguarded stop of length-2 would emit
    // spurious short "grams" for sub-trigram docs — rows the oracle's
    // generate_series (empty when stop < start) never produces
    val grams = df
      .select(col(langCol).as("lang"), lower(col(textCol)).as("__t"))
      .filter(length(col("__t")) >= 3)
      .select(col("lang"), explode(expr(
        """transform(sequence(1, length(__t) - 2),
          |  i -> substring(__t, i, 3))""".stripMargin)).as("gram"))
      // BMP contract: the one-pass scorer rolls over UTF-16 units, so
      // a gram containing a supplementary-plane character (emoji,
      // astral CJK) could never match at score time — and would throw
      // in TrigramTable.build, whose 48-bit keys pack three UTF-16
      // units. Training and scoring must agree on the gram universe,
      // so such grams are excluded HERE (before ranking, so topK fills
      // with scorable grams) and the SQL twin applies the same filter.
      .filter(!col("gram").rlike("[\\x{10000}-\\x{10FFFF}]"))
      .groupBy(col("lang"), col("gram")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("cnt").desc, col("gram").asc)
    grams.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= topK)
      .select(col("lang"), col("gram"),
        (lit(topK) + 1 - col("__rk")).cast("int").as("wt"), col("cnt"))
  }

  /** Cross-session form: load the published profile table for
    * `(corpusKey, version)` if it exists, else train and publish —
    * the [[graft.operators.Bpe.trainPublished]] lifecycle, kind
    * `lang_profiles`. The profile is the MODEL (≤ topK rows per
    * language), so a scoring session loads a one-file artifact and
    * never touches the labeled corpus. */
  def trainLangProfilesPublished(df: DataFrame, root: String,
                                 corpusKey: String, version: String,
                                 langCol: String, textCol: String,
                                 topK: Int = 15): DataFrame = {
    import graft.sources.ArtifactStore
    val spark = df.sparkSession
    if (ArtifactStore.exists(spark, root, "lang_profiles", corpusKey, version))
      ArtifactStore.load(spark, root, "lang_profiles", corpusKey, version)
    else {
      val p = trainLangProfiles(df, langCol, textCol, topK)
      ArtifactStore.save(p, root, "lang_profiles", corpusKey, version)
      ArtifactStore.load(spark, root, "lang_profiles", corpusKey, version)
    }
  }

  /** Language-ID scored against a TRAINED profile frame (lang, gram,
    * wt): collects the model-sized profile once, builds the
    * open-addressing table, and scores every document in the same
    * one-pass narrow projection as [[languageId]] — the table rides
    * the expression as a reference object, so 100 TB of text is still
    * touched exactly once with no join and no shuffle. Output:
    * (idCol, pred_lang, best_score); the argmax tie-break is
    * lexicographic language order (the winner of `ORDER BY score
    * DESC, lang ASC`), deterministic for any trained language set. */
  /** Collect a model-sized (lang, gram, wt) profile frame into the
    * one-pass scorer table; langs come back SORTED — the lexicographic
    * tie-break order every trained-profile consumer uses. */
  def profileTable(profiles: DataFrame):
      (Seq[String], org.apache.spark.sql.graftext.TrigramTable) = {
    val rows = profiles.select(col("lang"), col("gram"), col("wt"))
      .collect() // model-sized: ≤ topK rows per language by contract
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    val langs = rows.map(_._1).distinct.sorted.toSeq
    require(langs.nonEmpty, "empty language profile")
    (langs, org.apache.spark.sql.graftext.TrigramTable.build(langs, rows.toSeq))
  }

  /** Lexicographic-tie-break argmax over `score_<lang>` columns — the
    * winner of `ORDER BY score DESC, lang ASC`, deterministic for any
    * trained language set. */
  def lexArgmaxPred(langs: Seq[String]): Column =
    langs.foldRight(lit("und")) { case (lang, acc) =>
      val isMax = langs.filter(_ != lang).foldLeft(lit(true)) { (c, other) =>
        val cmp = if (other < lang) col(s"score_$lang") > col(s"score_$other")
        else col(s"score_$lang") >= col(s"score_$other")
        c && cmp
      }
      when(isMax, lang).otherwise(acc)
    }

  def languageIdWith(df: DataFrame, idCol: String, textCol: String,
                     profiles: DataFrame): DataFrame = {
    val (langs, table) = profileTable(profiles)
    val scored = df.select(col(idCol),
      org.apache.spark.sql.graftext.TrigramScoresWith.column(
        lower(coalesce(col(textCol), lit(""))), table).as("__sc"))
    val agg = scored.select(
      col(idCol) +: langs.zipWithIndex.map { case (lang, i) =>
        col("__sc")(i).as(s"score_$lang")
      }: _*)
    // greatest() requires ≥2 args — a single-language profile (a
    // legitimate degenerate artifact: one-language corpus) scores as
    // that language's column directly
    val best =
      if (langs.size == 1) col(s"score_${langs.head}")
      else greatest(langs.map(l => col(s"score_$l")): _*)
    agg.select(col(idCol), lexArgmaxPred(langs).as("pred_lang"),
      best.as("best_score"))
  }

  /** Oracle twin of [[trainLangProfiles]]. */
  def trainLangProfilesSql(table: String, langExpr: String,
                           textExpr: String, topK: Int = 15): String =
    s"""WITH g AS (SELECT lang, substr(t, CAST(i AS INTEGER), 3) AS gram
       |  FROM (SELECT $langExpr AS lang, lower($textExpr) AS t,
       |          unnest(generate_series(1,
       |            greatest(length(lower($textExpr)) - 2, 0))) AS i
       |        FROM $table)),
       |c AS (SELECT lang, gram, count(*) AS cnt FROM g
       |      WHERE NOT regexp_matches(gram, '[\\x{10000}-\\x{10FFFF}]')
       |      GROUP BY 1, 2),
       |r AS (SELECT lang, gram, cnt, row_number() OVER
       |        (PARTITION BY lang ORDER BY cnt DESC, gram ASC) AS rk
       |      FROM c)
       |SELECT lang, gram, CAST($topK + 1 - rk AS INTEGER) AS wt, cnt
       |FROM r WHERE rk <= $topK""".stripMargin

  /** Oracle twin of [[trainLangProfiles]] + [[languageIdWith]]
    * composed over the same table: long-form scores (zero-filled via
    * the doc × lang base) with the `ORDER BY score DESC, lang ASC`
    * winner — exactly the engine's lexicographic tie-break. */
  def languageIdWithSql(table: String, idExpr: String, langExpr: String,
                        textExpr: String, topK: Int = 15): String =
    s"""WITH prof AS (${trainLangProfilesSql(table, langExpr, textExpr, topK)}),
       |lg AS (SELECT $idExpr AS doc_id, substr(t, CAST(i AS INTEGER), 3) AS gram
       |  FROM (SELECT $idExpr, lower($textExpr) AS t,
       |          unnest(generate_series(1,
       |            greatest(length(lower($textExpr)) - 2, 0))) AS i
       |        FROM $table)),
       |hit AS (SELECT doc_id, p.lang, CAST(sum(p.wt) AS BIGINT) AS s
       |        FROM lg JOIN prof p USING (gram) GROUP BY 1, 2),
       |base AS (SELECT d.$idExpr AS doc_id, l.lang
       |         FROM $table d CROSS JOIN (SELECT DISTINCT lang FROM prof) l),
       |sc AS (SELECT b.doc_id, b.lang, coalesce(h.s, 0) AS score
       |       FROM base b LEFT JOIN hit h
       |         ON b.doc_id = h.doc_id AND b.lang = h.lang)
       |SELECT doc_id, lang AS pred_lang, score AS best_score
       |FROM (SELECT *, row_number() OVER
       |        (PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rk
       |      FROM sc)
       |WHERE rk = 1""".stripMargin

  /** The quality metrics as bare column expressions over a text
    * column — shared by [[quality]] and by compositions that want the
    * metrics INLINE on an existing frame without a join (the metrics
    * are narrow, so joining them back on id would add two shuffles
    * for columns a select can carry for free; CorpusPipeline.clean
    * uses these directly for exactly that reason). */
  def nWordsCol(t: Column): Column = size(split(t, " "))
  def qualityScoreCol(t: Column): Column = {
    val words = split(t, " ")
    round(least(size(words).cast("double") / 100.0, lit(1.0)) *
      (size(array_distinct(words)).cast("double") / size(words)), 6)
  }

  /** Quality metrics: counts, type-token ratio, a composite score.
    * Pure scalar expressions — no shuffle at all. */
  def quality(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val words = split(t, " ")
    df.select(
      col(idCol),
      length(t).as("n_chars"),
      nWordsCol(t).as("n_words"),
      size(array_distinct(words)).as("n_distinct_words"),
      round(size(array_distinct(words)).cast("double") / size(words), 6).as("ttr"),
      round(length(regexp_replace(t, " ", "")).cast("double") / size(words), 6)
        .as("avg_word_len"),
      qualityScoreCol(t).as("quality_score"))
  }

  /** Gopher-style quality RULE FLAGS (Rae et al., "Scaling Language
    * Models: ... Gopher", arXiv:2112.11446, §A1.1 quality filtering —
    * the published rule set most corpus pipelines cite): per document,
    * one boolean per rule plus the conjunction verdict, so a filter
    * sweep can report WHICH rule fired (the flags are the audit trail;
    * [[quality]]'s composite score is the rankable scalar — different
    * jobs). Rules, with thresholds as parameters:
    *
    *  - `ok_n_words`:      minWords ≤ word count ≤ maxWords
    *  - `ok_word_len`:     minMeanLen ≤ mean word length ≤ maxMeanLen
    *  - `ok_alpha`:        fraction of words containing ≥1 ASCII
    *                       letter ≥ minAlphaFrac
    *  - `ok_symbols`:      ("#" + "…"/"...") per word ≤ maxSymbolRatio
    *  - `ok_stopwords`:    ≥ minStopHits occurrences from a small
    *                       English stopword list (the "has real
    *                       sentences" proxy)
    *
    * Pure per-row scalar expressions — ZERO exchanges at any corpus
    * size; composes in front of the corpus-wide passes like
    * [[quality]]. Counting uses split-length arithmetic
    * (`size(split(text, pat)) - 1` = occurrence count), identical in
    * the DuckDB oracle via `len(string_split(...)) - 1`. Stopword
    * matches are space-delimited and NON-overlapping, so adjacent
    * repeats sharing one separator ("the the the") count ceil(n/2) —
    * a deterministic proxy, bit-identical in both engines. */
  val gopherStopwords = Seq("the", "be", "to", "of", "and", "that",
    "have", "with")
  def gopherQualityFlags(df: DataFrame, idCol: String, textCol: String,
                         minWords: Int = 50, maxWords: Int = 100000,
                         minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                         minAlphaFrac: Double = 0.8,
                         maxSymbolRatio: Double = 0.1,
                         minStopHits: Int = 2): DataFrame = {
    val t = col(textCol)
    val words = split(t, " ")
    val nWords = size(words)
    val meanLen = length(regexp_replace(t, " ", "")).cast("double") / nWords
    val alphaFrac = size(filter(words, wd => wd.rlike("[A-Za-z]")))
      .cast("double") / nWords
    val symbols = (size(split(t, "#", -1)) - 1) +
      (size(split(t, "\\.\\.\\.", -1)) - 1) + (size(split(t, "…", -1)) - 1)
    val stopHits = gopherStopwords.map(sw =>
      size(split(concat(lit(" "), t, lit(" ")), " " + sw + " ", -1)) - 1)
      .reduce(_ + _)
    df.select(
      col(idCol),
      nWords.as("n_words"),
      round(meanLen, 6).as("mean_word_len"),
      round(alphaFrac, 6).as("alpha_word_frac"),
      symbols.as("n_symbols"),
      stopHits.as("stopword_hits"),
      (nWords >= minWords && nWords <= maxWords).as("ok_n_words"),
      (meanLen >= minMeanLen && meanLen <= maxMeanLen).as("ok_word_len"),
      (alphaFrac >= minAlphaFrac).as("ok_alpha"),
      (symbols.cast("double") / nWords <= maxSymbolRatio).as("ok_symbols"),
      (stopHits >= minStopHits).as("ok_stopwords"))
      .withColumn("keep",
        col("ok_n_words") && col("ok_word_len") && col("ok_alpha") &&
          col("ok_symbols") && col("ok_stopwords"))
  }

  /** Token counts: whitespace tokens and a BPE-ish regex tokenizer
    * (letter runs | digit runs | single non-alnum). */
  val tokenRegex = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  def tokenStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      size(split(col(textCol), " ")).as("ws_tokens"),
      size(regexp_extract_all(col(textCol), lit(tokenRegex), lit(0))).as("re_tokens"))

  /** PII scrubbing for training corpora: emails then long digit runs
    * (phone/account-number shaped) replaced by typed placeholders.
    * Pure regexp_replace scalar chain — codegen'd, no shuffle, and the
    * patterns avoid backreferences/lookaround so they run identically
    * on RE2-based engines (the oracle) and Java regex (Spark). */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val numberPattern = "[0-9]{4,}"
  def redactPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val scrubbed = regexp_replace(
      regexp_replace(col(textCol), emailPattern, "<EMAIL>"),
      numberPattern, "<NUM>")
    df.select(
      col(idCol),
      scrubbed.as("clean_text"),
      (length(col(textCol)) - length(scrubbed)).as("n_chars_removed"))
  }

  /** Context-window chunking: split each document into overlapping
    * fixed-token-budget chunks (stride = maxTokens - overlap), the
    * shape LLM pretraining data takes before packing. One generator
    * expression + posexplode — rows fan out per chunk but the text is
    * sliced from the one parsed array, no shuffle, no re-tokenizing
    * per chunk. The final chunk keeps the tail (may be short); docs
    * within budget yield exactly one chunk. */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    maxTokens: Int, stride: Int): DataFrame = {
    require(stride > 0 && stride <= maxTokens, "need 0 < stride <= maxTokens")
    val chunks = expr(
      s"""transform(
         |  sequence(0, greatest(CAST(ceil((size(ws) - $maxTokens) / CAST($stride AS DOUBLE)) AS INT), 0)),
         |  i -> concat_ws(' ', slice(ws, i * $stride + 1, $maxTokens)))""".stripMargin)
    df.select(col(idCol), split(col(textCol), " ").as("ws"))
      .select(col(idCol), posexplode(chunks).as(Seq("chunk_idx", "chunk_text")))
      .withColumn("n_tokens", size(split(col("chunk_text"), " ")))
  }

  /** Sequence packing: assign chunk rows to fixed-token-budget packs —
    * the step pretraining data takes after [[chunkByTokens]].
    *
    * A strictly-capped global packing is inherently sequential; the
    * scale-correct form is shard-parallel contiguous fill: rows shard
    * by a portable content hash of the document id (so packing is
    * embarrassingly parallel and reproducible on any partitioning),
    * and within a shard each row's pack is `floor(startOffset /
    * budget)` of the running token count in (doc, chunk) order. One
    * shuffle on the shard key, no global sort; each shard wastes at
    * most one partial pack, and a pack may overrun the budget by at
    * most one chunk's tokens (contiguous fill does not split rows). */
  def packSequences(chunks: DataFrame, docCol: String, idxCol: String,
                    tokenCol: String, budget: Int, shards: Int,
                    salt: String = ""): DataFrame = {
    val shard = pmod(PortableHash.hash60(
      concat(col(docCol).cast("string"), lit(salt))), lit(shards))
    val w = Window.partitionBy(col("pack_shard"))
      .orderBy(col(docCol).asc, col(idxCol).asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    chunks
      .withColumn("pack_shard", shard.cast("int"))
      .withColumn("cum_tokens", sum(col(tokenCol)).over(w))
      .withColumn("pack_id", floor(
        (col("cum_tokens") - col(tokenCol)) /
          lit(budget).cast("double")).cast("int"))
  }

  /** TF-IDF per (document, term): one explode, a (doc, term) count, a
    * term document-frequency aggregate, and the corpus size as a
    * broadcast 1-row aggregate (never a driver-side collect). The
    * score joins back on the term — a 1:N equi-join on the
    * term-partitioned counts, the standard inverted-index shuffle
    * topology; hub terms (stopwords) fan out rows but never keys, so
    * no skew-salting is needed. */
  def tfidf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tokens = df.select(col(idCol),
      explode(split(col(textCol), " ")).as("term"))
    val tf = tokens.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df_t"))
    val nDocs = df.agg(countDistinct(col(idCol)).as("n_docs"))
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .select(col(idCol), col("term"), col("tf"),
        round(col("tf") * log(col("n_docs").cast("double") / col("df_t")), 6)
          .as("tfidf"))
  }

  /** BM25 relevance scores for a literal term query (Robertson/Zaragoza;
    * the Lucene `ln(1 + (N - df + 0.5)/(df + 0.5))` IDF form, which is
    * non-negative for any df): the ranked-retrieval scorer a corpus
    * pipeline runs for data selection — "docs most relevant to this
    * probe query" — and the quality twin of [[tfidf]].
    *
    * Only rows whose term is IN the query survive the first filter, so
    * the explode is pruned at the scan and the per-(doc, term) shuffle
    * carries query-matching tokens only — cost scales with term
    * selectivity, not vocabulary. Corpus stats (N, avgdl) ride one
    * broadcast 1-row aggregate; `avgdl` divides an exact integral sum,
    * so it is bit-identical cross-engine, and the final per-doc score
    * sums ≤ |terms| doubles before the 6-decimal round that makes the
    * output oracle-stable.
    */
  def bm25(df: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2,
           b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "query must have at least one term")
    val terms = queryTerms.distinct
    val toks = df.select(col(idCol),
        size(split(col(textCol), " ")).as("__dl"),
        explode(split(col(textCol), " ")).as("term"))
      .filter(col("term").isin(terms: _*))
    val tf = toks.groupBy(col(idCol), col("__dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df_t"))
    val stats = df.agg(count(lit(1)).as("n_docs"),
      avg(size(split(col(textCol), " "))).as("avgdl"))
    tf.join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col(idCol),
        (log(lit(1.0) +
            (col("n_docs") - col("df_t") + lit(0.5)) / (col("df_t") + lit(0.5))) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("__dl") / col("avgdl"))))
          .as("__s"))
      .groupBy(col(idCol))
      .agg(round(sum(col("__s")), 6).as("bm25"))
  }

  /** Repetition-quality signals (the Gopher-rules family adapted to
    * whitespace corpora): duplicate-word fraction, duplicate-bigram
    * fraction, and the frequency share of the single most repeated
    * word. High values mark boilerplate/spam documents that LLM
    * corpus filters drop before training.
    *
    * All three are per-row array expressions over one split — no
    * explode, no shuffle, codegen'd end to end. The bigram build uses
    * an indexed `transform` over a length-guarded slice (never a
    * descending `sequence`), and denominators clamp at 1 so one-word
    * docs yield 0, not NULL, on every engine. The top-word count is
    * the longest equal-run over the SORTED word array — one
    * O(len·log len) sort + one linear aggregate pass per row, instead
    * of counting every distinct word against the full array
    * (O(distinct·len), quadratic on exactly the long web documents
    * this filter exists to score).
    */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val prep = df.select(col(idCol), split(col(textCol), " ").as("ws"))
      .withColumn("bg", expr(
        """transform(slice(ws, 1, greatest(size(ws) - 1, 0)),
          |  (w, i) -> concat(w, ' ', element_at(ws, i + 2)))""".stripMargin))
    def dupFrac(arr: Column): Column =
      round((size(arr) - size(array_distinct(arr))).cast("double") /
        greatest(size(arr), lit(1)), 6)
    prep.select(
      col(idCol),
      dupFrac(col("ws")).as("dup_word_frac"),
      dupFrac(col("bg")).as("dup_bigram_frac"),
      round(expr(
        """aggregate(array_sort(ws),
          |  named_struct('prev', CAST(NULL AS STRING), 'run', 0, 'best', 0),
          |  (s, w) -> named_struct(
          |    'prev', w,
          |    'run',  CASE WHEN s.prev IS NOT NULL AND w = s.prev
          |                 THEN s.run + 1 ELSE 1 END,
          |    'best', greatest(s.best,
          |      CASE WHEN s.prev IS NOT NULL AND w = s.prev
          |           THEN s.run + 1 ELSE 1 END)),
          |  s -> s.best)""".stripMargin).cast("double") /
        greatest(size(col("ws")), lit(1)), 6).as("top_word_frac"))
  }

  /** Corpus-wide n-gram counts with a minimum-frequency floor — the LM
    * corpus statistic behind contamination checks and tokenizer
    * training. One indexed-transform n-gram build per row (no
    * re-split per gram), one explode, one hash aggregate with map-side
    * combine; the frequency floor keeps the result bounded while the
    * full count table stays distributed. At 100 TB the only shuffle
    * carries (gram, partial count) pairs.
    */
  def ngramCounts(df: DataFrame, textCol: String, n: Int,
                  minCount: Long): DataFrame = {
    require(n >= 1, "n >= 1")
    val grams = expr(
      s"""transform(slice(ws, 1, greatest(size(ws) - ${n - 1}, 0)),
         |  (w, i) -> concat_ws(' ', slice(ws, i + 1, $n)))""".stripMargin)
    df.select(split(col(textCol), " ").as("ws"))
      .select(explode(grams).as("ngram"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }

  /** N-gram language-model quality score — the CCNet-style perplexity
    * proxy an LLM corpus filter runs when a neural LM is too expensive
    * for a first pass: score each document by the average
    * log-probability of its bigrams under the corpus's OWN bigram
    * model, `P(w2|w1) = C(w1 w2) / C(w1 ·)` (counts over the same
    * corpus, so every observed bigram has positive probability — no
    * smoothing constant to tune). Repetitive/boilerplate text scores
    * high, natural text sits in a band, gibberish scores low; filters
    * cut both tails.
    *
    * Topology (round 9 — the 33×-at-100× inverted-index rewrite): the
    * per-INSTANCE bigram frame crosses the wire exactly once, into a
    * `(doc, bigram) → multiplicity` aggregate; every other frame
    * derives from that compact table by re-aggregation (bigram vocab
    * counts `c2` = Σ multiplicity over docs; per-doc prefix counts
    * and prefix vocab counts `c1` likewise, the prefix recovered from
    * the bigram string — words are space-split, so
    * `substring_index(bg, ' ', 1)` is exact). The round-8 shape
    * cached the instance frame and probed it through BOTH count
    * joins, so the largest intermediate crossed the wire three times
    * — that was the whole 33×. The score uses the log-sum identity
    * `avg ln(c2/c1) = (Σ m·ln c2 − Σ m_w·ln c1) / n`, exact in ℝ and
    * within ~1e-12 in doubles. The ORACLE replays this same two-sum
    * identity (round-10; it previously kept the per-instance
    * `avg(log)` form, and a score landing within ~1e-12 of a 0.5e-6
    * rounding boundary could flip the 6th decimal between engines —
    * a cross-engine flake whose probability grows with corpus size).
    * With both engines sharing the identity, only
    * summation-association noise (~1e-15) remains under the family's
    * 6-dp rounding firewall.
    * No cache: the aggregate has a single producer and its consumers
    * are derived frames, so nothing escapes the plan.
    *
    * Docs with fewer than two words have no bigrams and are absent
    * from the result (nothing to score).
    */
  def ngramLmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val b1 = df.select(col(idCol), split(col(textCol), " ").as("ws"))
      .select(col(idCol), explode(expr(
        """transform(slice(ws, 1, greatest(size(ws) - 1, 0)),
          |  (w, i) -> concat(w, ' ', element_at(ws, i + 2)))""".stripMargin))
        .as("bg"))
      .groupBy(col(idCol), col("bg")).agg(count(lit(1)).as("m"))
    val cb = b1.groupBy(col("bg")).agg(sum(col("m")).as("c2"))
    val w1d = b1.select(col(idCol),
        substring_index(col("bg"), " ", 1).as("w1"), col("m"))
      .groupBy(col(idCol), col("w1")).agg(sum(col("m")).as("mw"))
    val cu = w1d.groupBy(col("w1")).agg(sum(col("mw")).as("c1"))
    val s2 = b1.join(cb, Seq("bg"))
      .groupBy(col(idCol))
      .agg(sum(col("m")).as("n_bigrams"),
        sum(col("m").cast("double") * log(col("c2").cast("double"))).as("__s2"))
    val s1 = w1d.join(cu, Seq("w1"))
      .groupBy(col(idCol))
      .agg(sum(col("mw").cast("double") * log(col("c1").cast("double"))).as("__s1"))
    s2.join(s1, Seq(idCol))
      .select(col(idCol), col("n_bigrams"),
        round((col("__s2") - col("__s1")) / col("n_bigrams"), 6).as("lm_score"))
  }

  /** Per-source corpus statistics — the "dataset card" numbers an LLM
    * pipeline publishes with every corpus release: document count,
    * total/median/p90 word lengths, and the Shannon entropy of the
    * language distribution within each source (a low-entropy source is
    * monolingual; a suspiciously high one is likely mislabeled).
    *
    * Two tiny aggregations over one narrow projection: word stats per
    * source, then language counts per (source, lang) folded to entropy
    * with the algebraic identity H = ln T − Σ n·ln n / T — so both
    * shuffles carry counts, never text. The exact `percentile` holds
    * one source's lengths in memory; at 100 TB swap in
    * `approx_percentile` (same query shape — see q68's tolerance
    * pattern). */
  def corpusStats(df: DataFrame, sourceCol: String, textCol: String,
                  langCol: String): DataFrame = {
    val words = df.select(col(sourceCol).as("source"), col(langCol).as("lang"),
      size(split(col(textCol), " ")).as("n_words"))
    val wordStats = words.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_words")).as("total_words"),
      round(expr("percentile(n_words, 0.5)"), 4).as("p50_words"),
      round(expr("percentile(n_words, 0.9)"), 4).as("p90_words"))
    val langCounts = words.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n"))
    val entropy = langCounts.groupBy(col("source")).agg(
      round(log(sum(col("n")).cast("double")) -
        sum(col("n").cast("double") * log(col("n").cast("double"))) /
          sum(col("n")).cast("double"), 6).as("lang_entropy"))
    wordStats.join(entropy, Seq("source"))
  }

  /** Document fingerprints: whole-doc md5 plus a winnowing-style
    * min-hash over character 8-grams (rolling-hash family). The 8-gram
    * scan is a per-row array expression — no explode, no shuffle. */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = textCol
    df.select(
      col(idCol),
      md5(col(t)).as("fp_md5"),
      expr(
        s"""array_min(transform(sequence(1, greatest(length($t) - 7, 1)),
           |  i -> CAST(conv(substr(md5(substr($t, i, 8)), 1, 15), 16, 10) AS BIGINT)))""".stripMargin)
        .as("fp_min_8gram"))
  }

  /** Corpus-wide heavy hitters (tokens with frequency > `support` of
    * all token occurrences) via the production two-pass pattern:
    * sketch-PRUNE then exact-VERIFY.
    *
    * Pass 1 uses Spark's `stat.freqItems` (the Karp/Misra-Gries
    * streaming summary): its result is guaranteed to be a SUPERSET of
    * every token above the support threshold, with at most 1/support
    * candidates — driver-side state is O(1/support), never
    * vocabulary-sized. Pass 2 counts ONLY the candidates exactly (a
    * broadcast IN-list of ≤ 1/support literals reaches the scan as a
    * pushed filter) and keeps those strictly above the threshold, so
    * the OUTPUT IS EXACT — the sketch only decides what gets counted,
    * never what gets reported. At 100 TB this is the difference
    * between shuffling a vocabulary-sized aggregation and shuffling
    * counts for ≤ 1/support tokens; the false-positive candidates cost
    * one exact count each and are filtered by the verify pass. */
  def heavyHitters(df: DataFrame, textCol: String,
                   support: Double): DataFrame = {
    val tokens = df.select(explode(split(col(textCol), " ")).as("token"))
    // the corpus-wide token total rides the SKETCH pass as an observe()
    // metric (Observation blocks until the action delivers it), so the
    // operator tokenizes the corpus exactly twice — sketch pass here,
    // exact verify pass in the returned plan — instead of a third
    // full count() scan; materializing the exploded corpus to share it
    // would cost more than the scan it saves
    val obs = org.apache.spark.sql.Observation()
    val candidates = tokens.observe(obs, count(lit(1)).as("total"))
      .stat.freqItems(Seq("token"), support)
      .head.getSeq[String](0)
    val total = obs.get("total").asInstanceOf[Long]
    tokens.filter(col("token").isin(candidates: _*))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > lit(support * total))
  }

  /** Frequency-ranked vocabulary build — the token→id mapping step of
    * tokenizer construction: count every word across the corpus, keep
    * those with at least `minCount` occurrences, and assign contiguous
    * ids in (count desc, word asc) order, so id 0 is the most frequent
    * token and the ordering is total (the word tiebreak makes the
    * mapping deterministic on any engine or partitioning).
    *
    * Scale shape: the corpus-sized work is ONE map-side-combined count
    * aggregate. The ranking window then runs over the VOCABULARY,
    * which is orders of magnitude smaller than the corpus and further
    * cut by `minCount` (Zipf: the tail is hapax legomena) — the same
    * bounded-small-result contract as [[heavyHitters]]' candidate set;
    * a 100 TB corpus has a vocabulary that fits one partition with
    * room to spare, which is exactly what the unpartitioned window
    * assumes and why it is acceptable HERE and nowhere else.
    */
  def buildVocab(df: DataFrame, textCol: String,
                 minCount: Long = 1L): DataFrame = {
    val counts = df.select(explode(split(col(textCol), " ")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
    counts.withColumn("token_id",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("cnt").desc, col("token").asc)) - 1)
  }

  /** Cross-session form of [[buildVocab]]: load the published
    * `(corpusKey, version)` vocabulary if it exists, else build and
    * publish. The vocab is model-sized (Zipf tail cut by `minCount`),
    * so a consumer session loads one file and skips the corpus scan
    * ([[graft.operators.Similarity.cellsPublished]] lifecycle). */
  def vocabPublished(df: DataFrame, root: String, corpusKey: String,
                     version: String, textCol: String,
                     minCount: Long = 1L): DataFrame = {
    import graft.sources.ArtifactStore
    val spark = df.sparkSession
    if (ArtifactStore.exists(spark, root, "vocab", corpusKey, version))
      ArtifactStore.load(spark, root, "vocab", corpusKey, version)
    else {
      val v = buildVocab(df, textCol, minCount)
      ArtifactStore.save(v, root, "vocab", corpusKey, version)
      ArtifactStore.load(spark, root, "vocab", corpusKey, version)
    }
  }

  /** C4-style boilerplate removal: a segment (fixed window of
    * `windowWords` words — the stand-in for a "line" in a corpus whose
    * documents carry no newlines) that occurs in at least `minDocs`
    * DISTINCT documents is boilerplate (nav bars, cookie banners,
    * license footers) and is stripped from EVERY document; surviving
    * segments are rejoined in original order. Distinct from
    * [[Dedup.segmentDedup]], which keeps the first occurrence of a
    * duplicated segment — boilerplate keeps none.
    *
    * Documents whose every segment is boilerplate disappear from the
    * output (C4 drops them too — nothing is left to keep).
    *
    * Scale shape: the document-frequency aggregate groups on the
    * segment DIGEST (16 bytes), never the segment text; the resulting
    * boilerplate set is, by construction, only segments repeated across
    * ≥ minDocs docs — a tiny fraction of distinct segments — so it
    * broadcasts, and the removal is a broadcast anti join at scan
    * throughput. No pairwise stage anywhere; both shuffles are linear
    * in corpus tokens.
    */
  def stripBoilerplate(df: DataFrame, idCol: String, textCol: String,
                       windowWords: Int = 10, minDocs: Int = 3): DataFrame = {
    val words = split(col(textCol), " ")
    val nWin = ceil(size(words) / lit(windowWords.toDouble)).cast("int")
    val segs = df.select(col(idCol), nWin.as("n_segments"),
        posexplode(transform(sequence(lit(0), nWin - 1), i =>
          concat_ws(" ", slice(words, i * windowWords + 1, lit(windowWords))))))
      .toDF(idCol, "n_segments", "pos", "seg")
      .withColumn("__dig", md5(col("seg")))
    val boiler = segs.groupBy(col("__dig"))
      .agg(count_distinct(col(idCol)).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("__dig"))
    segs.join(broadcast(boiler), Seq("__dig"), "left_anti")
      .groupBy(col(idCol))
      .agg(
        concat_ws(" ", transform(
          sort_array(collect_list(struct(col("pos"), col("seg")))),
          s => s.getField("seg"))).as("clean_text"),
        count(lit(1)).as("n_kept"),
        (max(col("n_segments")) - count(lit(1))).as("n_removed"))
  }
}
