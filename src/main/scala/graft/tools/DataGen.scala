package graft.tools

import org.apache.spark.sql.functions._

/** Scale-up generator for the `documents` table: builds an N-times
  * corpus from an existing scale factor by stacking N
  * structure-preserving copies.
  *
  * Why copies and not fresh synthesis: the driver's generator
  * (TESTDATA.md, seed=42) is not available in this repo, and the
  * scaling measurement needs the LARGER corpus to have the SAME
  * duplicate-cluster shape as the base one — same cluster size
  * distribution, same diameter — so that super-linear growth in
  * wall-time can only come from the engine, never from the data
  * getting structurally harder. Copying preserves the shape exactly:
  *
  *  - `doc_id` is shifted by `copy * 1e6` (far above any real id), so
  *    ids stay unique and per-copy id order matches the base corpus.
  *  - every WORD of copies 1..N-1 gets a per-copy suffix (`_c3`), so
  *    the word/shingle sets of different copies are DISJOINT — MinHash
  *    Jaccard across copies is 0 and LSH can never band two copies
  *    into one bucket. Each copy reproduces the base corpus's dup
  *    clusters privately; a 10x corpus has exactly 10x the clusters
  *    at the same size/diameter. (Merely salting the whole doc with
  *    one token would leave cross-copy Jaccard ≈ |S|/(|S|+1) and
  *    near-MERGE all copies of a doc into one giant cluster — the
  *    opposite of structure-preserving.)
  *  - `lang`/`source` carry over; `n_chars` is recomputed from the
  *    rewritten text.
  *
  * The optional 4th arg picks the tables ("documents", "events", or a
  * comma list; default documents). The `events` scale-up follows the
  * same structure-preserving rule for STREAMING state: copy c shifts
  * `event_id` and `user_id` by a stride that clears the base ranges,
  * and keeps `ts` UNTOUCHED — so the event-time axis (window count,
  * watermark frontier, session gap structure) is identical at every
  * scale and only the KEY cardinality grows N×. Super-linear growth in
  * a streaming drain can then only come from state-store behavior,
  * never from the data getting temporally harder.
  *
  * Usage: runMain graft.tools.DataGen <srcSfDir> <outDir> <copies> [tables]
  */
object DataGen {
  def main(args: Array[String]): Unit = {
    val src = args(0); val out = args(1); val copies = args(2).toInt
    require(copies >= 1, "copies must be >= 1")
    val tables: Seq[String] =
      (if (args.length > 3) args(3) else "documents").split(",").toSeq
    val spark = graft.core.GraftSession.build("graft-datagen",
      graft.core.GraftSession.envCores)
    if (tables.contains("documents")) scaleDocuments(spark, src, out, copies)
    if (tables.contains("events")) scaleEvents(spark, src, out, copies)
    spark.stop()
    sys.exit(0)
  }

  private def scaleEvents(spark: org.apache.spark.sql.SparkSession,
                          src: String, out: String, copies: Int): Unit = {
    val base = graft.core.Tables.load(spark, src, "events")
    val stats = base.agg(count(lit(1)), max(col("event_id")), max(col("user_id"))).first()
    val baseCount = stats.getLong(0)
    val idStride = math.max(1000000L, stats.getLong(1) + 1)
    val userStride = math.max(1000000L, stats.getLong(2) + 1)
    val all = (0 until copies).map { c =>
      if (c == 0) base
      else base.select(
        (col("event_id") + lit(c * idStride)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(c * userStride)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ union _)
    val nFiles = math.max(4, (copies * baseCount / 200000L).toInt + 1)
    all.repartition(nFiles)
      .write.mode("overwrite")
      .parquet(new java.io.File(out, "events.parquet").getAbsolutePath)
    val n = spark.read.parquet(
      new java.io.File(out, "events.parquet").getAbsolutePath).count()
    // the broadcast dimension stays base-sized on purpose: at 100 TB
    // the fact stream grows, the dimension doesn't — stream-static
    // enrichment must be measured against a FIXED dim
    graft.core.Tables.load(spark, src, "customer")
      .write.mode("overwrite")
      .parquet(new java.io.File(out, "customer.parquet").getAbsolutePath)
    println(s"DATAGEN wrote $n events ($copies copies) to $out")
  }

  private def scaleDocuments(spark: org.apache.spark.sql.SparkSession,
                             src: String, out: String, copies: Int): Unit = {
    val base = graft.core.Tables.load(spark, src, "documents")
    val baseStats = base.agg(count(lit(1)), max(col("doc_id"))).first()
    val baseCount = baseStats.getLong(0)
    val maxId = baseStats.getLong(1)
    // stride must clear every base id or copies would collide and
    // silently break the structure-preservation guarantee
    val stride = math.max(1000000L, maxId + 1)
    val all = (0 until copies).map { c =>
      if (c == 0) base
      else base.select(
        (col("doc_id") + lit(c * stride)).as("doc_id"),
        array_join(transform(split(col("text"), " "),
          w => concat(w, lit(s"_c$c"))), " ").as("text"),
        col("lang"), col("source"),
        lit(0L).as("n_chars") // placeholder, recomputed below
      ).withColumn("n_chars", length(col("text")).cast("long"))
        .select("doc_id", "text", "lang", "source", "n_chars")
    }.reduce(_ union _)
    // one output file per ~50k docs (from the OBSERVED base count, not
    // an assumed one) keeps scan parallelism reasonable at every
    // generated size without thousands of tiny files
    val nFiles = math.max(4, (copies * baseCount / 50000L).toInt + 1)
    all.repartition(nFiles)
      .write.mode("overwrite")
      .parquet(new java.io.File(out, "documents.parquet").getAbsolutePath)
    val n = spark.read.parquet(
      new java.io.File(out, "documents.parquet").getAbsolutePath).count()
    println(s"DATAGEN wrote $n docs ($copies copies) to $out")
  }
}
