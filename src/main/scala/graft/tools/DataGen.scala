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
  * Usage: runMain graft.tools.DataGen <srcSfDir> <outDir> <copies>
  */
object DataGen {
  def main(args: Array[String]): Unit = {
    val src = args(0); val out = args(1); val copies = args(2).toInt
    require(copies >= 1, "copies must be >= 1")
    val spark = graft.core.GraftSession.build("graft-datagen",
      graft.core.GraftSession.envCores)
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
    spark.stop()
    sys.exit(0)
  }
}
