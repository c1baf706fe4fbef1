package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent store for TRAINED MODEL ARTIFACTS — the k-means coarse
  * quantizer ([[graft.operators.Similarity.cellsOf]]), PQ codebooks +
  * code tables ([[graft.operators.Similarity.pqOf]]), BPE merge
  * tables ([[graft.operators.Bpe.train]]), vocabularies
  * ([[graft.operators.TextAnalysis.buildVocab]]) — as versioned
  * partitioned parquet tables.
  *
  * The session-scoped memos (`cellsMemo`/`pqMemo`) model "train once
  * per corpus snapshot, probe many times" WITHIN one application; at
  * 100 TB you train once and probe for months across sessions, so the
  * artifact must outlive the JVM. This store is that lifecycle rung:
  * one parquet table per artifact KIND, partitioned by
  * `(corpus_key, version)`, so
  *  - every load prunes to one partition pair (the plan shows
  *    `PartitionFilters`, zero data files of other snapshots touched);
  *  - re-publishing one snapshot is a DYNAMIC partition overwrite —
  *    other corpora/versions are untouched (the same
  *    `insertInto`-discipline as the alert history table, applied via
  *    the writer's `partitionOverwriteMode=dynamic` option so it
  *    holds regardless of session conf);
  *  - an artifact table is append-only in versions: publish `v2`,
  *    flip consumers, keep `v1` for rollback — the
  *    snapshot-versioning contract the memo's `corpusKey` CALLER
  *    CONTRACT documents, now durable.
  *
  * Scale shape: model-sized artifacts (codebooks, merges, vocab)
  * write as one file; corpus-sized ones (cell/code assignments — one
  * row per vector) take `numFiles` so the write parallelizes and the
  * read gets splittable parquet. Nothing here is driver-materialized.
  */
object ArtifactStore {

  /** The `corpus_key` partition value may be a path or URI; Spark's
    * partition writer escapes it, but a stable, readable key beats an
    * escaped path in the table layout. Callers may pass anything —
    * this normalizes to `[A-Za-z0-9._-]` with md5 disambiguation so
    * distinct raw keys can never collide after sanitization. */
  def normKey(raw: String): String = {
    val safe = raw.replaceAll("[^A-Za-z0-9._-]+", "_")
      .replaceAll("^_+|_+$", "").takeRight(48)
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest(raw.getBytes("UTF-8")).take(4)
      .map("%02x".format(_)).mkString
    if (safe.isEmpty) dig else s"${safe}_$dig"
  }

  private def kindPath(root: String, kind: String): String = {
    require(kind.matches("[A-Za-z0-9_]+"), s"bad artifact kind: $kind")
    s"$root/$kind"
  }

  /** Publish `df` as artifact `(kind, corpusKey, version)` under the
    * store `root`. Dynamic partition overwrite: exactly the
    * `(corpus_key, version)` partitions present in `df` (here: one)
    * are replaced; every other snapshot in the table is untouched.
    * Idempotent — re-publishing the same snapshot replaces it. */
  def save(df: DataFrame, root: String, kind: String, corpusKey: String,
           version: String, numFiles: Int = 1): Unit = {
    require(numFiles >= 1)
    require(!df.columns.contains("corpus_key") && !df.columns.contains("version"),
      "artifact frame must not already carry the partition columns")
    df.repartition(numFiles)
      .withColumn("corpus_key", lit(normKey(corpusKey)))
      .withColumn("version", lit(version))
      .write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy("corpus_key", "version")
      .parquet(kindPath(root, kind))
  }

  /** Load one artifact snapshot. Partition pruning does the work: the
    * scan's `PartitionFilters` pin `(corpus_key, version)`, so only
    * that snapshot's files are listed and read. Returns the artifact
    * in its as-trained schema (partition columns dropped). */
  def load(spark: SparkSession, root: String, kind: String,
           corpusKey: String, version: String): DataFrame =
    spark.read.parquet(kindPath(root, kind))
      .filter(col("corpus_key") === normKey(corpusKey) &&
        col("version") === version)
      .drop("corpus_key", "version")

  /** All published `(corpus_key, version)` pairs of a kind — reads
    * partition METADATA only (distinct over partition columns prunes
    * to a file listing, no data rows). */
  def versions(spark: SparkSession, root: String, kind: String): DataFrame =
    spark.read.parquet(kindPath(root, kind))
      .select(col("corpus_key"), col("version")).distinct()

  /** Latest version string for a corpus under LEXICOGRAPHIC order —
    * callers version like table snapshots ("v0007", "2026-08-15", a
    * zero-padded commit ordinal), which makes lexicographic = temporal. */
  def latest(spark: SparkSession, root: String, kind: String,
             corpusKey: String): Option[String] = {
    val k = normKey(corpusKey)
    val rows = versions(spark, root, kind)
      .filter(col("corpus_key") === k)
      .agg(max(col("version"))).collect()
    rows.headOption.flatMap(r => Option(r.getString(0)))
  }

  /** True iff the snapshot exists (file-listing only). */
  def exists(spark: SparkSession, root: String, kind: String,
             corpusKey: String, version: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(kindPath(root, kind))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && !load(spark, root, kind, corpusKey, version).isEmpty
  }

  /** Register the kind's table in the session catalog as an external
    * partitioned parquet table and recover its partitions, so SQL
    * consumers (`SELECT ... FROM db.kind WHERE corpus_key=... AND
    * version=...`) get the same pruned scan the path API gets. */
  def registerTable(spark: SparkSession, root: String, kind: String,
                    db: String): Unit = {
    // no explicit column list → partitioning is INFERRED from the
    // (corpus_key=…/version=…) directory layout (Spark rejects an
    // explicit PARTITIONED BY without one); RECOVER picks up
    // partitions published after creation
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS $db.$kind
         |USING parquet
         |LOCATION '${kindPath(root, kind)}'""".stripMargin)
    spark.sql(s"ALTER TABLE $db.$kind RECOVER PARTITIONS")
  }
}
