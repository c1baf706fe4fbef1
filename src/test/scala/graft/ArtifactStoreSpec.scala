package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.ArtifactStore
import graft.operators.{Bpe, Similarity, TextAnalysis}

/** The trained-artifact lifecycle: publish → pruned load → probe
  * equality with the in-session memo, dynamic-overwrite isolation
  * between snapshots, and the store-backed convenience wrappers on
  * each trained operator. */
class ArtifactStoreSpec extends SparkTestBase {

  private def freshRoot(): String = {
    val p = java.nio.file.Files.createTempDirectory("graft_artifact_spec")
    p.toFile.deleteOnExit()
    p.toString
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def embs: DataFrame =
    graft.core.Tables.load(spark, sfDir, "embeddings")

  test("kmeans cells roundtrip: loaded snapshot is frame-equal to the memo artifact") {
    val root = freshRoot()
    val cells = Similarity.cellsOf(embs, sfDir, "vec_id", "embedding", 8, 3)
    ArtifactStore.save(cells, root, "kmeans_cells", sfDir, "v0001")
    val loaded = ArtifactStore.load(spark, root, "kmeans_cells", sfDir, "v0001")
    assert(loaded.schema == cells.schema, "as-trained schema preserved")
    assert(sortedRows(loaded) == sortedRows(cells))
  }

  test("probe-from-loaded equals probe-from-memo (the q158 contract, frame-level)") {
    val root = freshRoot()
    val e = embs
    val cells = Similarity.cellsOf(e, sfDir, "vec_id", "embedding", 8, 3)
    ArtifactStore.save(cells, root, "kmeans_cells", sfDir, "v0001")
    val loaded = ArtifactStore.load(spark, root, "kmeans_cells", sfDir, "v0001")
    val fromMemo = Similarity.ivfTopK(e.join(cells, Seq("vec_id")),
      "vec_id", "embedding", "cell", col("vec_id") < 10, 5, 2)
    val fromStore = Similarity.ivfTopK(e.join(loaded, Seq("vec_id")),
      "vec_id", "embedding", "cell", col("vec_id") < 10, 5, 2)
    assert(sortedRows(fromStore) == sortedRows(fromMemo))
  }

  test("load prunes partitions: only the requested snapshot's files are scanned") {
    val root = freshRoot()
    val a = spark.range(10).select(col("id"), lit(1L).as("cell"))
    val b = spark.range(20).select(col("id"), lit(2L).as("cell"))
    ArtifactStore.save(a, root, "kmeans_cells", "corpusA", "v0001")
    ArtifactStore.save(b, root, "kmeans_cells", "corpusB", "v0001")
    val loaded = ArtifactStore.load(spark, root, "kmeans_cells", "corpusA", "v0001")
    val plan = loaded.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(loaded.count() == 10, "other corpus's partition never read")
  }

  test("loadUpTo unions delta versions (≤ pin, pruned); compact merges and retires them") {
    import spark.implicits._
    val root = freshRoot()
    def d(xs: Int*): DataFrame = xs.toDF("x")
    ArtifactStore.save(d(1, 2), root, "deltas", "c", "v0001")
    ArtifactStore.save(d(3), root, "deltas", "c", "v0002")
    ArtifactStore.save(d(4), root, "deltas", "c", "v0003")
    ArtifactStore.save(d(99), root, "deltas", "other", "v0001") // sibling
    def xs(df: DataFrame): Seq[Int] =
      df.collect().map(_.getInt(0)).sorted.toSeq
    // ≤-pin semantics: v0003 invisible at pin v0002; absent corpus -> None
    assert(xs(ArtifactStore.loadUpTo(spark, root, "deltas", "c", "v0002").get)
      == Seq(1, 2, 3))
    assert(ArtifactStore.loadUpTo(spark, root, "deltas", "nope", "v9").isEmpty)
    // compact: one snapshot carrying the union, the deltas retired,
    // the sibling corpus untouched; target must sort after every
    // existing version
    intercept[IllegalArgumentException] {
      ArtifactStore.compact(spark, root, "deltas", "c", "v0003")
    }
    assert(ArtifactStore.compact(spark, root, "deltas", "c", "v0004")
      == Seq("v0001", "v0002", "v0003"))
    assert(ArtifactStore.listVersions(spark, root, "deltas", "c") == Seq("v0004"))
    assert(xs(ArtifactStore.load(spark, root, "deltas", "c", "v0004"))
      == Seq(1, 2, 3, 4))
    assert(xs(ArtifactStore.load(spark, root, "deltas", "other", "v0001"))
      == Seq(99))
  }

  test("dynamic overwrite replaces ONE snapshot; siblings untouched; no orphans") {
    val root = freshRoot()
    def frame(n: Int) = spark.range(n).select(col("id"), lit(0L).as("cell"))
    ArtifactStore.save(frame(5), root, "kmeans_cells", "c", "v0001")
    ArtifactStore.save(frame(7), root, "kmeans_cells", "c", "v0002")
    // re-publish v0001 with different content
    ArtifactStore.save(frame(3), root, "kmeans_cells", "c", "v0001")
    assert(ArtifactStore.load(spark, root, "kmeans_cells", "c", "v0001").count() == 3)
    assert(ArtifactStore.load(spark, root, "kmeans_cells", "c", "v0002").count() == 7)
    assert(ArtifactStore.latest(spark, root, "kmeans_cells", "c").contains("v0002"))
    // versions() sees exactly the two live snapshots
    assert(ArtifactStore.versions(spark, root, "kmeans_cells").count() == 2)
  }

  test("normKey: distinct raw keys never collide after sanitization") {
    val k1 = ArtifactStore.normKey("/root/testdata/sf0.01")
    val k2 = ArtifactStore.normKey("/root/testdata/sf0_01")
    assert(k1 != k2, "md5 suffix disambiguates sanitization collisions")
    assert(k1.matches("[A-Za-z0-9._-]+"), k1)
    assert(ArtifactStore.normKey("///") .matches("[a-f0-9]{8}"), "degenerate key falls back to digest")
  }

  test("exists/latest/versions on an empty store: no exception, no result") {
    val root = freshRoot()
    assert(!ArtifactStore.exists(spark, root, "kmeans_cells", "c", "v0001"))
    // the r12 ADVICE gap: these two used to throw AnalysisException
    // (Path does not exist) on a kind never published
    assert(ArtifactStore.latest(spark, root, "kmeans_cells", "c").isEmpty)
    assert(ArtifactStore.versions(spark, root, "kmeans_cells").count() == 0)
    val loaded = Similarity.cellsPublished(embs, root, sfDir, "v0001",
      "vec_id", "embedding", 8, 3)
    assert(ArtifactStore.exists(spark, root, "kmeans_cells", sfDir, "v0001"))
    // second call takes the load path and matches the trained frame
    val again = Similarity.cellsPublished(embs, root, sfDir, "v0001",
      "vec_id", "embedding", 8, 3)
    assert(sortedRows(again) == sortedRows(loaded))
  }

  test("exists and versions are metadata-only: zero Spark jobs scheduled") {
    val root = freshRoot()
    ArtifactStore.save(
      spark.range(6).select(col("id"), lit(1L).as("cell")),
      root, "kmeans_cells", "c", "v0001")
    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      assert(ArtifactStore.exists(spark, root, "kmeans_cells", "c", "v0001"))
      assert(!ArtifactStore.exists(spark, root, "kmeans_cells", "c", "v9999"))
      assert(ArtifactStore.latest(spark, root, "kmeans_cells", "c")
        .contains("v0001"))
      Thread.sleep(1000) // let any (unexpected) job-start events land
      assert(jobs == 0, s"metadata calls scheduled $jobs Spark job(s)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("prune keeps each corpus's latest keepLast versions, deletes the rest") {
    val root = freshRoot()
    def frame(n: Int) = spark.range(n).select(col("id"), lit(0L).as("cell"))
    ArtifactStore.save(frame(1), root, "kmeans_cells", "c", "v0001")
    ArtifactStore.save(frame(2), root, "kmeans_cells", "c", "v0002")
    ArtifactStore.save(frame(3), root, "kmeans_cells", "c", "v0003")
    ArtifactStore.save(frame(4), root, "kmeans_cells", "d", "v0001")
    val deleted = ArtifactStore.prune(spark, root, "kmeans_cells", keepLast = 2)
    assert(deleted == Seq((ArtifactStore.normKey("c"), "v0001")), s"$deleted")
    // survivors intact, per corpus
    assert(ArtifactStore.latest(spark, root, "kmeans_cells", "c").contains("v0003"))
    assert(ArtifactStore.load(spark, root, "kmeans_cells", "c", "v0002").count() == 2)
    assert(ArtifactStore.load(spark, root, "kmeans_cells", "d", "v0001").count() == 4)
    assert(!ArtifactStore.exists(spark, root, "kmeans_cells", "c", "v0001"))
    // a reader pinned to the pruned version fails loudly, not quietly
    intercept[Exception] {
      ArtifactStore.load(spark, root, "kmeans_cells", "c", "v0001").count()
    }
    // pruning again is a no-op
    assert(ArtifactStore.prune(spark, root, "kmeans_cells", keepLast = 2).isEmpty)
  }

  test("pqPublished: codes+codebook pair roundtrips; probe session loads both") {
    val root = freshRoot()
    val e = embs
    val (codes, codebook) = Similarity.pqPublished(e, root, sfDir, "v0001",
      "vec_id", "embedding", 64, 4, 8, 2)
    val (codes2, codebook2) = Similarity.pqPublished(e, root, sfDir, "v0001",
      "vec_id", "embedding", 64, 4, 8, 2)
    assert(sortedRows(codes2) == sortedRows(codes))
    assert(sortedRows(codebook2) == sortedRows(codebook))
  }

  test("bpe merges and vocab publish and reload bit-identically") {
    import spark.implicits._
    val root = freshRoot()
    val docs = Seq("low lower lowest", "low low slow", "newer newest")
      .toDF("text")
    val m1 = Bpe.trainPublished(docs, root, "fixture", "v0001", "text", 5)
    val m2 = Bpe.trainPublished(docs, root, "fixture", "v0001", "text", 5)
    assert(sortedRows(m1) == sortedRows(m2) && m1.count() > 0)
    val v1 = TextAnalysis.vocabPublished(docs, root, "fixture", "v0001", "text")
    val v2 = TextAnalysis.vocabPublished(docs, root, "fixture", "v0001", "text")
    assert(sortedRows(v1) == sortedRows(v2) && v1.count() > 0)
  }

  test("dedup state publishes and reloads: incremental run from loaded state " +
      "equals run from fresh state") {
    import spark.implicits._
    val root = freshRoot()
    val d = graft.core.Tables.load(spark, sfDir, "documents")
    val seen = d.filter(col("doc_id") % 3 =!= 0)
    val batch = d.filter(col("doc_id") % 3 === 0)
    val (freshDig, freshBands) =
      graft.operators.Dedup.dedupState(seen, "doc_id", "text", 16, 4)
    val (dig1, bands1) = graft.operators.Dedup.dedupStatePublished(
      seen, root, "specCorpus", "v0001", "doc_id", "text", 16, 4)
    // direct frame equality of the state tables
    assert(sortedRows(dig1) == sortedRows(freshDig))
    assert(sortedRows(bands1) == sortedRows(freshBands))
    // second call takes the load path (no rebuild) and the
    // incremental run's verdicts are identical either way
    val (dig2, bands2) = graft.operators.Dedup.dedupStatePublished(
      seen, root, "specCorpus", "v0001", "doc_id", "text", 16, 4)
    val a = graft.operators.Dedup.incrementalDedup(batch, "doc_id", "text",
      freshDig, freshBands, 16, 4, Some(13)).select("doc_id")
    val b = graft.operators.Dedup.incrementalDedup(batch, "doc_id", "text",
      dig2, bands2, 16, 4, Some(13)).select("doc_id")
    assert(sortedRows(b) == sortedRows(a))
  }

  test("robots policy publishes and reloads: gate and delay from loaded " +
      "policy equal the fresh parse (nested rules array survives parquet)") {
    import spark.implicits._
    val root = freshRoot()
    val robots = Seq(
      ("a.example", "User-agent: *\nDisallow: /private\nAllow: /private/ok\nCrawl-delay: 2"),
      ("b.example", "User-agent: graftbot\nDisallow: /\nUser-agent: *\nAllow: /"),
      ("c.example", "User-agent: *\nDisallow: /tmp*.html$")
    ).toDF("domain", "robots_txt")
    val urls = Seq(
      (1L, "http://a.example/private/ok/x"), (2L, "http://a.example/private/no"),
      (3L, "http://b.example/anything"), (4L, "http://c.example/tmp1.html"),
      (5L, "http://d.example/unlisted")).toDF("id", "url")
    val fresh = graft.operators.UrlNormalize.robotsPolicy(
      robots, "domain", "robots_txt", "graftbot")
    val loaded = graft.operators.UrlNormalize.robotsPolicyPublished(
      robots, root, "specRobots", "v0001", "domain", "robots_txt", "graftbot")
    // parquet relaxes nullability on read; names + types must hold
    assert(loaded.schema.map(f => (f.name, f.dataType.sql)) ==
      fresh.schema.map(f => (f.name, f.dataType.sql)),
      "rules array type preserved")
    assert(sortedRows(loaded) == sortedRows(fresh))
    val gateFresh = graft.operators.UrlNormalize.robotsGateFromPolicy(
      urls, "id", "url", fresh)
    val gateLoaded = graft.operators.UrlNormalize.robotsGateFromPolicy(
      urls, "id", "url", loaded)
    assert(sortedRows(gateLoaded) == sortedRows(gateFresh))
    // second call takes the load path
    val again = graft.operators.UrlNormalize.robotsPolicyPublished(
      robots, root, "specRobots", "v0001", "domain", "robots_txt", "graftbot")
    assert(sortedRows(again) == sortedRows(fresh))
  }

  test("registerTable: SQL consumers get the same snapshot through the catalog") {
    val root = freshRoot()
    val a = spark.range(4).select(col("id"), lit(9L).as("cell"))
    ArtifactStore.save(a, root, "kmeans_cells", "c", "v0001")
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_artifacts_spec")
    try {
      ArtifactStore.registerTable(spark, root, "kmeans_cells", "graft_artifacts_spec")
      val viaSql = spark.sql(
        s"""SELECT id, cell FROM graft_artifacts_spec.kmeans_cells
           |WHERE corpus_key = '${ArtifactStore.normKey("c")}'
           |  AND version = 'v0001'""".stripMargin)
      assert(sortedRows(viaSql) ==
        sortedRows(ArtifactStore.load(spark, root, "kmeans_cells", "c", "v0001")))
    } finally {
      spark.sql("DROP DATABASE IF EXISTS graft_artifacts_spec CASCADE")
    }
  }

  test("loadUpTo: a pin retired by compact fails loudly, never reads-as-empty") {
    import spark.implicits._
    val root = freshRoot()
    ArtifactStore.save(Seq(1, 2).toDF("x"), root, "deltas", "c", "v0001")
    ArtifactStore.save(Seq(3).toDF("x"), root, "deltas", "c", "v0002")
    ArtifactStore.compact(spark, root, "deltas", "c", "v0003")
    // a reader still pinned at its pre-compact publish: the old code
    // returned None here, and a frontier drain would silently treat
    // the whole seen state as empty and re-emit everything
    val ex = intercept[IllegalArgumentException] {
      ArtifactStore.loadUpTo(spark, root, "deltas", "c", "v0002")
    }
    assert(ex.getMessage.contains("folded into"))
    // live pin still reads the full state; never-published corpus is
    // still the legitimate first-run None
    assert(ArtifactStore.loadUpTo(spark, root, "deltas", "c", "v0003").get
      .collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3))
    assert(ArtifactStore.loadUpTo(spark, root, "deltas", "never", "v9").isEmpty)
    // a pin below a corpus's publishes WITHOUT compaction history is
    // the legitimate empty-as-of-pin case (idempotent re-runs pin
    // their own first version before their own later publishes)
    ArtifactStore.save(Seq(9).toDF("x"), root, "deltas", "fresh", "v0005")
    assert(ArtifactStore.loadUpTo(spark, root, "deltas", "fresh", "v0004")
      .isEmpty)
  }

  test("compact crash mid-delete: readers never double-count; re-run resumes") {
    import spark.implicits._
    val root = freshRoot()
    ArtifactStore.save(Seq(1, 2).toDF("x"), root, "deltas", "c", "v0001")
    ArtifactStore.save(Seq(3).toDF("x"), root, "deltas", "c", "v0002")
    val corpusDir = java.nio.file.Paths.get(
      s"$root/deltas/corpus_key=${ArtifactStore.normKey("c")}")
    val marker = corpusDir.resolve("_compact_into_v0003")
    // marker alone (crash BEFORE the snapshot landed) is inert
    java.nio.file.Files.createFile(marker)
    assert(ArtifactStore.listVersions(spark, root, "deltas", "c")
      == Seq("v0001", "v0002"))
    // replay compact's save step, then "crash" before any delete:
    // snapshot + both deltas all sit on disk under an active marker
    ArtifactStore.save(Seq(1, 2, 3).toDF("x"), root, "deltas", "c", "v0003")
    assert(java.nio.file.Files.exists(
      corpusDir.resolve("version=v0001")), "leftover delta still on disk")
    // readers see snapshot-only state: no union with the leftovers
    assert(ArtifactStore.listVersions(spark, root, "deltas", "c")
      == Seq("v0003"))
    assert(ArtifactStore.loadUpTo(spark, root, "deltas", "c", "v0003").get
      .collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3))
    // re-running compact with the same target RESUMES: finishes the
    // deletes, removes the marker, returns the retired versions
    assert(ArtifactStore.compact(spark, root, "deltas", "c", "v0003")
      == Seq("v0001", "v0002"))
    // the marker is PERMANENT: it is the durable floor record that
    // lets a compaction-retired pin fail loudly forever after
    assert(java.nio.file.Files.exists(marker))
    assert(!java.nio.file.Files.exists(corpusDir.resolve("version=v0001")))
    assert(ArtifactStore.loadUpTo(spark, root, "deltas", "c", "v0003").get
      .collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3))
  }
}
