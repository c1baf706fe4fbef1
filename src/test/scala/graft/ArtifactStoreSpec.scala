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

  test("exists/latest on an empty store") {
    val root = freshRoot()
    assert(!ArtifactStore.exists(spark, root, "kmeans_cells", "c", "v0001"))
    val loaded = Similarity.cellsPublished(embs, root, sfDir, "v0001",
      "vec_id", "embedding", 8, 3)
    assert(ArtifactStore.exists(spark, root, "kmeans_cells", sfDir, "v0001"))
    // second call takes the load path and matches the trained frame
    val again = Similarity.cellsPublished(embs, root, sfDir, "v0001",
      "vec_id", "embedding", 8, 3)
    assert(sortedRows(again) == sortedRows(loaded))
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
}
