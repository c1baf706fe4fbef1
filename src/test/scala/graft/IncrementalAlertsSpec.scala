package graft

import org.apache.spark.sql.functions._
import graft.harness.VadfAlert
import graft.streaming.IncrementalAlerts

/** The streaming fast path must emit exactly what the batch detector
  * computes over the same data — arrival order must not matter. */
class IncrementalAlertsSpec extends SparkTestBase {

  test("streaming VADF over a vista changelog equals the batch detector") {
    DomainFixtures.registerAll(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft_vista_log").toString

    // the changelog arrives as two file slices (two micro-batches)
    val vista = spark.table("vista")
    vista.filter(col("vist_dk") < 1400).coalesce(1)
      .write.mode("append").parquet(dir)
    vista.filter(col("vist_dk") >= 1400).coalesce(1)
      .write.mode("append").parquet(dir)

    val streamed = IncrementalAlerts
      .vadfStream(spark, dir, spark.table("documento"))
    val batch = VadfAlert.build(spark)

    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.select("alrt_docu_dk", "alrt_dk_referencia").collect()
        .map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(key(streamed) == key(batch))
    assert(key(streamed) == Set((99, 9900))) // the planted closed-doc vista
  }

  test("incremental GATE: streamed max-vista maintenance equals the batch detector") {
    DomainFixtures.registerAll(spark)
    val clock = graft.harness.RunClock(
      java.time.LocalDateTime.of(2026, 8, 12, 12, 0))
    val dir = java.nio.file.Files.createTempDirectory("graft_gate_log").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_gate_ckpt").toString

    // vista changelog in three slices -> three micro-batches
    // (maxFilesPerTrigger=1): the per-doc max is maintained as
    // streaming state across batches, not recomputed from scratch
    val vista = spark.table("vista")
    Seq(col("vist_dk") < 1200,
      col("vist_dk") >= 1200 && col("vist_dk") < 1400,
      col("vist_dk") >= 1400).foreach { slice =>
      vista.filter(slice).coalesce(1).write.mode("append").parquet(dir)
    }

    val streamed = IncrementalAlerts
      .gateStream(spark, dir, "graft_incr_gate", clock, ckpt)
    val batch = new graft.harness.GateAlert(clock).build(spark)

    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.select("alrt_docu_dk", "alrt_dk_referencia", "alrt_dias_referencia")
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    assert(key(streamed) == key(batch))
    // 121: IT with no vista ever (stays from the seed); 123: vista older
    // than the IT (re-fired on update); 122: vista newer (retracted)
    assert(key(streamed).map(_._1) == Set(121, 123))
    spark.sql("DROP TABLE graft_incr_gate")
  }

  test("incremental anti-join: changelog maintenance equals full recompute both ways") {
    import spark.implicits._
    // VADF-style exclusion shape: alerts on docs NOT in the exclusion
    // set (archived docs). Two snapshots chosen so the diff carries
    // BOTH directions: doc 2 becomes excluded (retraction), doc 4
    // stops being excluded (re-admission), doc 5 stays excluded via a
    // second row (must NOT be re-admitted), doc 1/3 untouched.
    val facts = Seq((1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e"))
      .toDF("doc_id", "payload")
    val exclPrev = Seq((4, "arch"), (5, "arch"), (5, "baixa"))
      .toDF("doc_id", "reason").select("doc_id").distinct()
    val exclNext = Seq((2, "arch"), (5, "baixa"))
      .toDF("doc_id", "reason").select("doc_id").distinct()

    def anti(excl: org.apache.spark.sql.DataFrame) =
      facts.join(excl.withColumnRenamed("doc_id", "x_id"),
        col("doc_id") === col("x_id"), "left_anti")
    def keys(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getInt(0)).toSet

    val diff = graft.operators.Relational.snapshotDiff(
      exclPrev.withColumn("__m", lit(1)), exclNext.withColumn("__m", lit(1)),
      "doc_id", Seq("__m"))
    val incr = IncrementalAlerts.antiJoinIncrement(
      anti(exclPrev), facts, "doc_id", diff, exclNext, "doc_id")
    // forward: incremental == full recompute against the NEW snapshot
    assert(keys(incr) == keys(anti(exclNext)))
    assert(keys(incr) == Set(1, 3, 4)) // 2 retracted, 4 re-admitted, 5 still out

    // reverse direction: applying the inverse diff to the NEW result
    // restores the OLD result (shrink and grow both exact)
    val diffBack = graft.operators.Relational.snapshotDiff(
      exclNext.withColumn("__m", lit(1)), exclPrev.withColumn("__m", lit(1)),
      "doc_id", Seq("__m"))
    val back = IncrementalAlerts.antiJoinIncrement(
      incr, facts, "doc_id", diffBack, exclPrev, "doc_id")
    assert(keys(back) == keys(anti(exclPrev)))
    assert(keys(back) == Set(1, 2, 3))

    // guard coverage: a ROW-level changelog (not a key-level
    // snapshotDiff) can report `delete` for a key that is still
    // excluded through another row — doc 5 loses its 'arch' row but
    // keeps 'baixa'. The anti probe against the NEW snapshot must
    // keep it out; dropping that guard would wrongly re-admit it.
    val rowDiff = Seq((5, "delete"), (4, "delete"), (2, "insert"))
      .toDF("doc_id", "change_type")
    val incrRowLog = IncrementalAlerts.antiJoinIncrement(
      anti(exclPrev), facts, "doc_id", rowDiff, exclNext, "doc_id")
    assert(keys(incrRowLog) == Set(1, 3, 4)) // 5 NOT re-admitted
  }

  test("streaming dedup gate: within-stream, cross-batch, and history dups all drop") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_doc_log").toString
    // history: one seen doc
    val seen = Seq((1L, "already seen text")).toDF("doc_id", "text")
    val seenDigests = seen.select(md5(col("text")).as("content_hash")).distinct()
    // slice 1: fresh + history-dup + a doc duplicated within the slice
    Seq((10L, "fresh one"), (11L, "already seen text"),
      (12L, "twice in stream"), (13L, "twice in stream"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(dir)
    // slice 2 (second micro-batch): cross-batch dup of slice 1 + fresh
    Seq((20L, "twice in stream"), (21L, "fresh two"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(dir)

    val out = IncrementalAlerts.dedupStream(spark, dir, seenDigests)
      .select("text").collect().map(_.getString(0)).toSet
    // one survivor per distinct unseen content; 11 (history) dropped,
    // 13/20 (stream dups of 12's content, same and later batch) dropped
    assert(out == Set("fresh one", "twice in stream", "fresh two"))
  }

  test("generic detectorStream: OUVI runs unchanged over a routing stream") {
    DomainFixtures.registerAll(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft_item_log").toString
    spark.table("mcpr_item_movimentacao").coalesce(1)
      .write.mode("append").parquet(dir)
    val alert = new graft.harness.OuviAlert
    val streamed = IncrementalAlerts.detectorStream(spark, alert,
      "mcpr_item_movimentacao",
      spark.readStream.schema(spark.read.parquet(dir).schema).parquet(dir),
      "graft_incr_ouvi")
    val ids = streamed.select("alrt_docu_dk").collect().map(_.getInt(0)).toSet
    assert(ids == Set(111)) // same planted positive as the batch golden test
    // the original batch view is restored after the drain
    assert(!spark.table("mcpr_item_movimentacao").isStreaming)
  }

  test("streaming NF30: grouped-CASE state with HAVING-gate retraction equals batch") {
    import spark.implicits._
    DomainFixtures.registerAll(spark)
    graft.harness.ActiveDocs.registerCached(spark)
    val clock = graft.harness.RunClock(
      java.time.LocalDateTime.of(2026, 8, 12, 12, 0))
    val dir = java.nio.file.Files.createTempDirectory("graft_nf30_log").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_nf30_ckpt").toString

    def slice(rows: Seq[(Int, Int, String)]): Unit =
      rows.map { case (d, c, t) => (d, c, java.sql.Timestamp.valueOf(t)) }
        .toDF("vist_docu_dk", "stao_tppr_dk", "pcao_dt_andamento")
        .withColumn("pcao_dt_cancelamento", lit(null).cast("timestamp"))
        .coalesce(1).write.mode("append").parquet(dir)

    def byDoc(df: org.apache.spark.sql.DataFrame) =
      df.select("alrt_docu_dk", "alrt_sigla").collect()
        .map(r => r.getInt(0) -> r.getString(1)).toMap

    // run 1: only an out-of-code-set andamento — the stream filter
    // drops it, so every class-393 doc fires from the cadastro
    // fallback, INCLUDING 202 (its conversão hasn't arrived yet)
    slice(Seq((201, 9999, "2026-06-02 00:00:00")))
    val first = IncrementalAlerts.nf30Stream(
      spark, dir, "graft_incr_nf30", clock, ckpt)
    assert(byDoc(first) == Map(201 -> "NF30", 202 -> "NF30", 203 -> "NF120"))

    // run 2 RESUMES from the checkpoint (no re-seed, only the new file
    // is read): 202's conversão flips the HAVING gate and RETRACTS its
    // live alert; the final table equals the batch detector exactly
    slice(Seq((202, 6011, "2026-06-05 00:00:00")))
    val second = IncrementalAlerts.nf30Stream(
      spark, dir, "graft_incr_nf30", clock, ckpt)
    assert(byDoc(second) == byDoc(new graft.harness.Nf30Alert(clock).build(spark)))
    assert(byDoc(second) == Map(201 -> "NF30", 203 -> "NF120"))

    // the documented no-watermark choice is SAFE because state is
    // bounded by the qualifying-changelog doc population, not by time:
    // exactly one state row per distinct doc that ever passed the
    // code-set filter. Prove the bound by reading the state store
    // itself (Spark's state data source over the same checkpoint):
    // 201's row was out-of-code-set — filtered BEFORE the aggregate,
    // so it must hold no state; 202's conversão does.
    def stateDocs(): Set[Int] =
      spark.read.format("statestore").load(ckpt)
        .select(col("key.vist_docu_dk")).collect().map(_.getInt(0)).toSet
    assert(stateDocs() == Set(202),
      "state rows must be exactly the qualifying-changelog docs")

    // run 3: a qualifying autuação enters one more doc into state —
    // the bound grows with the qualifying population and ONLY with it;
    // 203's deadline now anchors on the autuação date (elapsed 133d >
    // 120) so its alert stays NF120, 201 untouched
    slice(Seq((203, 6034, "2026-04-01 00:00:00")))
    val third = IncrementalAlerts.nf30Stream(
      spark, dir, "graft_incr_nf30", clock, ckpt)
    assert(byDoc(third) == Map(201 -> "NF30", 203 -> "NF120"))
    assert(stateDocs() == Set(202, 203),
      "state must grow one row per newly-qualifying doc, no more")
    spark.sql("DROP TABLE graft_incr_nf30")
    spark.catalog.clearCache()
  }
}
