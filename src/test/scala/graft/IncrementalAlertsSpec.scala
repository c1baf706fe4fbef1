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
}
