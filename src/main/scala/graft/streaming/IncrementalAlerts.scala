package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.broadcast
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Incremental alert detection — the architectural inversion of the
  * reference's nightly full rescan (src/alertas/alertas.sh relaunches
  * the whole job per run): detectors whose logic is stateless
  * (join + filter + project) run unchanged over a CHANGELOG stream,
  * emitting alerts within a micro-batch of the triggering row's
  * arrival instead of at the next nightly window.
  *
  * Contract (the lambda shape, stated honestly): the stream is the
  * fast path — an alert is emitted when its condition holds at row
  * arrival; conditions that become true later through mutation of
  * OTHER tables (e.g. the document closes after its vista arrived)
  * surface at the next batch run, which remains the reconciliation
  * path. Dismissals/replacements are downstream concerns keyed on the
  * same composite alrt_key either way.
  *
  * At scale: the static dimension broadcasts per micro-batch (no
  * state store, no shuffle on the stream side), so throughput is
  * bounded by source ingest, not join state.
  */
object IncrementalAlerts {

  /** Run ANY stateless detector incrementally: the changelog stream is
    * registered under the entity view name the detector already reads,
    * and `build` produces the same plan with a streaming side — no
    * detector code changes. Works for detectors whose plan is
    * join + filter + project (VADF, OUVI); detectors with unwatermarked
    * aggregates (max-per-group families) stay batch-only and surface
    * through the reconciliation run. The original view is restored
    * after the drain. */
  def detectorStream(spark: SparkSession, alert: graft.harness.Alert,
                     streamView: String, stream: org.apache.spark.sql.DataFrame,
                     queryName: String): DataFrame = {
    val original = spark.table(streamView)
    stream.createOrReplaceTempView(streamView)
    try {
      val q = alert.build(spark)
        .writeStream.format("memory").queryName(queryName)
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table(queryName)
    } finally original.createOrReplaceTempView(streamView)
  }

  /** Streaming VADF over a vista changelog directory: every arriving
    * open-vista row probes the (broadcast) closed-document dimension;
    * survivors are VADF alerts, drained append-mode to a memory sink.
    * Exactly [[graft.harness.VadfAlert.detect]] — same plan, streaming
    * vista side. */
  def vadfStream(spark: SparkSession, vistaDir: String,
                 documento: DataFrame,
                 queryName: String = "graft_incr_vadf"): DataFrame = {
    val schema = spark.read.parquet(vistaDir).schema
    val vista = spark.readStream.schema(schema).parquet(vistaDir)
    val q = graft.harness.VadfAlert.detect(broadcast(documento), vista)
      .writeStream.format("memory").queryName(queryName)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
