package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard tuning.
  *
  * Mirrors the role of the reference's session bootstrap (reference
  * src/alertas/base.py:8-16 + alertas.sh:15-26) re-tuned for Spark 4:
  *   - AQE on (runtime shuffle coalescing + skew-join splitting replace
  *     the reference's hand-set parallelism / skew workarounds)
  *   - shuffle partitions sized to the local core count (the reference
  *     hardcoded 100 for its 75-core cluster; at 100 TB this would be
  *     set ~2-3x total cores and AQE coalesces down)
  *   - UTC session timezone so date/timestamp semantics are stable
  *     across engines (oracle comparisons, cluster nodes)
  *   - nanosAsLong so TIMESTAMP(NANOS) parquet (events.ts) is readable;
  *     Tables.load rebuilds a proper timestamp column.
  */
object GraftSession {
  /** `hive = true` mirrors the reference's Hive-enabled bootstrap
    * (base.py:10-14): persistent metastore catalog for the entity
    * tables. Default off — the library itself is catalog-agnostic and
    * tests run against the in-memory catalog. Only honored by the
    * first session built in a JVM (catalog choice is a static conf). */
  def build(appName: String, cores: Int, hive: Boolean = false): SparkSession = {
    val builder = SparkSession.builder()
      .appName(appName)
      .master(s"local[$cores]")
      // library SQL surface: slugify / cosine_sim as native functions
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // default: one shuffle partition per core; override with
      // GRAFT_SHUFFLE_PARTITIONS when per-partition shuffle volume is
      // the binding term (the cluster-sizing rule below — ~2-3x total
      // cores, AQE coalesces down — applied locally; measured effect
      // on the 212M-pair q33 shuffle in SCALE.md "Measured scaling")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("GRAFT_SHUFFLE_PARTITIONS", cores.toString))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // START WIDE, COALESCE DOWN — the volume-sizing escape hatch:
      // GRAFT_INITIAL_PARTITIONS widens every shuffle's initial
      // width while AQE merges small outputs back to the advisory
      // size. Measured BOTH ways at sf0.1↔100× (SCALE.md round-10
      // "initial-partition floor"): at 100× a 32-partition window
      // sort spills (q144 demo 104.8s → 11.7s at 256), but a
      // STATIC 8×-cores default taxed the whole sf0.1 bench 1.43×
      // (tiny shuffles pay the 256-task map-side cost, and
      // localCheckpoint barriers freeze the wide layout past AQE's
      // reach) — so the default stays 1× cores and the width knob
      // scales with the data, exactly like the cluster rule
      // (~2-3× total cores at 100 TB) scales with the cluster
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("GRAFT_INITIAL_PARTITIONS",
          sys.env.getOrElse("GRAFT_SHUFFLE_PARTITIONS", cores.toString)))
      // deliberate scale choice (not left to version defaults): inject
      // a bloom filter built from the small side of a shuffle join to
      // prune the probe side's scan/shuffle — the runtime complement
      // to static predicate pushdown for selective joins on big facts
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // streaming state-store backend A/B knob (SCALE.md "Streaming
      // state"): default = Spark's HDFS-backed in-memory provider
      // (state must fit the executor heap — fine at test SF);
      // GRAFT_STATE_STORE=rocksdb switches to RocksDB with changelog
      // checkpointing — the 100 TB setting, where state spills to
      // local SSD and checkpoint uploads ship the per-batch CHANGELOG
      // instead of full snapshots
      .config("spark.sql.streaming.stateStore.providerClass",
        sys.env.get("GRAFT_STATE_STORE") match {
          case Some("rocksdb") =>
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
          case _ =>
            "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
        })
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
    val spark = (if (hive) builder.enableHiveSupport() else builder).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // UDAFs can't ride the SparkSessionExtensions function injector
    // (it takes expression builders), so the centroid aggregate is
    // registered per-session here; idempotent under getOrCreate reuse
    graft.functions.Centroid.register(spark)
    spark
  }

  /** Core count from the env the driver exports, default 32 (= local[32]). */
  def envCores: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
}
