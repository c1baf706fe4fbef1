package graft.operators

import org.apache.spark.sql.SparkSession

/** Idempotent reliable-checkpoint-dir setup shared by the iterative
  * operators ([[Dedup.connectedComponents]], [[Similarity.kmeansCells]]).
  *
  * `SparkContext.setCheckpointDir` stores a QUALIFIED
  * `<scheme>://<dir>/<random-uuid>` path, so a naive
  * `getCheckpointDir.contains(dir)` equality guard never matches and
  * every call would re-set the session-global dir (and mkdir a fresh
  * UUID subdir). This guard matches on the requested prefix instead, so
  * repeated calls with the same dir are no-ops; a call with a DIFFERENT
  * dir still re-points the session-global setting — that mutation is
  * inherent to Spark's one-checkpoint-dir-per-context model and is
  * documented at both call sites (use one reliable dir per session).
  */
object GraftCheckpoint {

  /** Materialize `df` hash-partitioned on `keys` so that DOWNSTREAM
    * keyed operators (joins, aggregates on the same keys) reuse the
    * layout instead of re-exchanging the frame — the "pre-partitioned
    * statics" barrier the iterative operators ([[Graph.pageRank]],
    * [[Graph.hits]], [[graft.operators.Classifier]]'s GD loop) lean on.
    *
    * Why the AQE scope-off: `Dataset.localCheckpoint`/`checkpoint`
    * record the physical plan's `outputPartitioning` in the resulting
    * LogicalRDD, but under adaptive execution the captured plan is the
    * `AdaptiveSparkPlanExec` wrapper, whose reported partitioning is
    * `UnknownPartitioning` — so every checkpointed static silently
    * lost its layout on Spark 4 and each iteration re-exchanged it
    * (round-17 finding; plan-asserted by GraphSpec's
    * partitioned-barrier test). Disabling AQE for just this
    * materialization restores the recorded HashPartitioning; consumers
    * run with AQE on as usual and see 0 exchanges on the keyed path.
    * The frame being checkpointed here is an explicit repartition, so
    * AQE would have nothing to adapt anyway — nothing is lost.
    *
    * `reliable = true` uses the reliable-FS `checkpoint()` barrier
    * (cluster mode, [[ensureDir]] must have run); note reliable
    * checkpoints never recorded partitioning in the first place, so
    * the repartition stays immediately upstream and the one exchange
    * per consumer is the known cost of that mode. */
  def partitionedBarrier(df: org.apache.spark.sql.DataFrame,
                         keys: Seq[String],
                         reliable: Boolean = false,
                         pinMin: Int = PinMinPartitions):
      org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    if (reliable)
      return df.repartition(keys.map(org.apache.spark.sql.functions.col): _*)
        .checkpoint()
    // Materialize ONCE under AQE: its coalescing picks a width that
    // tracks the frame's actual bytes (the scale-adaptive sizing
    // rule). Whether to PIN a hash(keys) layout is then a size
    // decision, not a constant:
    //  - a SMALL static (few post-coalesce partitions) is re-exchanged
    //    per iteration essentially for free — the exchange is a few
    //    local blocks — while pinning it would cost an extra
    //    materialization AND freeze downstream zero-exchange stages at
    //    the pinned width (no AQEShuffleRead exists to re-coalesce
    //    them); measured at sf0.1: pinning small statics cost +0.4-1.1s
    //    per iterative query for nothing.
    //  - a LARGE static is exactly the round-9 regime: re-exchanging
    //    it every round is iters × |frame| over the wire, so one extra
    //    statics-sized pass to record the layout (AQE scoped off —
    //    under AQE the checkpoint records UnknownPartitioning and the
    //    layout is lost, the round-17 finding) pays for itself in the
    //    first iteration.
    // A frame that IS already a bare checkpoint (LogicalRDD — e.g.
    // HITS passing its shared edge checkpoint in twice for two
    // layouts) needs no pre-gate materialization: localCheckpoint on
    // it would copy every block just to read the partition count.
    // Below the gate the caller then shares ONE copy instead of
    // paying a redundant copy per requested layout (round 18).
    val bare = df.queryExecution.analyzed.getClass.getSimpleName == "LogicalRDD"
    val once = if (bare) df else df.localCheckpoint(true)
    val n = math.max(1, once.rdd.getNumPartitions)
    if (n < pinMin) once
    else confScopeLock.synchronized {
      // serialized flip: the AQE toggle is SESSION-global, so two
      // concurrent barriers could interleave set/restore and one of
      // them would checkpoint under AQE — recording
      // UnknownPartitioning, the exact wrong-plan failure this helper
      // exists to prevent (latent until a caller pools barriered
      // trains on driver threads — the q167 shape; GraphSpec pins the
      // concurrent case). The lock covers flip → materialize →
      // restore; the pre-gate materialization above stays unlocked.
      val key = "spark.sql.adaptive.enabled"
      val old = spark.conf.get(key)
      spark.conf.set(key, "false")
      try once.repartition(n, keys.map(org.apache.spark.sql.functions.col): _*)
        .localCheckpoint(true)
      finally spark.conf.set(key, old)
    }
  }

  /** JVM-wide monitor serializing session-conf scope flips (the AQE
    * toggle above, [[graft.streaming.EventStream.withStatePartitions]]'
    * shuffle-partition scope): session confs are process-global per
    * session, so scoped set/restore pairs from concurrent driver
    * threads must not interleave. Reentrant (Java monitor). */
  private[graft] object confScopeLock

  /** Pin the layout once the AQE-coalesced static spans this many
    * partitions (~4 × advisoryPartitionSizeInBytes ≈ a quarter GB by
    * default — below that an iteration's re-exchange is local-block
    * cheap and pinning is pure overhead; above it the per-iteration
    * exchange grows linearly while the pin stays one pass). */
  private[graft] val PinMinPartitions: Int =
    sys.env.getOrElse("GRAFT_PIN_MIN_PARTITIONS", "4").toInt

  def ensureDir(spark: SparkSession, dir: String): Unit = synchronized {
    // Match on the slash-terminated prefix ONLY: a bare startsWith(dir)
    // would let /data/ckpt-old satisfy a request for /data/ck (string
    // prefix, different directory) and silently keep checkpoints in the
    // wrong place. The stored dir is always <requested>/<uuid>, so the
    // slash-terminated form is both necessary and sufficient.
    val want = dir.stripSuffix("/") + "/"
    val already = spark.sparkContext.getCheckpointDir.exists { q =>
      val plain = q.replaceFirst("^[a-zA-Z][a-zA-Z0-9+.-]*:(//)?", "/")
        .replaceFirst("^/+", "/")
      (q.stripSuffix("/") + "/").startsWith(want) ||
        (plain.stripSuffix("/") + "/").startsWith(want)
    }
    if (!already) spark.sparkContext.setCheckpointDir(dir)
  }
}
