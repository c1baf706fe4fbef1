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
