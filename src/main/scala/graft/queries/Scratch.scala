package graft.queries

/** Per-JVM scratch root for fixture/artifact writes that happen
  * INSIDE query bodies (q161's synthesized WARC dir, q166/q171's
  * arrival fixtures, the q57/q162/q165/q170 artifact roundtrips).
  *
  * These previously shared fixed `java.io.tmpdir` paths keyed by
  * `dir.hashCode`, so two concurrent Verify/Bench JVMs on the same
  * corpus could clobber each other mid-drain: an artifact
  * dynamic-overwrite deletes files under a concurrent reader, and the
  * arrival-fixture writer recursively rewrites its directory. One
  * lazily-created temp directory per JVM removes the shared partition
  * entirely; re-runs within a JVM still overwrite their own prior
  * snapshot (the memoized-fixture semantics repeated bench passes
  * rely on — a fresh dir per CALL would leak one copy per pass). */
private[queries] object Scratch {

  lazy val root: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_scratch")
    // the per-JVM dir would otherwise outlive every run (one parquet
    // fixture tree leaked per Verify/Bench invocation); best-effort
    // delete at JVM exit — a crash still leaks, but the OS tmp
    // reaper owns that case
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try {
        val walk = java.nio.file.Files.walk(dir)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(p =>
            { try java.nio.file.Files.deleteIfExists(p)
              catch { case _: Throwable => () } })
        finally walk.close()
      } catch { case _: Throwable => () }))
    dir.toString
  }

  /** Artifact-store root for in-query save/load roundtrips. */
  def artifactRoot: String = s"$root/artifacts"

  /** Fixture directory, keyed collision-resistantly: normKey
    * md5-suffixes the full corpus dir string, so distinct corpora
    * never collide after sanitization (a 32-bit hashCode could). */
  def fixtureDir(prefix: String, dir: String): String =
    s"$root/${prefix}_${graft.sources.ArtifactStore.normKey(dir)}"
}
