package graft.sources

/** Post-write metadata notification hook — the out-of-engine seam the
  * reference fills with Impala `INVALIDATE METADATA` over impyla
  * (reference src/alertas/utils.py:8-24 per-table, alertas.sh:39
  * global): external query engines caching table metadata must be
  * told a table was rewritten. The engine calls the hook after every
  * final/history write; deployments plug in a JDBC call (or nothing —
  * engines reading the metastore directly need no invalidation). */
trait MetadataHook {
  def tableWritten(table: String): Unit
}

object MetadataHook {
  /** Default: no external metadata cache to invalidate. */
  object Noop extends MetadataHook {
    def tableWritten(table: String): Unit = ()
  }

  /** Test/diagnostic hook: records the notification order. */
  final class Recording extends MetadataHook {
    val written: scala.collection.mutable.ArrayBuffer[String] =
      scala.collection.mutable.ArrayBuffer.empty
    def tableWritten(table: String): Unit = written += table
  }
}
