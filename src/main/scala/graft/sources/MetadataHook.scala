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

  /** Real JDBC implementation of the reference's per-table Impala
    * refresh (`utils.py:8-24`: connect, `INVALIDATE METADATA <table>`,
    * close — one connection per notification, which is also the
    * failure-isolated choice here: a dead metadata endpoint can't pin
    * a stale pooled connection across a whole run). Works against any
    * engine with a JDBC driver by swapping `statementFor` (e.g.
    * `REFRESH TABLE x` for a different cache). The table identifier is
    * validated instead of string-formatted blindly — the reference
    * interpolates unchecked (deliberate hardening divergence). */
  final class Jdbc(
      connect: () => java.sql.Connection,
      statementFor: String => String = t => s"INVALIDATE METADATA $t")
      extends MetadataHook {
    private val ident = "[A-Za-z_][A-Za-z0-9_]*(\\.[A-Za-z_][A-Za-z0-9_]*)*".r
    def tableWritten(table: String): Unit = {
      require(ident.matches(table), s"unsafe table identifier: $table")
      val conn = connect()
      try {
        val st = conn.createStatement()
        try st.execute(statementFor(table))
        finally st.close()
      } finally conn.close()
    }
  }
}
