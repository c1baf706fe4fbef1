package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Stable per-row alert keys.
  *
  * Re-expresses the reference's `uuidsha` UDF (reference
  * src/alertas/utils.py:26-43) and the composite `alrt_key` recipe
  * (src/alertas/jobs.py:266-271) as pure Catalyst expressions — the
  * reference pays a per-row Python-worker round trip for this; here it
  * is whole-stage-codegen'd `sha1(concat(...))`.
  *
  * Reference semantics replicated exactly:
  *   - each argument is rendered with Python `str()` (`utils.py:35`):
  *     ints without decimal point, timestamps as `yyyy-MM-dd HH:mm:ss`,
  *     `None` → `""` (the `limpa` else-branch, `utils.py:30-31`)
  *   - non-ascii characters are DROPPED (`limpa`, `utils.py:33-38`) —
  *     accented names deliberately collide with their ascii forms
  *   - args concatenated in declared order, SHA-1 hex digest
  *     (`utils.py:40-43`)
  */
object AlertKey {

  /** Python-`str()`-compatible rendering of a column. Spark's
    * string cast matches Python str() for int/long/string, and for
    * timestamps renders `yyyy-MM-dd HH:mm:ss[.SSSSSS]` exactly like
    * `str(datetime)`. NULL → "" per limpa's else branch. */
  def render(c: Column): Column = coalesce(c.cast("string"), lit(""))

  /** Drop every non-ascii character (reference `limpa`,
    * utils.py:33-38: bytes with ord > 127 are skipped). */
  def limpa(c: Column): Column = regexp_replace(c, "[^\\x00-\\x7F]", "")

  /** uuidsha(cols*): SHA-1 hex of the ascii-cleaned concatenation. */
  def uuidsha(cols: Column*): Column =
    sha1(to_binary(concat(cols.map(c => limpa(render(c))): _*), lit("utf-8")))

  /** Single-column hash variants for the harness key builder. sha1 is
    * the reference digest (utils.py:42); sha256 exists in DuckDB too,
    * so oracle-checked harness queries use it. */
  def limpaSha1(c: Column): Column = sha1(to_binary(limpa(c), lit("utf-8")))
  def limpaSha256(c: Column): Column = sha2(limpa(c), 256)

  /** Composite key `sigla.rowKey.orgao` (reference jobs.py:266-271). */
  def alrtKey(sigla: Column, rowKey: Column, orgao: Column): Column =
    concat(render(sigla), lit("."), render(rowKey), lit("."), render(orgao))
}
