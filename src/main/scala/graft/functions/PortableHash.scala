package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashes: the md5 hex prefix reinterpreted
  * as an integer. Identical values are computable in Spark
  * (`conv(substr(md5(x),1,n),16,10)`) and DuckDB
  * (`CAST('0x'||substr(md5(x),1,n) AS BIGINT)`), which is what lets the
  * dedup/similarity operators carry exact SQL oracles.
  *
  * Scale note: md5 is ~3x slower than xxhash64, but both are codegen'd
  * single-pass expressions; for a 100 TB run swap [[hash60]] for
  * `xxhash64` (same fan-out shape, no cross-engine oracle). The operator
  * topology — what gets shuffled, what gets grouped — is unchanged.
  */
object PortableHash {

  /** 60-bit positive hash (15 hex chars — fits a signed 64-bit long). */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  def hash60Sql(e: String): String =
    s"CAST(concat('0x', substr(md5($e), 1, 15)) AS BIGINT)"

  /** 32-bit hash for simhash bit sampling. */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  def hash32Sql(e: String): String =
    s"CAST(concat('0x', substr(md5($e), 1, 8)) AS BIGINT)"

  /** Seeded variant: hash of `value # seed`. */
  def seeded(c: Column, seed: Int): Column =
    hash60(concat(c, lit("#" + seed)))

  def seededSql(e: String, seed: Int): String =
    hash60Sql(s"concat($e, '#$seed')")
}
