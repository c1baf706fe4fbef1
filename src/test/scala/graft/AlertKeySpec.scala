package graft

import org.apache.spark.sql.functions._
import graft.core.AlertKey
import java.security.MessageDigest

/** Byte-exact vectors for the alert-key builder (SURVEY.md §7.3 risk #1):
  * replicates reference src/alertas/utils.py:26-43 `uuidsha` semantics —
  * Python str() rendering, non-ascii bytes dropped, SHA-1 hex. */
class AlertKeySpec extends SparkTestBase {

  private def sha1Hex(s: String): String =
    MessageDigest.getInstance("SHA-1").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("uuidsha matches SHA-1 of ascii-cleaned concatenation") {
    import spark.implicits._
    val df = Seq((123L, "Ação Penal", null.asInstanceOf[String]))
      .toDF("id", "nome", "missing")
      .select(AlertKey.uuidsha(col("id"), col("nome"), col("missing")).as("k"))
    // Python: limpa(str(123)) + limpa('Ação Penal') + limpa('') -> '123Ao Penal'
    assert(df.head.getString(0) == sha1Hex("123Ao Penal"))
  }

  test("uuidsha renders integers without decimal point and NULL as empty") {
    import spark.implicits._
    val df = Seq((7L, 2.5)).toDF("i", "d")
      .select(AlertKey.uuidsha(col("i"), col("d")).as("k"))
    assert(df.head.getString(0) == sha1Hex("72.5"))
  }

  test("uuidsha timestamp renders like str(datetime) seconds form") {
    import spark.implicits._
    val df = Seq("2020-01-02 03:04:05").toDF("s")
      .select(AlertKey.uuidsha(col("s").cast("timestamp")).as("k"))
    assert(df.head.getString(0) == sha1Hex("2020-01-02 03:04:05"))
  }

  test("accented and plain-ascii forms collide by design") {
    import spark.implicits._
    val df = Seq(("José", "Jos")).toDF("a", "b")
      .select(AlertKey.uuidsha(col("a")).as("ka"), AlertKey.uuidsha(col("b")).as("kb"))
    val r = df.head
    assert(r.getString(0) == r.getString(1))
  }

  test("alrtKey composes sigla.key.orgao") {
    import spark.implicits._
    val df = Seq(("DCTJ", "abc123", 400)).toDF("sigla", "key", "orgao")
      .select(AlertKey.alrtKey(col("sigla"), col("key"), col("orgao")).as("k"))
    assert(df.head.getString(0) == "DCTJ.abc123.400")
  }
}
