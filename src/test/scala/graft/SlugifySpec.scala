package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.Slugify

/** Vectors for the slugify expression (reference F2 semantics:
  * NFD-decompose, strip non-ascii, whitespace runs to '-', lowercase). */
class SlugifySpec extends SparkTestBase {

  test("GraftExtensions injects slugify/cosine_sim as native SQL functions") {
    // no per-session register() call — the extensions conf on the
    // session factory must be enough for SQL-only clients
    val slug = spark.sql("SELECT slugify('  Ação  Política  ') AS s")
      .head.getString(0)
    assert(slug == "acao-politica")
    val cos = spark.sql(
      "SELECT round(cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)), 6) AS c")
      .head.getDouble(0)
    assert(cos == 1.0)
    // the reference's uuidsha UDF surface, SQL-callable:
    // sha1 of the ascii-cleaned concatenation "123" ++ "Ao Penal"
    val key = spark.sql("SELECT uuidsha(123, 'Ação Penal') AS k").head.getString(0)
    val expect = java.security.MessageDigest.getInstance("SHA-1")
      .digest("123Ao Penal".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(key == expect)
    // and it agrees with the Column-level builder the harness uses
    import spark.implicits._
    val viaColumn = Seq((123, "Ação Penal")).toDF("a", "b")
      .select(graft.core.AlertKey.uuidsha(org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b")))
      .head.getString(0)
    assert(key == viaColumn)
  }

  private def slug(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("s").select(Slugify.slugify(col("s"))).head.getString(0)
  }

  test("accents decompose to base letters") {
    assert(slug("Ação Penal") == "acao-penal")
    assert(slug("José María") == "jose-maria")
  }

  test("whitespace runs collapse to single dash, case lowers") {
    assert(slug("  Grupo   DE \t Atuação ") == "grupo-de-atuacao")
  }

  test("registered SQL function works") {
    Slugify.register(spark)
    val r = spark.sql("SELECT slugify('São Paulo  MPRJ') AS s").head.getString(0)
    assert(r == "sao-paulo-mprj")
  }

  test("null propagates") {
    import spark.implicits._
    val r = Seq(Option.empty[String]).toDF("s")
      .select(Slugify.slugify(col("s"))).head
    assert(r.isNullAt(0))
  }
}
