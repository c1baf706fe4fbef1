package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

class RelationalSpec extends SparkTestBase {

  test("maxPerGroupJoinBack keeps ALL tied rows (reference J7 semantics)") {
    import spark.implicits._
    val df = Seq(("a", 1, "x"), ("a", 3, "y"), ("a", 3, "z"), ("b", 2, "w"))
      .toDF("k", "v", "payload")
    val out = Relational.maxPerGroupJoinBack(df, "k", "v")
      .select("k", "v", "payload").as[(String, Int, String)].collect().toSet
    assert(out == Set(("a", 3, "y"), ("a", 3, "z"), ("b", 2, "w")))
  }

  test("latestPerGroup breaks ties deterministically, one row per group") {
    import spark.implicits._
    val df = Seq(("a", 3, "y"), ("a", 3, "z"), ("a", 1, "x"), ("b", 2, "w"))
      .toDF("k", "v", "payload")
    val out = Relational.latestPerGroup(df, Seq("k"),
        Seq(col("v").desc, col("payload").asc))
      .select("k", "v", "payload").as[(String, Int, String)].collect().toSet
    assert(out == Set(("a", 3, "y"), ("b", 2, "w")))
  }

  test("unpivot emits one row per (id, measure) pair") {
    import spark.implicits._
    val df = Seq((1, 10.0, 20.0), (2, 30.0, 40.0)).toDF("id", "m1", "m2")
    val out = Relational.unpivot(df, Seq("id"), Seq("one" -> "m1", "two" -> "m2"))
      .as[(Int, String, Double)].collect().toSet
    assert(out == Set((1, "one", 10.0), (1, "two", 20.0),
      (2, "one", 30.0), (2, "two", 40.0)))
  }

  test("asofJoin attaches latest right row at or before left ts") {
    import spark.implicits._
    val left = Seq((1L, "u1", 100L), (2L, "u1", 250L), (3L, "u2", 50L))
      .toDF("event_id", "key", "t")
    val right = Seq(("u1", 100L, "a"), ("u1", 200L, "b"), ("u2", 300L, "c"))
      .toDF("key", "t", "payload")
    val out = Relational.asofJoin(left, right, "key", "t", Seq("payload"))
      .select("event_id", "r_payload").as[(Long, Option[String])]
      .collect().toMap
    assert(out(1L).contains("a"))  // tie: right at same ts is inclusive
    assert(out(2L).contains("b"))  // latest of the two earlier rights
    assert(out(3L).isEmpty)        // no right row at or before → null
  }

  test("every registered query runs on sf0.001 and keeps its column names") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty, s"$name produced no columns")
      df.count() // force execution end-to-end
    }
  }

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
