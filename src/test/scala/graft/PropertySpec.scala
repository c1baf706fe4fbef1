package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Relational

/** Property-based equivalences from SURVEY.md §5.4: the reference's
  * emulated operators must agree with the native Spark forms on
  * arbitrary generated inputs (scalacheck Gen, fixed seeds). */
class PropertySpec extends SparkTestBase {

  private val rowsGen = Gen.listOfN(40,
    Gen.zip(Gen.choose(0, 8), Gen.choose(0, 20), Gen.choose(0, 5)))

  private val params = Gen.Parameters.default

  private def sample(seed: Long): List[(Int, Int, Int)] =
    rowsGen.pureApply(params, Seed(seed))

  test("left_anti == LEFT JOIN + right-key IS NULL (J4 emulation)") {
    import spark.implicits._
    (1L to 5L).foreach { seed =>
      val l = sample(seed).toDF("k", "v", "x")
      val r = sample(seed + 100).map(t => (t._1, t._2)).toDF("rk", "rv")
      val native = l.join(r.select("rk").distinct(),
        l("k") === col("rk"), "left_anti")
      val emulated = l.join(r.select("rk").distinct(),
        l("k") === col("rk"), "left")
        .filter(col("rk").isNull).drop("rk")
      assert(native.exceptAll(emulated).isEmpty &&
        emulated.exceptAll(native).isEmpty, s"seed $seed")
    }
  }

  test("groupBy+join-back == window row_number on tie-free data (J7)") {
    import spark.implicits._
    (1L to 5L).foreach { seed =>
      // make (k, v) tie-free: one row per (k, v)
      val df = sample(seed).toDF("k", "v", "x")
        .groupBy("k", "v").agg(max("x").as("x"))
      val joinBack = Relational.maxPerGroupJoinBack(df, "k", "v")
        .select("k", "v", "x")
      val windowed = Relational.latestPerGroup(df, Seq("k"),
          Seq(col("v").desc))
        .select("k", "v", "x")
      assert(joinBack.exceptAll(windowed).isEmpty &&
        windowed.exceptAll(joinBack).isEmpty, s"seed $seed")
    }
  }

  test("unpivot == union-all of per-measure selects (U2)") {
    import spark.implicits._
    (1L to 5L).foreach { seed =>
      val df = sample(seed).toDF("id", "m1", "m2")
      val stacked = Relational.unpivot(df, Seq("id"),
        Seq("a" -> "m1", "b" -> "m2"))
      val unioned = df.select(col("id"), lit("a").as("measure"), col("m1").as("val"))
        .union(df.select(col("id"), lit("b").as("measure"), col("m2").as("val")))
      assert(stacked.exceptAll(unioned).isEmpty &&
        unioned.exceptAll(stacked).isEmpty, s"seed $seed")
    }
  }

  test("connectedComponents == brute-force union-find on random graphs") {
    import spark.implicits._
    // ground truth from a driver-side union-find with path compression
    def unionFind(edges: Seq[(Int, Int)]): Map[Int, Int] = {
      val parent = scala.collection.mutable.Map[Int, Int]()
      def find(x: Int): Int = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      parent.keys.map(n => n -> find(n)).toMap
    }
    (1L to 5L).foreach { seed =>
      val edges = sample(seed).map(t => (t._1, t._2 + 3)).distinct
        .filter(e => e._1 != e._2)
      val got = graft.operators.Dedup
        .connectedComponents(edges.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
      val expected = unionFind(edges)
      assert(got == expected, s"seed $seed")
    }
  }

  test("per-bucket star edges yield the same components as all bucket pairs") {
    import spark.implicits._
    // random (doc, bucket) memberships — docs sharing any bucket are
    // candidates; the star replaces the quadratic per-bucket pair list
    (1L to 5L).foreach { seed =>
      val memb = sample(seed).map(t => (t._2, t._1)).distinct // (doc, bucket)
        .toDF("doc", "bucket")
      val pairs = memb.as("a").join(memb.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.doc") < col("b.doc"))
        .select(col("a.doc").as("id_a"), col("b.doc").as("id_b")).distinct()
      val centers = memb.groupBy("bucket").agg(min(col("doc")).as("center"))
      val stars = memb.join(centers, "bucket")
        .filter(col("doc") =!= col("center"))
        .select(col("doc").as("id_a"), col("center").as("id_b"))
      val viaPairs = graft.operators.Dedup
        .connectedComponents(pairs, "id_a", "id_b")
      val viaStars = graft.operators.Dedup
        .connectedComponents(stars, "id_a", "id_b")
      assert(viaPairs.exceptAll(viaStars).isEmpty &&
        viaStars.exceptAll(viaPairs).isEmpty, s"seed $seed")
    }
  }
}
