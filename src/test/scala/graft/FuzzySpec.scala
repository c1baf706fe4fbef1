package graft

import org.apache.spark.sql.functions._
import graft.operators.Fuzzy

/** Contracts for the deletion-neighborhood edit-distance join:
  * exactness vs the naive cross-join form (the FastSS blocking theorem
  * in executable form), the d=2 generalization, and the
  * quadratic-flood bucket cap. */
class FuzzySpec extends SparkTestBase {

  // every edit kind at distance 1 from "kettle", plus controls at
  // distance 2 ("cattle" sub+sub? no: k->c, e->a = 2) and far away
  private val names = Seq(
    1L -> "kettle",   // identity
    2L -> "ketle",    // deletion
    3L -> "kettles",  // insertion
    4L -> "kittle",   // substitution
    5L -> "cattle",   // distance 2
    6L -> "zebra")    // far

  private def naive(maxDist: Int): Set[(Long, Long, Int)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      (ia, sa) <- names; (ib, sb) <- names
      dd = lev(sa, sb) if dd <= maxDist
    } yield (ia, ib, dd)).toSet
  }

  private def run(maxDist: Int, maxBucket: Int = 10000): Set[(Long, Long, Int)] = {
    import spark.implicits._
    val df = names.toDF("id", "s")
    Fuzzy.editDistanceJoin(df, "id", "s", df.select(col("id").as("id2"),
        col("s").as("s2")), "id2", "s2", maxDist, maxBucket)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("d=1 join equals the naive cross-join filter (blocking is exact)") {
    assert(run(1) == naive(1))
  }

  test("d=2 join equals the naive cross-join filter") {
    assert(run(2) == naive(2))
  }

  test("empty and single-char strings are handled") {
    import spark.implicits._
    val df = Seq(1L -> "", 2L -> "a", 3L -> "b", 4L -> "ab").toDF("id", "s")
    val got = Fuzzy.editDistanceJoin(df, "id", "s",
        df.select(col("id").as("id2"), col("s").as("s2")), "id2", "s2", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // "" ~ "a", "" ~ "b" (insertion); "a" ~ "b" (substitution);
    // "a" ~ "ab", "b" ~ "ab" (insertion); plus identities
    val want = Set((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L),
      (1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (2L, 3L), (3L, 2L),
      (2L, 4L), (4L, 2L), (3L, 4L), (4L, 3L))
    assert(got == want)
  }

  test("flooded variant bucket is dropped and counted, not joined") {
    import spark.implicits._
    // 300 identical strings on the right: every deletion variant
    // bucket holds 300 members — all over a cap of 100, so candidate
    // generation must drop them instead of emitting 300x300 pairs
    val left = Seq(1L -> "flood").toDF("id", "s")
    val right = (1L to 300L).map(i => (i, "flood")).toDF("id2", "s2")
    val got = Fuzzy.editDistanceJoin(left, "id", "s", right, "id2", "s2",
      maxDist = 1, maxBucket = 100)
    assert(got.count() == 0)
    assert(Fuzzy.lastFuzzyDroppedBuckets > 0)
    // under-cap corpus reports zero drops
    Fuzzy.editDistanceJoin(left, "id", "s",
      right.limit(5), "id2", "s2", 1, 100).count()
    assert(Fuzzy.lastFuzzyDroppedBuckets == 0)
  }
}
