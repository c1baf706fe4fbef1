package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph
import graft.operators.TextAnalysis

/** Hand-computed fixtures for the link-graph and retrieval scorers. */
class GraphSpec extends SparkTestBase {

  test("pageRank matches hand-iterated values on chain, cycle, and star") {
    import spark.implicits._
    // three disjoint components: chain 1->2, cycle 3<->4,
    // star {5,6,7}->8 (dangling hub: leaks mass, stays rank-heavy)
    val edges = Seq(
      (1L, 2L),
      (3L, 4L), (4L, 3L),
      (5L, 8L), (6L, 8L), (7L, 8L)
    ).toDF("src", "dst")
    val got = Graph.pageRank(edges, "src", "dst", iters = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // hand iteration at d=0.85, per-round 6-decimal rounding:
    //   sources with no in-edges settle at round(0.15, 6)
    //   cycle members: 0.15 + 0.85*1.0 = 1.0 every round
    //   chain sink: round1 1.0, round2 0.15 + 0.85*0.15 = 0.2775
    //   star hub: round1 0.15+0.85*3 = 2.7, round2 0.15+0.85*0.45 = 0.5325
    val want = Map(
      1L -> 0.15, 2L -> 0.2775,
      3L -> 1.0, 4L -> 1.0,
      5L -> 0.15, 6L -> 0.15, 7L -> 0.15, 8L -> 0.5325)
    assert(got.keySet == want.keySet)
    want.foreach { case (n, r) =>
      assert(math.abs(got(n) - r) < 1e-9, s"node $n: ${got(n)} != $r")
    }
  }

  test("pageRank dedupes parallel edges and a longer run stays bounded") {
    import spark.implicits._
    // duplicate edges must count once in the out-degree
    val edges = Seq((1L, 2L), (1L, 2L), (2L, 1L)).toDF("src", "dst")
    val got = Graph.pageRank(edges, "src", "dst", iters = 7)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // symmetric pair: fixed point 1.0 on both, any iteration count
    // (also exercises the periodic lineage checkpoint at i=3,6)
    assert(got == Map(1L -> 1.0, 2L -> 1.0))
  }

  test("pageRank with a reliable checkpoint dir: same ranks, files written") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pr-ckpt").toString
    val edges = Seq((1L, 2L), (3L, 4L), (4L, 3L), (5L, 8L), (6L, 8L),
      (7L, 8L)).toDF("src", "dst")
    // iters=4 so the periodic in-loop barrier (i % 3) also takes the
    // reliable path, not just the three static checkpoints
    val local = Graph.pageRank(edges, "src", "dst", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val reliable = Graph.pageRank(edges, "src", "dst", iters = 4,
        checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(reliable == local,
      s"reliable-checkpoint path changed ranks: $reliable vs $local")
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(p => java.nio.file.Files.isRegularFile(p)).count()
    assert(wrote > 0, "expected reliable checkpoint files under the dir")
  }

  test("bm25 matches the closed-form score on a planted corpus") {
    import spark.implicits._
    val docs = Seq((1L, "x x y"), (2L, "x z z z")).toDF("doc_id", "text")
    val got = TextAnalysis.bm25(docs, "doc_id", "text", Seq("x", "y"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val (k1, b) = (1.2, 0.75)
    val avgdl = 3.5
    def s(tf: Long, dl: Int, df: Long, n: Long): Double =
      math.log(1.0 + (n - df + 0.5) / (df + 0.5)) *
        (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
    val want1 = s(2, 3, 2, 2) + s(1, 3, 1, 2) // x twice + y once
    val want2 = s(1, 4, 2, 2)                 // x once
    assert(math.abs(got(1L) - want1) < 1e-5)
    assert(math.abs(got(2L) - want2) < 1e-5)
    // the doc matching the rare term must outrank the common-term doc
    assert(got(1L) > got(2L))
  }

  test("hits matches the hand-computed fixed point on a planted graph") {
    import spark.implicits._
    // 1→3, 2→3, 2→4: node 3 is the stronger authority (two in-links),
    // node 2 the stronger hub (points at both authorities).
    // Hand-unrolled with the FACTORED recurrence (un-normalized auth
    // aggregate feeds the hub sum; hubs normalize per round, auths
    // once at the end):
    //   iter1: araw 3=2.0 4=1.0; hraw 1=2.0 2=3.0 → hub 1=0.666667 2=1.0
    //   iter2: araw 3=1.666667 4=1.0; hraw 1=1.666667 2=2.666667
    //          → hub 1=0.625 2=1.0; auth (from araw_2) 3=1.0 4=0.6
    val edges = Seq((1L, 3L), (2L, 3L), (2L, 4L)).toDF("src", "dst")
    val out = Graph.hits(edges, "src", "dst", iters = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(out(1L) == ((0.625, 0.0)))
    assert(out(2L) == ((1.0, 0.0)))
    assert(out(3L) == ((0.0, 1.0)))
    assert(out(4L) == ((0.0, 0.6)))
  }

  test("partitionedBarrier: downstream keyed aggregate reuses the layout (0 Exchange)") {
    // Dataset.localCheckpoint under AQE records UnknownPartitioning in
    // the LogicalRDD, so the iterative operators' "pre-partitioned
    // statics" silently re-exchanged every round on Spark 4 — the
    // round-17 AQE-scoped barrier restores the recorded layout. This
    // pins the contract the loops lean on: a same-key aggregate over
    // the barriered frame plans ZERO exchanges (and a plain
    // localCheckpoint of the same frame plans one).
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, sum}
    val df = (1 to 500).map(i => (i.toLong % 37, i.toLong)).toDF("k", "v")
    val pinned = graft.operators.GraftCheckpoint
      .partitionedBarrier(df, Seq("k"), pinMin = 1) // force the pin path
    val agg = pinned.groupBy("k").agg(sum("v"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"barriered agg re-exchanged:\n$plan")
    // control: a plain localCheckpoint of a MULTI-partition hash
    // layout loses the partitioning (UnknownPartitioning under AQE)
    // and the same aggregate re-exchanges — the round-17 finding this
    // helper exists for (if Spark ever fixes it, retire the helper)
    val plain = df.repartition(3, col("k")).localCheckpoint(true)
      .groupBy("k").agg(sum("v"))
    plain.collect()
    assert(plain.queryExecution.executedPlan.toString.contains("Exchange"),
      "control: plain localCheckpoint unexpectedly preserved partitioning " +
        "(if Spark fixed this, partitionedBarrier can be retired)")
    // the size gate: below pinMin the helper skips the pin entirely —
    // re-exchanging a small static per round is local-block cheap and
    // the pin would cost an extra materialization. The skipped frame
    // keeps no recorded layout, so its keyed aggregate re-exchanges
    // (multi-partition input makes that observable).
    val skipped = graft.operators.GraftCheckpoint
      .partitionedBarrier(df, Seq("k"), pinMin = 99)
    val aggS = skipped.groupBy("k").agg(sum("v"))
    aggS.collect()
    if (skipped.rdd.getNumPartitions > 1)
      assert(aggS.queryExecution.executedPlan.toString.contains("Exchange"),
        "size gate: below pinMin the layout must not have been pinned")
    // values unchanged by the barrier on both paths
    val expect = df.groupBy("k").agg(sum("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(agg.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      == expect)
    assert(aggS.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq == expect)
  }

  test("partitionedBarrier: concurrent barriers both keep their layouts") {
    // The AQE scope-off is a SESSION-global conf flip; unserialized,
    // two concurrent barriers can interleave (A restores AQE while B's
    // checkpoint is still materializing) and one frame records
    // UnknownPartitioning — a silent wrong-plan (every downstream
    // iteration re-exchanges). The round-18 confScopeLock serializes
    // the flip window; this drives many barrier pairs from concurrent
    // threads and asserts EVERY result kept its layout (0 Exchange on
    // the same-key aggregate). Before the lock, this failed within a
    // few dozen rounds.
    import spark.implicits._
    import org.apache.spark.sql.functions.sum
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      (1 to 12).foreach { round =>
        val fs = (0 until 2).map { t =>
          Future {
            val df = (1 to 400).map(i => ((i + t).toLong % 31, i.toLong))
              .toDF("k", "v")
            val agg = graft.operators.GraftCheckpoint
              .partitionedBarrier(df, Seq("k"), pinMin = 1)
              .groupBy("k").agg(sum("v"))
            agg.collect()
            agg.queryExecution.executedPlan.toString
          }
        }
        fs.map(Await.result(_, Duration.Inf)).zipWithIndex.foreach {
          case (plan, t) =>
            assert(!plan.contains("Exchange"),
              s"round $round thread $t lost its pinned layout:\n$plan")
        }
      }
      // the scoped conf is restored after the last barrier
      assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    } finally pool.shutdown()
  }
}
