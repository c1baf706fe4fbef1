package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** LSH banding recall, MEASURED against the planted Jaccard — the
  * S-curve 1-(1-s^r)^b is the entire justification for banding at
  * 100 TB (it is what lets candidate generation be an equi-join
  * instead of all-pairs), so pin it empirically at the registry's
  * parameters (imported from PipelineQueries so the spec can never
  * drift from what q33/q61/q100 actually run).
  *
  * Planting: per target similarity s, 150 independent (A, B) pairs
  * with |A|=|B|=100 words, sharing m = 200s/(1+s) words so
  * J(A,B) = m/(200-m) ≈ s; every pair's vocabulary is disjoint from
  * every other pair's, so the ONLY possible candidates are the planted
  * pairs themselves (asserted: zero cross-pair candidates).
  */
class LshRecallSpec extends SparkTestBase {

  private val K = graft.queries.PipelineQueries.MinhashK
  private val Bands = graft.queries.PipelineQueries.MinhashBands
  private val PairsPerBucket = 150

  // m chosen so the realized Jaccard m/(200-m) lands on the target
  private val buckets = Seq(0.3 -> 46, 0.5 -> 67, 0.7 -> 82, 0.9 -> 95)

  private def theory(s: Double): Double = {
    val r = K / Bands
    1.0 - math.pow(1.0 - math.pow(s, r), Bands)
  }

  test("banding recall follows the S-curve at the registry parameters, >= 0.9 at J=0.9") {
    import spark.implicits._
    // doc ids: pair p of bucket q -> A = (q*PPB+p)*2, B = A+1
    val rows = for {
      (bq, (_, m)) <- buckets.zipWithIndex.map { case (b, i) => (i, b) }
      p <- 0 until PairsPerBucket
      half <- 0 to 1
    } yield {
      val pairId = bq * PairsPerBucket + p
      val words =
        if (half == 0) (0 until 100).map(j => s"w${pairId}_$j")
        else (0 until m).map(j => s"w${pairId}_$j") ++
          (m until 100).map(j => s"v${pairId}_$j")
      (pairId.toLong * 2 + half, words.mkString(" "))
    }
    val docs = rows.toDF("doc_id", "text")
    val pairs = Dedup.minhashCandidatePairs(
      Dedup.minhashSignatures(docs, "doc_id", "text", K), "doc_id", K, Bands)
      .select(col("id_a"), col("id_b")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    try {
      // disjoint vocabularies: candidates can ONLY be planted pairs
      pairs.foreach { case (a, b) =>
        assert(a / 2 == b / 2, s"cross-pair candidate ($a, $b)")
      }
      val hitPairIds = pairs.map(_._1 / 2).toSet
      val measured = buckets.zipWithIndex.map { case ((s, m), bq) =>
        val ids = (0 until PairsPerBucket).map(p => (bq * PairsPerBucket + p).toLong)
        val recall = ids.count(hitPairIds).toDouble / PairsPerBucket
        val j = m.toDouble / (200 - m)
        info(f"J=$j%.3f: measured recall $recall%.3f, theory ${theory(j)}%.3f")
        (j, recall)
      }
      // monotone in similarity
      measured.sliding(2).foreach { case Seq((ja, ra), (jb, rb)) =>
        assert(ra <= rb + 1e-9, s"recall fell from J=$ja to J=$jb")
      }
      // each bucket within a generous binomial band of theory
      // (150 trials: 3-sigma ≈ 0.12 at p=0.5)
      measured.zip(buckets).foreach { case ((j, recall), _) =>
        val p = theory(j)
        val sigma = math.sqrt(p * (1 - p) / PairsPerBucket)
        assert(math.abs(recall - p) <= math.max(4 * sigma, 0.02),
          f"J=$j%.3f recall $recall%.3f is far from theory $p%.3f")
      }
      // the dedup-gate contract (round-8 fix): strong near-dups must
      // actually be caught — the quality bar the banding default is
      // CHOSEN for, not a property that falls out of it
      val atStrong = measured.last._2
      assert(measured.last._1 > 0.85, "strongest planted bucket should be ~J=0.9")
      assert(atStrong >= 0.9,
        f"recall $atStrong%.3f at J=0.9 — the banding default is not a dedup gate")
    } finally spark.catalog.clearCache()
  }
}
