package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Connected-components cost breakdown for the q67 components build
  * (verified star edges, as the registry runs it): times each stage
  * and reports rounds-to-convergence plus graph shape.
  * Usage: runMain graft.tools.CcProbe <sfDir> */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val k = graft.queries.PipelineQueries.MinhashK
    val bands = graft.queries.PipelineQueries.MinhashBands
    val th = graft.queries.PipelineQueries.MinhashVerifyAgree
    val spark = graft.core.GraftSession.build("cc-probe", graft.core.GraftSession.envCores)
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    docs.count() // warm scan
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"CCPROBE $label%-22s ${(System.nanoTime() - t0) / 1e9}%.2f"); r
    }
    val sigs = t("signatures")(
      Dedup.minhashSignatures(docs, "doc_id", "text", k).localCheckpoint(true))
    val banded = t("banding")(
      Dedup.bandSignatures(sigs, "doc_id", k, bands).localCheckpoint(true))
    val centers = banded.groupBy(col("band"), col("sig"))
      .agg(min(col("doc_id")).as("center"))
    val starEdges = t("star-edges")(
      banded.join(centers, Seq("band", "sig"))
        .filter(col("doc_id") =!= col("center"))
        .select(col("doc_id").as("id_a"), col("center").as("id_b"))
        .localCheckpoint(true))
    println(s"CCPROBE star_edges_n         ${starEdges.count()}")
    val aSigs = sigs.select(col("doc_id").as("id_a") +:
      (0 until k).map(i => col(s"mh_$i").as(s"a_mh_$i")): _*)
    val bSigs = sigs.select(col("doc_id").as("id_b") +:
      (0 until k).map(i => col(s"mh_$i").as(s"b_mh_$i")): _*)
    val agree = (0 until k).map(i =>
      when(col(s"a_mh_$i") === col(s"b_mh_$i"), 1).otherwise(0)).reduce(_ + _)
    val vEdges = t("verify-edges")(
      starEdges.join(aSigs, Seq("id_a")).join(bSigs, Seq("id_b"))
        .filter(agree >= th).select(col("id_a"), col("id_b"))
        .localCheckpoint(true))
    println(s"CCPROBE verified_edges_n     ${vEdges.count()}")
    val (labels, rounds) = t("cc-total")(
      Dedup.connectedComponentsStats(vEdges, "id_a", "id_b"))
    println(s"CCPROBE cc_rounds            $rounds")
    println(s"CCPROBE clusters             ${labels.select("component").distinct().count()} labeled_docs ${labels.count()}")
    spark.catalog.clearCache()
    t("full buildComponents")(
      Dedup.buildComponents(docs, sfDir, "doc_id", "text", k, bands, Some(th)).count())
    spark.stop(); sys.exit(0)
  }
}
