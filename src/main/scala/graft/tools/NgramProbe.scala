package graft.tools

import org.apache.spark.sql.functions._

/** Stage-level cost breakdown of q36 (Dedup.ngramJaccard, round-8
  * shape): shingle index build (explode + corpus distinct),
  * document-frequency filter + n_g attach, and the pair join + count
  * with the jaccard filter on the aggregate output.
  * Usage: runMain graft.tools.NgramProbe <sfDir> */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    import graft.queries.PipelineQueries.{NgramN => n, NgramMaxDocFreq, NgramMinJaccard}
    val spark = graft.core.GraftSession.build("ngram-probe", graft.core.GraftSession.envCores)
    val df = graft.core.Tables.load(spark, sfDir, "documents")
    df.count()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"NGRAM $label%-22s ${(System.nanoTime() - t0) / 1e9}%.2f"); r
    }
    val idCol = "doc_id"; val textCol = "text"
    val shingles = t("shingle-index")(df
      .select(col(idCol), split(col(textCol), " ").as("ws"))
      .filter(size(col("ws")) >= n)
      .select(col(idCol), explode(expr(
        s"transform(sequence(1, size(ws) - ${n - 1}), " +
          s"i -> concat_ws(' ', ${(0 until n).map(j => s"element_at(ws, i + $j)").mkString(", ")}))"))
        .as("g"))
      .distinct()
      .localCheckpoint(true))
    println(s"NGRAM shingle_rows           ${shingles.count()}")
    val perDoc = shingles.groupBy(col(idCol)).agg(count(lit(1)).as("n_g"))
    val filtered = t("df-filter+ng-attach")(shingles.join(
        shingles.groupBy("g").agg(count(lit(1)).as("df_g"))
          .filter(col("df_g") <= NgramMaxDocFreq).select("g"),
        Seq("g"))
      .join(perDoc, Seq(idCol))
      .localCheckpoint(true))
    println(s"NGRAM filtered_rows          ${filtered.count()}")
    val a = filtered.select(col(idCol).as("id_a"), col("n_g").as("n_a"), col("g"))
    val b = filtered.select(col(idCol).as("id_b"), col("n_g").as("n_b"), col("g"))
    val out = t("pair-join+jaccard")(
      a.join(b, Seq("g")).filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b").agg(count(lit(1)).as("shared"))
        .select(col("id_a"), col("id_b"),
          round(col("shared").cast("double") /
            (col("n_a") + col("n_b") - col("shared")), 6).as("jaccard"))
        .filter(col("jaccard") >= NgramMinJaccard).count())
    println(s"NGRAM out_rows               $out")
    spark.catalog.clearCache()
    t("full q36")(graft.SparkEntry.queries("q36_ngram_jaccard")(spark, sfDir).count())
    t("full q36 again")(graft.SparkEntry.queries("q36_ngram_jaccard")(spark, sfDir).count())
    spark.stop(); sys.exit(0)
  }
}
