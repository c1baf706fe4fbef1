package graft.tools
import org.apache.spark.sql.functions._
object ProbeLsh {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.build("probe", 32)
    val e = graft.core.Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
    val base = e.select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v")).cache()
    base.count()
    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROBE $tag%-28s ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
    }
    // single 8-plane bucket (one table)
    t("bucket t0 only") {
      base.select(graft.operators.Similarity.lshBucket(col("v"), 8, 64, 0).as("b")).count()
    }
    t("all 8 buckets array") {
      base.select(posexplode(array((0 until 8).map(tt =>
        graft.operators.Similarity.lshBucket(col("v"), 8, 64, tt * 8)): _*))).count()
    }
    t("all 8 buckets array AGAIN") {
      base.select(posexplode(array((0 until 8).map(tt =>
        graft.operators.Similarity.lshBucket(col("v"), 8, 64, tt * 8)): _*))).count()
    }
    spark.stop(); sys.exit(0)
  }
}
