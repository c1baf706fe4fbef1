package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Similarity

/** The custom CosineSim expression must be bit-identical to the
  * built-ins-only formulation (both are sequential left-to-right double
  * sums) — this is what keeps the DuckDB oracle valid. */
class VectorExprSpec extends SparkTestBase {

  test("CosineSim == composable cosine, bit-exact, on real embeddings") {
    val e = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val a = e.select(col("vec_id").as("ia"), col("v").as("va"))
    val b = e.select(col("vec_id").as("ib"), col("v").as("vb"))
    val pairs = a.join(b, col("ia") < col("ib") && col("ib") < col("ia") + 7)
    val diffs = pairs.select(
        Similarity.cosine(col("va"), col("vb")).as("custom"),
        Similarity.cosineComposable(col("va"), col("vb")).as("composed"))
      .filter(col("custom") =!= col("composed"))
      .count()
    assert(diffs == 0)
  }

  test("CosineSim interpreted eval matches codegen path") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(3.0, 2.0, 1.0))).toDF("a", "b")
    val v = df.select(Similarity.cosine(col("a"), col("b"))).head.getDouble(0)
    val expected = 10.0 / (math.sqrt(14.0) * math.sqrt(14.0))
    assert(math.abs(v - expected) < 1e-15)
  }
}
