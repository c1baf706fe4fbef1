package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Per-dimension mean of an embedding column — the centroid of an IVF
  * cell, i.e. the coarse-quantizer training step a vector index needs
  * (operators/Similarity.ivfTopK assigns cells; this trains them).
  *
  * Expressed as a typed [[Aggregator]] (the Spark-native UDAF form —
  * the reference has no UDAF/UDTF, SURVEY.md §2.8 F3, so this is
  * engine-extension surface): partial aggregation is a per-partition
  * running (sum-vector, count), merge is vector addition, so the
  * shuffle carries one buffer per (group × partition) — never the
  * embeddings themselves. Buffers accumulate in doubles regardless of
  * the (float) input width, keeping merge-order error at double-ulp
  * scale.
  */
case class CentroidBuffer(sums: Array[Double], n: Long)

object CentroidAggregator
    extends Aggregator[Array[Float], CentroidBuffer, Array[Double]] {

  def zero: CentroidBuffer = CentroidBuffer(Array.empty, 0L)

  def reduce(b: CentroidBuffer, a: Array[Float]): CentroidBuffer =
    if (a == null) b
    else {
      val s = if (b.sums.isEmpty) new Array[Double](a.length) else b.sums
      var i = 0
      while (i < a.length && i < s.length) { s(i) += a(i); i += 1 }
      CentroidBuffer(s, b.n + 1)
    }

  def merge(x: CentroidBuffer, y: CentroidBuffer): CentroidBuffer =
    if (x.n == 0) y
    else if (y.n == 0) x
    else {
      val s = x.sums.clone()
      var i = 0
      while (i < s.length && i < y.sums.length) { s(i) += y.sums(i); i += 1 }
      CentroidBuffer(s, x.n + y.n)
    }

  def finish(b: CentroidBuffer): Array[Double] =
    if (b.n == 0L) Array.empty else b.sums.map(_ / b.n)

  def bufferEncoder: Encoder[CentroidBuffer] = Encoders.product[CentroidBuffer]
  def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}

object Centroid {
  /** DataFrame-side aggregate column: `centroid(embeddingCol)`. */
  def centroid: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(CentroidAggregator)

  def apply(c: Column): Column = centroid(c)

  /** SQL surface, mirroring how the reference registers its UDFs. */
  def register(spark: SparkSession): Unit =
    spark.udf.register("centroid", centroid)
}
