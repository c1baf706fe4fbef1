package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PortableHash

/** Deterministic sampling and dataset splitting for training corpora.
  *
  * `Dataset.sample` draws from a per-partition RNG: resplitting the
  * input changes the sample, which is unacceptable for reproducible
  * corpus construction. These operators instead key every decision on
  * a content-derived hash — the same row lands in the same
  * sample/split on any cluster, any partitioning, any engine (the
  * hash is [[PortableHash]], so the decisions are SQL-oracle-able).
  *
  * Scale: a narrow filter/projection over the id column — no shuffle,
  * fully codegen'd, prunes before any downstream work.
  */
object Sampling {

  private def bucket(idCol: Column, buckets: Int, salt: String): Column =
    pmod(PortableHash.hash60(concat(idCol.cast("string"), lit(salt))), lit(buckets))

  private def bucketSql(idExpr: String, buckets: Int, salt: String): String =
    s"${PortableHash.hash60Sql(s"concat(CAST($idExpr AS VARCHAR), '$salt')")} % $buckets"

  /** Keep a deterministic `pct`-percent sample keyed on the id. */
  def hashSample(df: DataFrame, idCol: String, pct: Int,
                 salt: String = ""): DataFrame =
    df.filter(bucket(col(idCol), 100, salt) < pct)

  def hashSampleSql(idExpr: String, pct: Int, salt: String = ""): String =
    s"${bucketSql(idExpr, 100, salt)} < $pct"

  /** Assign every row to a named split by cumulative percentage
    * (e.g. Seq("train" -> 90, "valid" -> 5, "test" -> 5)). The split
    * column is stable under repartitioning and across engines. */
  def hashSplit(df: DataFrame, idCol: String, splits: Seq[(String, Int)],
                salt: String = ""): DataFrame = {
    require(splits.map(_._2).sum == 100, "split percentages must sum to 100")
    val b = bucket(col(idCol), 100, salt)
    val cums = splits.scanLeft(0)(_ + _._2).tail
    val expr = splits.zip(cums).foldRight(lit(null).cast("string")) {
      case (((name, _), cum), acc) => when(b < cum, name).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  def hashSplitSql(idExpr: String, splits: Seq[(String, Int)],
                   salt: String = ""): String = {
    val b = bucketSql(idExpr, 100, salt)
    val cums = splits.scanLeft(0)(_ + _._2).tail
    val branches = splits.zip(cums)
      .map { case ((name, _), cum) => s"WHEN ($b) < $cum THEN '$name'" }
    s"CASE ${branches.mkString(" ")} END"
  }

  /** Per-stratum sampling rates — the corpus-balancing op (e.g.
    * downsample over-represented languages or sources): the keep
    * decision is the same content-hash bucket as [[hashSample]], but
    * compared against a per-stratum percentage from a literal CASE
    * chain. Still a narrow codegen'd filter — the stratum column is
    * already on the row, so no join, no shuffle, and the same row is
    * kept or dropped identically on any partitioning. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       rates: Seq[(String, Int)], defaultPct: Int,
                       salt: String = ""): DataFrame = {
    val rate = rates.foldRight(lit(defaultPct)) { case ((s, p), acc) =>
      when(col(stratumCol) === s, lit(p)).otherwise(acc)
    }
    df.filter(bucket(col(idCol), 100, salt) < rate)
  }

  def stratifiedSampleSql(idExpr: String, stratumExpr: String,
                          rates: Seq[(String, Int)], defaultPct: Int,
                          salt: String = ""): String = {
    val branches = rates
      .map { case (s, p) => s"WHEN $stratumExpr = '$s' THEN $p" }
    s"${bucketSql(idExpr, 100, salt)} < " +
      s"(CASE ${branches.mkString(" ")} ELSE $defaultPct END)"
  }
}
