package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit — the pipeline gate that runs before
  * a table is published (completeness, uniqueness, ranges, set
  * membership). All constraints evaluate in ONE aggregation pass over
  * the input: each constraint contributes a metric expression to a
  * single agg, and the one result row unpivots via `stack` to a skinny
  * (constraint, metric, threshold, passed) table. No per-constraint
  * jobs, no collect — at 100 TB the audit costs one scan regardless
  * of how many constraints it carries.
  *
  * Every check is a min-fraction contract: `metric >= threshold`
  * passes. Uniqueness uses exact count(DISTINCT) — Catalyst plans
  * multi-distinct aggregates via expand, still one pass over the scan.
  */
object QualityChecks {

  sealed trait Check {
    def name: String
    /** fraction metric in [0, 1], aggregated over the table */
    def metric: Column
    /** minimum fraction for the check to pass */
    def threshold: Double
  }

  /** Fraction of non-null values. */
  final case class Complete(colName: String, threshold: Double = 1.0)
      extends Check {
    val name = s"complete($colName)"
    def metric: Column =
      sum(when(col(colName).isNotNull, 1L).otherwise(0L)).cast("double") /
        count(lit(1))
  }

  /** Distinct fraction (1.0 = primary key). */
  final case class Unique(colName: String, threshold: Double = 1.0)
      extends Check {
    val name = s"unique($colName)"
    def metric: Column =
      countDistinct(col(colName)).cast("double") / count(lit(1))
  }

  /** Fraction of values inside [lo, hi] (NULLs don't violate ranges —
    * pair with [[Complete]] to also forbid them). */
  final case class InRange(colName: String, lo: Double, hi: Double,
                           threshold: Double = 1.0) extends Check {
    val name = s"in_range($colName)"
    def metric: Column =
      sum(when(col(colName).isNull ||
        (col(colName) >= lo && col(colName) <= hi), 1L).otherwise(0L))
        .cast("double") / count(lit(1))
  }

  /** Fraction of values inside the allowed set (NULLs as in InRange). */
  final case class InSet(colName: String, allowed: Seq[String],
                         threshold: Double = 1.0) extends Check {
    val name = s"in_set($colName)"
    def metric: Column =
      sum(when(col(colName).isNull || col(colName).isin(allowed: _*), 1L)
        .otherwise(0L)).cast("double") / count(lit(1))
  }

  /** Run every check in one aggregation pass; returns
    * (constraint, metric, threshold, passed) rows. */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      round(c.metric, 6).as(s"m_$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // typed-Column unpivot (explode over an array of structs) instead
    // of a generated stack()/SQL string: check names embed raw column
    // names and InSet carries caller values — interpolating either
    // into SQL would break on a single quote
    val rows = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("constraint"), col(s"m_$i").as("metric"),
        lit(c.threshold).cast("double").as("threshold"))
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.constraint").as("constraint"), col("r.metric").as("metric"),
        col("r.threshold").as("threshold"))
      .withColumn("passed", col("metric") >= col("threshold"))
  }
}
