package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import org.apache.spark.sql.graftext.{CosineSim, Slugify}

/** The library's SparkSessionExtensions entry point: injects the
  * custom codegen'd expressions into the function registry so plain
  * SQL users get them on any session started with
  * `--conf spark.sql.extensions=graft.GraftExtensions` — the
  * deployment-grade registration (survives `spark.sql(...)`-only
  * clients, thriftserver, notebooks), vs the per-session
  * `Slugify.register` the reference's `spark.udf.register` maps to. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("slugify"),
      new ExpressionInfo(classOf[Slugify].getName, "slugify"),
      exprs => Slugify(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      exprs => CosineSim(exprs(0), exprs(1))))
  }
}
