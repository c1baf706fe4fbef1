package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Coalesce, Concat,
  Encode, Expression, ExpressionInfo, Literal, RegExpReplace, Sha1}
import org.apache.spark.sql.types.StringType

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
    // the reference's per-row key UDF (its spark.udf.register surface);
    // here a composition of codegen'd built-ins, not a UDF. Built as a
    // native expression tree (a Column-node bridge would not resolve
    // through the registry path): sha1(utf8(concat(asciiClean(args))))
    // with the same render/limpa semantics as core.AlertKey.uuidsha
    // (AlertKeySpec pins their agreement).
    ext.injectFunction((
      new FunctionIdentifier("uuidsha"),
      new ExpressionInfo(graft.core.AlertKey.getClass.getName, "uuidsha"),
      exprs => {
        val cleaned: Seq[Expression] = exprs.map { e =>
          RegExpReplace(Coalesce(Seq(Cast(e, StringType), Literal(""))),
            Literal("[^\\x00-\\x7F]"), Literal(""))
        }
        Sha1(Encode(Concat(cleaned), Literal("UTF-8")))
      }))
  }
}
