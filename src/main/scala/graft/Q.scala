package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Central query registry: merges every per-domain inventory. */
object Q {
  val registry: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.registry ++ PipelineQueries.registry ++
      HarnessQueries.registry ++ ExtensionQueries.registry ++
      ScaleQueries.registry ++ SqlFeatureQueries.registry

  val oracles: Map[String, String] =
    RelationalQueries.oracles ++ PipelineQueries.oracles ++
      HarnessQueries.oracles ++ ExtensionQueries.oracles ++
      ScaleQueries.oracles ++ SqlFeatureQueries.oracles

  def q01_agg(spark: SparkSession, dir: String): DataFrame =
    registry("q01_agg")(spark, dir)
}
