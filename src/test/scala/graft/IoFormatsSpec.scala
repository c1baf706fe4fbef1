package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Source/sink format coverage: the engine reads and writes parquet
  * (primary), ORC, CSV, and JSON with value fidelity. Parquet/ORC are
  * the columnar scale paths (pushdown + pruning); CSV/JSON are the
  * ingest interchange forms. */
class IoFormatsSpec extends SparkTestBase {

  private lazy val sample = Tables.load(spark, sfDir, "orders")
    .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")

  private def roundTrip(fmt: String, opts: Map[String, String]): Unit = {
    val dir = Files.createTempDirectory(s"graft_io_$fmt").toString + "/t"
    sample.write.options(opts).format(fmt).save(dir)
    val back = spark.read.options(opts).format(fmt)
      .schema(sample.schema).load(dir)
    assert(back.count() == sample.count(), s"$fmt rowcount")
    assert(back.exceptAll(sample).isEmpty && sample.exceptAll(back).isEmpty,
      s"$fmt values")
  }

  test("parquet round-trip preserves values")(roundTrip("parquet", Map()))
  test("orc round-trip preserves values")(roundTrip("orc", Map()))
  test("csv round-trip preserves values")(
    roundTrip("csv", Map("header" -> "true")))
  test("json round-trip preserves values")(roundTrip("json", Map()))

  test("parquet filter pushdown works through a written sink") {
    val dir = Files.createTempDirectory("graft_io_pd").toString + "/t"
    sample.write.format("parquet").save(dir)
    val plan = spark.read.parquet(dir)
      .filter(col("o_totalprice") > 100000)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice,100000.0)]"),
      s"pushdown missing in:\n$plan")
  }
}
