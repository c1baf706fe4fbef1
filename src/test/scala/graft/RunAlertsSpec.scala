package graft

import java.time.LocalDateTime

import graft.harness.{EntityViews, RunAlerts}

/** CLI surface: option parsing mirrors the reference's main.py args,
  * and run() goes catalog-tables -> entity views -> full lifecycle. */
class RunAlertsSpec extends SparkTestBase {

  test("parse covers the reference arg surface; impala args are ignored") {
    val o = RunAlerts.parse(Array(
      "-e", "exa", "--schemaExadataAux", "aux", "-g", "geo",
      "-al", "out", "-ac", "cmp", "-pl", "120",
      "-i", "impala-host", "-o", "21050",
      "--include-disabled", "--date", "2026-08-12T12:00"))
    assert(o.schemaExadata == "exa" && o.schemaExadataAux == "aux" &&
      o.schemaOpenGeo == "geo" && o.schemaAlertas == "out" &&
      o.schemaCompras == "cmp")
    assert(o.prescricaoLimiar == 120)
    assert(o.includeDisabled)
    assert(o.clock.dtCalculo == "20260812")
    intercept[IllegalArgumentException] { RunAlerts.parse(Array("--bogus")) }
  }

  test("run(): catalog tables through EntityViews into the full lifecycle") {
    // stage the fixture world as real catalog tables under the four
    // source schemas, exactly how a deployment's metastore looks
    DomainFixtures.registerAll(spark)
    val schemaOf = Map(
      "exadata" -> EntityViews.exadata,
      "exadata_aux" -> EntityViews.exadataAux,
      "opengeo" -> EntityViews.openGeo,
      "compras" -> EntityViews.compras)
    (schemaOf.keys.toSeq :+ "alertas_out").foreach { db =>
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
      val loc = java.nio.file.Files.createTempDirectory(s"graft_$db")
      spark.sql(s"CREATE DATABASE $db LOCATION '$loc'")
    }
    schemaOf.foreach { case (db, views) =>
      views.foreach { case (view, table) =>
        spark.table(view).write.format("parquet").saveAsTable(s"$db.$table")
      }
    }
    // drop the temp views so run() can only succeed via the catalog
    (EntityViews.exadata ++ EntityViews.exadataAux ++ EntityViews.openGeo ++
      EntityViews.compras).foreach { case (view, _) =>
      spark.catalog.dropTempView(view)
    }

    RunAlerts.run(spark, RunAlerts.Options(
      schemaExadata = "exadata", schemaExadataAux = "exadata_aux",
      schemaOpenGeo = "opengeo", schemaAlertas = "alertas_out",
      schemaCompras = "compras",
      clock = graft.harness.RunClock(LocalDateTime.of(2026, 8, 12, 12, 0))))

    assert(spark.table("alertas_out.mmps_alertas_mgp").count() == 15)
    assert(spark.table("alertas_out.mmps_alertas_ro").count() == 2)
    assert(spark.table("alertas_out.mmps_alertas_tipos").count() == 25)
    (schemaOf.keys.toSeq :+ "alertas_out")
      .foreach(db => spark.sql(s"DROP DATABASE $db CASCADE"))
  }
}
