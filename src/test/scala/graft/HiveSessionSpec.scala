package graft

import java.time.LocalDateTime

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.harness.{AlertHarness, RunClock, VadfAlert}

/** GraftSession's Hive mode (reference base.py:10-14): the alert
  * lifecycle must run unchanged against a Hive-metastore catalog.
  *
  * Catalog choice is a static conf, so this suite tears down whatever
  * shared session exists, boots a Hive-enabled one (embedded Derby
  * metastore in a temp dir), runs a single-alert lifecycle through the
  * harness, and restores a clean slate for the suites that follow —
  * sbt runs forked test suites serially, so the swap is safe.
  */
class HiveSessionSpec extends AnyFunSuite {

  private def freshSession(hive: Boolean): SparkSession = {
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val tmp = java.nio.file.Files.createTempDirectory("graft_hive").toString
    System.setProperty("javax.jdo.option.ConnectionURL",
      s"jdbc:derby:;databaseName=$tmp/metastore_db;create=true")
    System.setProperty("derby.system.home", tmp)
    graft.core.GraftSession.build("graft-hive-test", 4, hive = hive)
  }

  test("alert lifecycle runs against a Hive-enabled session") {
    val spark = freshSession(hive = true)
    try {
      assert(spark.conf.get("spark.sql.catalogImplementation") == "hive")
      DomainFixtures.registerAll(spark)
      val clock = RunClock(LocalDateTime.of(2026, 8, 12, 12, 0))
      val h = new AlertHarness(spark, "hive_t", clock)
      h.dropTemps(Seq("mmps_alertas_mgp"))
      h.appendTemp(VadfAlert, "mmps_alertas_mgp")
      h.finalize("mmps_alertas_mgp")
      assert(spark.table("hive_t.mmps_alertas_mgp").count() == 1)
      assert(spark.table("hive_t.hist_mmps_alertas_mgp").count() == 1)
      spark.sql("DROP DATABASE hive_t CASCADE")
    } finally {
      // hand the remaining suites a clean in-memory-catalog slate
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  test("RunAlerts.run (the full runAll lifecycle) against a real Derby " +
      "metastore: Hive source tables -> entity views -> every detector") {
    import graft.harness.{EntityViews, RunAlerts}
    val spark = freshSession(hive = true)
    try {
      assert(spark.conf.get("spark.sql.catalogImplementation") == "hive")
      // stage the fixture world as HIVE-metastore tables under the
      // four source schemas — the reference deployment's exact shape
      // (its base.py session is Hive-first; the in-memory-catalog
      // RunAlertsSpec case can't exercise the metastore codepath)
      DomainFixtures.registerAll(spark)
      val schemaOf = Map(
        "hexadata" -> EntityViews.exadata,
        "hexadata_aux" -> EntityViews.exadataAux,
        "hopengeo" -> EntityViews.openGeo,
        "hcompras" -> EntityViews.compras)
      (schemaOf.keys.toSeq :+ "halertas_out").foreach { db =>
        spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
        val loc = java.nio.file.Files.createTempDirectory(s"graft_$db")
        spark.sql(s"CREATE DATABASE $db LOCATION '$loc'")
      }
      schemaOf.foreach { case (db, views) =>
        views.foreach { case (view, table) =>
          spark.table(view).write.format("parquet").saveAsTable(s"$db.$table")
        }
      }
      (EntityViews.exadata ++ EntityViews.exadataAux ++
        EntityViews.openGeo ++ EntityViews.compras).foreach {
        case (view, _) => spark.catalog.dropTempView(view)
      }
      RunAlerts.run(spark, RunAlerts.Options(
        schemaExadata = "hexadata", schemaExadataAux = "hexadata_aux",
        schemaOpenGeo = "hopengeo", schemaAlertas = "halertas_out",
        schemaCompras = "hcompras",
        clock = RunClock(LocalDateTime.of(2026, 8, 12, 12, 0))))
      // the same planted-world totals RunAlertsSpec pins in-memory
      assert(spark.table("halertas_out.mmps_alertas_mgp").count() == 15)
      assert(spark.table("halertas_out.mmps_alertas_ro").count() == 2)
      assert(spark.table("halertas_out.mmps_alertas_tipos").count() == 25)
      // and the lifecycle's hist tables landed in the METASTORE
      // catalog (partitioned managed tables, the S6-S8 path)
      assert(spark.table("halertas_out.hist_mmps_alertas_mgp").count() == 15)
      (schemaOf.keys.toSeq :+ "halertas_out")
        .foreach(db => spark.sql(s"DROP DATABASE $db CASCADE"))
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
