package graft.tools

import org.apache.spark.sql.functions._
import graft.DomainFixtures
import graft.harness.{AlertRegistry, RunClock}

/** Detector-harness scale bench (test scope — reuses the
  * DomainFixtures golden world): builds N structure-preserving copies
  * of the MPRJ entity fixtures with every document-graph key shifted
  * per copy (dimension tables — organs, classes, people, aux — stay
  * shared, so a 10× world models 10× the caseload on the same org
  * population), then times the FULL alert lifecycle
  * (`AlertRegistry.runAll`: temp → final → hist, all detectors) per
  * scale in ONE session.
  *
  * Detectors are per-doc or per-org-quantile shaped, and copies leave
  * every org's value DISTRIBUTION unchanged, so alert rows must grow
  * exactly linearly with copies — printed as the built-in canary: a
  * super-linear row count would mean a cross-copy join leak (a key
  * missed below), a sub-linear one a detector quietly capping.
  *
  * Usage: sbt "Test/runMain graft.tools.HarnessScale 1,10 [reps]"
  */
object HarnessScale {

  /** fact view -> key columns shifted per copy (the document graph). */
  val factKeys: Seq[(String, Seq[String])] = Seq(
    "documento" -> Seq("docu_dk"),
    "vista" -> Seq("vist_dk", "vist_docu_dk"),
    "mcpr_andamento" -> Seq("pcao_dk", "pcao_vist_dk"),
    "mcpr_sub_andamento" -> Seq("stao_dk", "stao_pcao_dk"),
    "mcpr_item_movimentacao" -> Seq("item_dk", "item_docu_dk", "item_movi_dk"),
    "mcpr_movimentacao" -> Seq("movi_dk"),
    "mcpr_personagem" -> Seq("pers_dk", "pers_docu_dk"),
    "mcpr_correlacionamento" -> Seq("corr_docu_dk2"),
    "mcpr_assunto_documento" -> Seq("asdo_docu_dk"),
    "gate_info_tecnica" -> Seq("itcn_dk", "itcn_docu_dk"))

  private val stride = 1000000L

  /** (Re-)register the fixture world, then overwrite each fact view
    * with `copies` key-shifted copies of itself. Safe to call
    * repeatedly: registerAll rebuilds the base views from literals
    * first, and each scaled frame is snapshotted (localCheckpoint)
    * before re-registering over the same view name. */
  def scaleWorld(spark: org.apache.spark.sql.SparkSession, copies: Int): Unit = {
    DomainFixtures.registerAll(spark)
    if (copies > 1) {
      factKeys.foreach { case (view, keys) =>
        val base = spark.table(view).localCheckpoint(true)
        val maxes = keys.map(k => max(col(k).cast("long")))
        val maxKey = base.agg(
          if (maxes.size == 1) maxes.head else greatest(maxes: _*))
          .first().getLong(0)
        require(maxKey < stride,
          s"$view key $maxKey >= stride $stride — copies would collide")
        val all = (0 until copies).map { c =>
          if (c == 0) base
          else keys.foldLeft(base)((df, k) =>
            df.withColumn(k,
              (col(k) + lit(c * stride)).cast(base.schema(k).dataType)))
        }.reduce(_ unionByName _)
        all.localCheckpoint(true).createOrReplaceTempView(view)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val copiesList = args(0).split(",").map(_.toInt).toSeq
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.core.GraftSession.build("graft-harness-scale",
      graft.core.GraftSession.envCores)
    val clock = RunClock(java.time.LocalDateTime.of(2026, 8, 12, 12, 0))

    def runOnce(label: String): (Double, Long) = {
      val db = s"hs_$label"
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
      val loc = java.nio.file.Files.createTempDirectory(s"graft_hs_$label")
      spark.sql(s"CREATE DATABASE $db LOCATION '$loc'")
      val t0 = System.nanoTime()
      AlertRegistry.runAll(spark, db, clock, includeDisabled = true)
      val t = (System.nanoTime() - t0) / 1e9
      val rows = Seq(AlertRegistry.MgpTable, AlertRegistry.RoTable,
        AlertRegistry.CompTable, AlertRegistry.IspsTable,
        AlertRegistry.Abr1Table)
        .map(tb => spark.table(s"$db.$tb").count()).sum
      spark.sql(s"DROP DATABASE $db CASCADE")
      (t, rows)
    }

    // warmup: JIT + codegen + catalog paths, untimed
    scaleWorld(spark, 1)
    runOnce("warmup")
    spark.catalog.clearCache()

    val cells = copiesList.map { copies =>
      val times = (1 to reps).map { r =>
        scaleWorld(spark, copies) // rebuild per rep: identical start state
        val (t, rows) = runOnce(s"c$copies")
        spark.catalog.clearCache()
        println(f"HARNESS copies=$copies rep=$r t=$t%.2f alert_rows=$rows")
        (t, rows)
      }
      val rows = times.head._2
      require(times.forall(_._2 == rows), "nondeterministic alert rows")
      println(f"HARNESS copies=$copies min=${times.map(_._1).min}%.2f rows=$rows")
      s""""$copies":{"min":${times.map(_._1).min},"rows":$rows}"""
    }
    println(cells.mkString("{", ",", "}"))
    spark.stop()
    sys.exit(0)
  }
}
