package graft

import java.time.LocalDateTime
import org.apache.spark.sql.functions._
import graft.harness.{ActiveDocs, AlertHarness, BdpaAlert, RunClock}

/** Golden fixture test for the BDPA double max-per-group alert:
  * planted overdue / on-time / non-police / stale-andamento cases. */
class BdpaAlertSpec extends SparkTestBase {

  private val clock = RunClock(LocalDateTime.of(2026, 8, 12, 12, 0))

  private def d(s: String) = java.sql.Date.valueOf(s)

  private def registerFixtures(): Unit = {
    import spark.implicits._
    Seq(
      (1, "MP-1", 100, 1, 3), // overdue at police -> fires
      (2, "MP-2", 100, 1, 3), // deadline not yet passed -> no alert
      (3, "MP-3", 100, 1, 3), // routed to non-police organ -> no alert
      (4, "MP-4", 100, 1, 3)  // latest andamento is NOT a baixa -> no alert
    ).toDF("docu_dk", "docu_nr_mp", "docu_orgi_orga_dk_responsavel",
        "docu_fsdc_dk", "docu_tpst_dk")
      .createOrReplaceTempView("documento")

    Seq((10, 1, 700), (20, 2, 700), (30, 3, 700), (40, 4, 700))
      .toDF("vist_dk", "vist_docu_dk", "vist_orgi_orga_dk")
      .withColumn("vist_dt_fechamento_vista", lit(null).cast("string"))
      .createOrReplaceTempView("vista")

    // doc4: an OLD baixa (100) superseded by a newer non-baixa (101)
    Seq(
      (100, 10, d("2026-01-10")), (200, 20, d("2026-01-10")),
      (300, 30, d("2026-01-10")), (400, 40, d("2026-01-10")),
      (401, 40, d("2026-02-10"))
    ).toDF("pcao_dk", "pcao_vist_dk", "pcao_dt_andamento")
      .createOrReplaceTempView("mcpr_andamento")

    Seq(
      (1000, 100, 6032, Some(30)),   // doc1 baixa, 30-day deadline
      (2000, 200, 6032, Some(3650)), // doc2 baixa, 10-year deadline
      (3000, 300, 6034, Some(30)),   // doc3 baixa
      (4000, 400, 6032, Some(30)),   // doc4 old baixa (not latest)
      (4001, 401, 1111, Some(30))    // doc4 latest andamento: not baixa
    ).toDF("stao_dk", "stao_pcao_dk", "stao_tppr_dk", "stao_nr_dias_prazo")
      .createOrReplaceTempView("mcpr_sub_andamento")

    Seq((1, 91), (2, 92), (3, 93), (4, 94))
      .toDF("item_docu_dk", "item_movi_dk")
      .createOrReplaceTempView("mcpr_item_movimentacao")

    // guia dates: doc1 received 2026-02-01 (30d deadline -> overdue),
    // doc2 long deadline, doc3 non-police dest, doc4 would be overdue
    Seq(
      (91, 500, Some(d("2026-02-01")), None.asInstanceOf[Option[java.sql.Date]], Some(d("2026-01-20"))),
      (92, 500, Some(d("2026-02-01")), None.asInstanceOf[Option[java.sql.Date]], None.asInstanceOf[Option[java.sql.Date]]),
      (93, 600, None.asInstanceOf[Option[java.sql.Date]], Some(d("2026-02-01")), None.asInstanceOf[Option[java.sql.Date]]),
      (94, 500, Some(d("2026-02-01")), None.asInstanceOf[Option[java.sql.Date]], None.asInstanceOf[Option[java.sql.Date]])
    ).toDF("movi_dk", "movi_orga_dk_destino", "movi_dt_recebimento_guia",
        "movi_dt_envio_guia", "movi_dt_criacao_guia")
      .createOrReplaceTempView("mcpr_movimentacao")

    // 500 = police (type 60), 600 = court (type 10)
    Seq((500, 60), (600, 10)).toDF("orge_orga_dk", "orge_tpoe_dk")
      .createOrReplaceTempView("mprj_orgao_ext")

    // spine prerequisites: no routing exclusions, no archival vistas
    Seq.empty[(Int, Int)].toDF("id_orgao", "cod_pct")
      .createOrReplaceTempView("atualizacao_pj_pacote")
    ActiveDocs.registerCached(spark)
  }

  test("BDPA fires only for the overdue police-routed document") {
    registerFixtures()
    val h = new AlertHarness(spark, "t_bdpa", clock)
    val out = h.conformAlert(new BdpaAlert(clock)).collect()
    assert(out.map(_.getAs[Int]("alrt_docu_dk")).toSeq == Seq(1))
    val r = out.head
    // deadline = 2026-02-01 + 30d = 2026-03-03; elapsed to 2026-08-12 = 162
    assert(r.getAs[Int]("alrt_dias_referencia") == 162)
    assert(r.getAs[String]("alrt_key").startsWith("BDPA."))
  }
}
