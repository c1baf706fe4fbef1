package graft

import java.time.LocalDateTime
import org.apache.spark.sql.functions._
import graft.harness.{AlertHarness, BdpaAlert, RunClock}

/** Golden fixture test for the BDPA double max-per-group alert, with
  * plants derived from the reference semantics (alerta_bdpa.py):
  * positive + negative per rule — the 10-id baixa set, the 2013
  * andamento floor, the raw-documento spine (no documentos_ativos
  * exclusion), the responsible-organ output column, the delegacia
  * name, and the tie-collapsing final distinct. */
class BdpaAlertSpec extends SparkTestBase {

  private val clock = RunClock(LocalDateTime.of(2026, 8, 12, 12, 0))

  private def d(s: String) = java.sql.Date.valueOf(s)
  private val noDate: Option[java.sql.Date] = None
  private val noInt: Option[Int] = None

  private def registerFixtures(): Unit = {
    import spark.implicits._
    // (dk, nr_mp, resp_organ, deleg_origem, fsdc, tpst)
    Seq(
      (1, "MP-1", 100, Some(700), 1, 3), // overdue at police -> fires
      (2, "MP-2", 100, noInt, 1, 3),     // deadline not yet passed -> no
      (3, "MP-3", 100, noInt, 1, 3),     // routed to non-police organ -> no
      (4, "MP-4", 100, noInt, 1, 3),     // latest andamento NOT a baixa -> no
      (5, "MP-5", 100, noInt, 1, 3),     // baixa code outside the 10-id set -> no
      (6, "MP-6", 100, noInt, 1, 3),     // only pre-2013 baixa -> no (floor)
      (7, "MP-7", 100, noInt, 1, 3),     // also routed to a spine-excluded
                                         // organ: raw documento still fires
      (8, "MP-8", 100, noInt, 2, 3)      // closed (fsdc != 1) -> no
    ).toDF("docu_dk", "docu_nr_mp", "docu_orgi_orga_dk_responsavel",
        "docu_orge_orga_dk_deleg_origem", "docu_fsdc_dk", "docu_tpst_dk")
      .createOrReplaceTempView("documento")

    // doc7's vista organ (900) differs from its responsible organ (100):
    // the output must carry the responsible organ (alerta_bdpa.py:13)
    Seq((10, 1, 700), (20, 2, 700), (30, 3, 700), (40, 4, 700),
      (50, 5, 700), (60, 6, 700), (70, 7, 900))
      .toDF("vist_dk", "vist_docu_dk", "vist_orgi_orga_dk")
      .withColumn("vist_dt_fechamento_vista", lit(null).cast("string"))
      .createOrReplaceTempView("vista")

    // doc4: an OLD baixa (400) superseded by a newer non-baixa (401);
    // doc6: its only baixa andamento predates the 2013-01-01 floor
    Seq(
      (100, 10, d("2026-01-10")), (200, 20, d("2026-01-10")),
      (300, 30, d("2026-01-10")), (400, 40, d("2026-01-10")),
      (401, 40, d("2026-02-10")), (500, 50, d("2026-01-10")),
      (600, 60, d("2012-06-01")), (700, 70, d("2026-01-10"))
    ).toDF("pcao_dk", "pcao_vist_dk", "pcao_dt_andamento")
      .createOrReplaceTempView("mcpr_andamento")

    // baixa ids from the reference set (alerta_bdpa.py:55-56) except
    // doc5's 6032 — the legacy id the detector must NOT fire on
    Seq(
      (1000, 100, 6006, Some(30)),   // doc1 baixa, 30-day deadline
      (2000, 200, 6010, Some(3650)), // doc2 baixa, 10-year deadline
      (3000, 300, 6363, Some(30)),   // doc3 baixa
      (4000, 400, 6006, Some(30)),   // doc4 old baixa (not latest)
      (4001, 401, 1111, Some(30)),   // doc4 latest andamento: not baixa
      (5000, 500, 6032, Some(30)),   // doc5: id outside the reference set
      (6000, 600, 6006, Some(30)),   // doc6: pre-2013 baixa
      (7000, 700, 6494, Some(30))    // doc7 baixa
    ).toDF("stao_dk", "stao_pcao_dk", "stao_tppr_dk", "stao_nr_dias_prazo")
      .createOrReplaceTempView("mcpr_sub_andamento")

    // doc1 has TWO routing items tied on the max guia date: the J7
    // join-back keeps both, the final distinct collapses them to one
    // alert row; doc7's extra item (99) routes to the documentos_ativos
    // excluded organ 200819 — earlier than its police routing
    Seq((1, 91), (1, 95), (2, 92), (3, 93), (4, 94), (5, 96), (6, 97),
      (7, 98), (7, 99))
      .toDF("item_docu_dk", "item_movi_dk")
      .createOrReplaceTempView("mcpr_item_movimentacao")

    // guia dates: overdue docs received 2026-02-01 (30d deadline ->
    // 2026-03-03, 162 days before the 2026-08-12 clock)
    Seq(
      (91, 500, Some(d("2026-02-01")), noDate, Some(d("2026-01-20"))),
      (95, 500, Some(d("2026-02-01")), noDate, noDate), // tie with 91
      (92, 500, Some(d("2026-02-01")), noDate, noDate),
      (93, 600, noDate, Some(d("2026-02-01")), noDate),
      (94, 500, Some(d("2026-02-01")), noDate, noDate),
      (96, 500, Some(d("2026-02-01")), noDate, noDate),
      (97, 500, Some(d("2026-02-01")), noDate, noDate),
      (98, 500, Some(d("2026-02-01")), noDate, noDate),
      (99, 200819, Some(d("2026-01-15")), noDate, noDate)
    ).toDF("movi_dk", "movi_orga_dk_destino", "movi_dt_recebimento_guia",
        "movi_dt_envio_guia", "movi_dt_criacao_guia")
      .createOrReplaceTempView("mcpr_movimentacao")

    // 500/700 = police (type 60), 600 = court (type 10); 700 is also
    // doc1's originating delegacia -> nm_delegacia
    Seq((500, 60, "DELEGACIA 5A DP"), (600, 10, "VARA CRIMINAL"),
      (700, 60, "DP CENTRO"))
      .toDF("orge_orga_dk", "orge_tpoe_dk", "orge_nm_orgao")
      .createOrReplaceTempView("mprj_orgao_ext")
  }

  test("BDPA fires only per reference semantics, once per alert key") {
    registerFixtures()
    val h = new AlertHarness(spark, "t_bdpa", clock)
    val out = h.conformAlert(new BdpaAlert(clock)).collect()
    // docs 1 and 7 fire exactly once each (distinct collapses doc1's
    // tied routing rows); 2-6 and 8 are the per-rule negatives
    assert(out.map(_.getAs[Int]("alrt_docu_dk")).sorted.toSeq == Seq(1, 7))

    val r1 = out.find(_.getAs[Int]("alrt_docu_dk") == 1).get
    // deadline = 2026-02-01 + 30d = 2026-03-03; elapsed to 2026-08-12 = 162
    assert(r1.getAs[Int]("alrt_dias_referencia") == 162)
    assert(r1.getAs[String]("alrt_info_adicional") == "DP CENTRO")
    assert(r1.getAs[String]("alrt_key").startsWith("BDPA."))

    val r7 = out.find(_.getAs[Int]("alrt_docu_dk") == 7).get
    // responsible organ, not the vista organ (900)
    assert(r7.getAs[Int]("alrt_orgi_orga_dk") == 100)
    assert(r7.getAs[String]("alrt_info_adicional") == null)
  }
}
