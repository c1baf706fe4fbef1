package graft

import java.time.LocalDateTime
import org.apache.spark.sql.functions._
import graft.harness.{ActiveDocs, AlertHarness, VadfAlert}

/** Golden fixture tests for the documentos_ativos spine and the VADF
  * alert (SURVEY.md §5.2: planted positives/negatives per rule). */
class ActiveDocsSpec extends SparkTestBase {

  private def registerFixtures(): Unit = {
    import spark.implicits._
    // (docu_dk, docu_nr_mp, organ, fsdc open-flag, tpst status)
    Seq(
      (1, "MP-1", 100, 1, 5),  // clean open doc -> in spine
      (2, "MP-2", 100, 1, 5),  // routed to special organ -> excluded
      (3, "MP-3", 100, 1, 5),  // archival sub-andamento, pct 20 -> excluded
      (4, "MP-4", 100, 0, 5),  // closed -> out of spine; open vista -> VADF
      (5, "MP-5", 100, 1, 5),  // vista with non-archival code -> in spine
      (6, "MP-6", 999, 1, 5),  // archival code but organ has NO package row
                               //   -> NULL cod_pct falls through -> in spine
      (7, "MP-7", 200, 1, 5),  // pct >= 200 branch-B code -> excluded
      (8, "MP-8", 100, 1, 11)  // status 11 -> excluded
    ).toDF("docu_dk", "docu_nr_mp", "docu_orgi_orga_dk_responsavel",
        "docu_fsdc_dk", "docu_tpst_dk")
      .createOrReplaceTempView("documento")

    // (vist_dk, vist_docu_dk, vist_orgi_orga_dk, fechamento)
    Seq(
      (30, 3, 100, Some("2020-01-01")),
      (40, 4, 400, None), // open vista on closed doc 4
      (50, 5, 100, Some("2020-01-01")),
      (60, 6, 999, Some("2020-01-01")),
      (70, 7, 200, Some("2020-01-01"))
    ).toDF("vist_dk", "vist_docu_dk", "vist_orgi_orga_dk", "vist_dt_fechamento_vista")
      .createOrReplaceTempView("vista")

    Seq((300, 30), (500, 50), (600, 60), (700, 70))
      .toDF("pcao_dk", "pcao_vist_dk").createOrReplaceTempView("mcpr_andamento")

    // doc3: branch-A archival code; doc5: benign code; doc6: archival
    // code but NULL pct; doc7: branch-B archival code
    Seq((3000, 300, 6548), (5000, 500, 1234), (6000, 600, 6548), (7000, 700, 7915))
      .toDF("stao_dk", "stao_pcao_dk", "stao_tppr_dk")
      .createOrReplaceTempView("mcpr_sub_andamento")

    Seq((2, 9000)).toDF("item_docu_dk", "item_movi_dk")
      .createOrReplaceTempView("mcpr_item_movimentacao")
    Seq((9000, 200819)).toDF("movi_dk", "movi_orga_dk_destino")
      .createOrReplaceTempView("mcpr_movimentacao")

    // organ 999 deliberately missing (NULL cod_pct path)
    Seq((100, 20), (200, 210), (400, 25))
      .toDF("id_orgao", "cod_pct").createOrReplaceTempView("atualizacao_pj_pacote")
  }

  test("spine keeps clean/open docs, drops routed/archived/closed/status-11") {
    registerFixtures()
    val ids = ActiveDocs.spine(spark).select("docu_dk")
      .collect().map(_.getInt(0)).toSet
    assert(ids == Set(1, 5, 6))
  }

  test("NULL cod_pct never archives (left-join fall-through, §7.3 risk 3)") {
    registerFixtures()
    assert(ActiveDocs.spine(spark).filter(col("docu_dk") === 6).count() == 1)
  }

  test("spine == reference's LEFT JOIN + IS NULL formulation") {
    registerFixtures()
    val reference = spark.sql(
      s"""SELECT D.* FROM documento D
         |LEFT JOIN (
         |  SELECT item_docu_dk FROM mcpr_item_movimentacao
         |  JOIN mcpr_movimentacao ON item_movi_dk = movi_dk
         |  WHERE movi_orga_dk_destino IN (${ActiveDocs.routingExcludedOrgans.mkString(",")})
         |) T ON item_docu_dk = docu_dk
         |LEFT JOIN (
         |  SELECT vist_docu_dk,
         |    CASE WHEN cod_pct IN (${ActiveDocs.branchAPackages.mkString(",")})
         |           AND stao_tppr_dk IN (${ActiveDocs.branchACodes.mkString(",")}) THEN 1
         |         WHEN cod_pct >= 200
         |           AND stao_tppr_dk IN (${ActiveDocs.branchBCodes.mkString(",")}) THEN 1
         |         ELSE null END AS is_arquivamento
         |  FROM documento
         |  LEFT JOIN atualizacao_pj_pacote ON id_orgao = docu_orgi_orga_dk_responsavel
         |  JOIN vista ON vist_docu_dk = docu_dk
         |  JOIN mcpr_andamento ON pcao_vist_dk = vist_dk
         |  JOIN mcpr_sub_andamento ON stao_pcao_dk = pcao_dk
         |) A ON vist_docu_dk = docu_dk AND is_arquivamento IS NOT NULL
         |WHERE item_docu_dk IS NULL AND vist_docu_dk IS NULL
         |AND docu_fsdc_dk = 1 AND docu_tpst_dk != 11""".stripMargin)
      .select("docu_dk")
    val ours = ActiveDocs.spine(spark).select("docu_dk")
    assert(ours.exceptAll(reference).isEmpty && reference.exceptAll(ours).isEmpty)
  }

  test("VADF alert fires exactly on the open vista of the closed doc") {
    registerFixtures()
    val h = new AlertHarness(spark, "t_vadf",
      RunClockFixture.clock)
    val out = h.conformAlert(VadfAlert).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Int]("alrt_docu_dk") == 4)
    assert(r.getAs[Int]("alrt_orgi_orga_dk") == 400)
    assert(r.getAs[String]("alrt_sigla") == "VADF")
    // key = VADF.sha1("4" + "40").400
    val sha = java.security.MessageDigest.getInstance("SHA-1")
      .digest("440".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r.getAs[String]("alrt_key") == s"VADF.$sha.400")
  }
}

object RunClockFixture {
  val clock: graft.harness.RunClock =
    graft.harness.RunClock(LocalDateTime.of(2026, 8, 12, 12, 0))
}
