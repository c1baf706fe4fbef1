package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One synthetic MPRJ mini-world with planted positives/negatives for
  * every domain alert (FIXTURES.md §A schemas; clock pinned to
  * 2026-08-12 everywhere, matching the fixture design note there).
  *
  * Document dk ranges, one alert per decade so cross-alert bleed is
  * controlled: 99 VADF · 10x DORD · 11x OUVI · 12x GATE · 13x OFFP ·
  * 14x DT2I · 15x MVVD · 16x DCTJ/DNTJ · 17x IC1A · 18x PA1A ·
  * 19x PPFP · 20x NF30 · 21x ABR1 · 22x PRCR. Docs not under a
  * class-gated alert use neutral class 500 (class joins are LEFT
  * everywhere except DCTJ/DNTJ) so IC1A/NF30/PPFP/PA1A see only their
  * own plants; 211 carries carga organ 950 ("GRUPO DE ATUAÇÃO") so
  * ABR1's doc stays out of IC1A via its grupo exclusion.
  */
object DomainFixtures {

  def ts(s: String): Timestamp = Timestamp.valueOf(s + " 00:00:00")
  private val noTs: Option[Timestamp] = None

  def registerAll(spark: SparkSession): Unit = {
    import spark.implicits._

    // (dk, nr_mp, resp_organ, cldc, tpst, fsdc, cadastro, fato, mate,
    //  tpdc, carga)
    val docs = Seq(
      (99, "MP-99", 100, 500, 1, 2, ts("2020-01-10"), noTs, 0, 0, 0),
      // DORD: 101 vista organ != responsible; 102 same organ
      (101, "MP-101", 100, 500, 1, 1, ts("2020-01-10"), noTs, 0, 0, 0),
      (102, "MP-102", 100, 500, 1, 1, ts("2020-01-10"), noTs, 0, 0, 0),
      // OUVI: 111 pending receipt; 112 wrong guia type
      (111, "MP-111", 100, 500, 1, 1, ts("2020-01-10"), noTs, 0, 119, 0),
      (112, "MP-112", 100, 500, 1, 1, ts("2020-01-10"), noTs, 0, 119, 0),
      // GATE: 121 IT + no vista; 122 IT older than vista; 123 IT newer
      (121, "MP-121", 100, 500, 1, 1, ts("2020-01-10"), noTs, 0, 0, 0),
      (122, "MP-122", 100, 500, 1, 1, ts("2020-01-10"), noTs, 0, 0, 0),
      (123, "MP-123", 100, 500, 1, 1, ts("2020-01-10"), noTs, 0, 0, 0),
      // OFFP: 131 oficio expired; 132 oficio still in deadline
      (131, "MP-131", 100, 500, 1, 1, ts("2020-01-10"), noTs, 0, 0, 0),
      (132, "MP-132", 100, 500, 1, 1, ts("2020-01-10"), noTs, 0, 0, 0),
      // DT2I: 141 ciencia->recurso + recent movement; 142 recurso first
      (141, "MP-141", 100, 500, 1, 1, ts("2020-01-10"), noTs, 0, 0, 0),
      (142, "MP-142", 100, 500, 1, 1, ts("2020-01-10"), noTs, 0, 0, 0),
      // MVVD: 151 past DV case; 152 new DV case w/ recurring victim
      (151, "MP-151", 100, 500, 1, 1, ts("2020-01-10"), noTs, 43, 0, 0),
      (152, "MP-152", 100, 500, 1, 1, ts("2026-08-01"), noTs, 43, 0, 0),
      // DCTJ: 161 sent to court, no return; 162 returned; 164 sent
      // too recently (inside the 60-day window); DNTJ: 163
      (161, "MP-161", 100, 400, 1, 1, ts("2020-01-10"), noTs, 0, 0, 0),
      (162, "MP-162", 100, 400, 1, 1, ts("2020-01-10"), noTs, 0, 0, 0),
      (164, "MP-164", 100, 400, 1, 1, ts("2020-01-10"), noTs, 0, 0, 0),
      (163, "MP-163", 100, 401, 1, 1, ts("2020-01-10"), noTs, 0, 0, 0),
      // IC1A: 171 stale; 172 recently extended; 173 grupo carga; 174 corr
      (171, "MP-171", 100, 392, 1, 1, ts("2024-01-10"), noTs, 0, 0, 0),
      (172, "MP-172", 100, 392, 1, 1, ts("2024-01-10"), noTs, 0, 0, 0),
      (173, "MP-173", 100, 392, 1, 1, ts("2024-01-10"), noTs, 0, 0, 950),
      (174, "MP-174", 100, 392, 1, 1, ts("2024-01-10"), noTs, 0, 0, 0),
      // PA1A: 181 stale PA
      (181, "MP-181", 100, 51219, 1, 1, ts("2024-01-10"), noTs, 0, 0, 0),
      // PPFP: 191 past 90d; 192 inside approach window; 193 fresh
      (191, "MP-191", 100, 395, 1, 1, ts("2026-04-01"), noTs, 0, 0, 0),
      (192, "MP-192", 100, 395, 1, 1, ts("2026-05-20"), noTs, 0, 0, 0),
      (193, "MP-193", 100, 395, 1, 1, ts("2026-08-01"), noTs, 0, 0, 0),
      // NF30: 201 past 30d; 202 converted; 203 past 120d
      (201, "MP-201", 100, 393, 1, 1, ts("2026-06-01"), noTs, 0, 0, 0),
      (202, "MP-202", 100, 393, 1, 1, ts("2026-06-01"), noTs, 0, 0, 0),
      (203, "MP-203", 100, 393, 1, 1, ts("2025-01-01"), noTs, 0, 0, 0),
      // ABR1: 211 >1y-old tutela IC (carga 950 keeps it out of IC1A)
      (211, "MP-211", 310, 392, 1, 1, ts("2024-01-10"), noTs, 0, 0, 950),
      // PRCR: 221 prescribed; 222 far future; 223 multiplier case;
      // 224 prescribes ONLY via the under-21-suspect halving (20y
      // crime from 2012 -> 2032 unprescribed, halved 10y -> 2022)
      (221, "MP-221", 300, 500, 1, 1, ts("2015-01-10"), Some(ts("2012-01-10")), 0, 0, 0),
      (222, "MP-222", 300, 500, 1, 1, ts("2015-01-10"), Some(ts("2012-01-10")), 0, 0, 0),
      (223, "MP-223", 300, 500, 1, 1, ts("2015-01-10"), Some(ts("2012-01-10")), 0, 0, 0),
      (224, "MP-224", 300, 500, 1, 1, ts("2015-01-10"), Some(ts("2012-01-10")), 0, 0, 0))
      .toDF("docu_dk", "docu_nr_mp", "docu_orgi_orga_dk_responsavel",
        "docu_cldc_dk", "docu_tpst_dk", "docu_fsdc_dk", "docu_dt_cadastro",
        "docu_dt_fato", "docu_mate_dk", "docu_tpdc_dk", "docu_orgi_orga_dk_carga")
      .withColumn("docu_dt_cancelamento", lit(null).cast("timestamp"))
      .withColumn("docu_nr_externo", concat(lit("ext-"), col("docu_dk")))
      .withColumn("docu_tx_etiqueta", concat(lit("tag-"), col("docu_dk")))
      // data-dependent, not lit(null): a constant-NULL key would let the
      // optimizer fold BDPA's deleg-origem equi-join condition away and
      // turn the plan-shape guards vacuous (AlertPlanSpec)
      .withColumn("docu_orge_orga_dk_deleg_origem",
        when(col("docu_dk") === 99, lit(970)).cast("int"))
    docs.createOrReplaceTempView("documento")

    // (vist_dk, docu, organ, abertura)
    Seq(
      (9900, 99, 700, ts("2026-01-10")), // VADF: open vista on closed doc
      (1010, 101, 900, ts("2026-01-10")), // DORD: different organ
      (1020, 102, 100, ts("2026-01-10")),
      (1220, 122, 700, ts("2026-06-01")), // GATE: vista after IT
      (1230, 123, 700, ts("2026-01-05")), // GATE: vista before IT
      (1310, 131, 700, ts("2024-01-01")), // OFFP
      (1320, 132, 700, ts("2026-06-01")),
      (1410, 141, 700, ts("2026-07-01")), // DT2I
      (1420, 142, 700, ts("2026-07-01")),
      (1720, 172, 700, ts("2026-01-10")), // IC1A extension
      (2021, 202, 700, ts("2026-06-05"))) // NF30 conversion
      .toDF("vist_dk", "vist_docu_dk", "vist_orgi_orga_dk", "vist_dt_abertura_vista")
      .withColumn("vist_dt_fechamento_vista", lit(null).cast("timestamp"))
      .createOrReplaceTempView("vista")

    // (pcao_dk, vist, dt_andamento, tpsa, year_month)
    Seq(
      (10100, 1010, ts("2026-02-01"), 2, 202602), // DORD latest, tpsa=2
      (10200, 1020, ts("2026-02-01"), 2, 202602),
      (13100, 1310, ts("2024-01-10"), 1, 202401), // OFFP oficio filed
      (13200, 1320, ts("2026-06-01"), 1, 202606),
      (14101, 1410, ts("2026-07-01"), 1, 202607), // DT2I ciencia
      (14102, 1410, ts("2026-07-15"), 1, 202607), // DT2I recurso
      (14103, 1410, ts("2026-08-10"), 1, 202608), // DT2I recent move
      (14201, 1420, ts("2026-07-15"), 1, 202607), // ciencia after
      (14202, 1420, ts("2026-07-01"), 1, 202607), // recurso before
      (14203, 1420, ts("2026-08-10"), 1, 202608),
      (17200, 1720, ts("2026-01-10"), 1, 202601), // IC1A prorrogação
      (20200, 2021, ts("2026-06-05"), 1, 202606)) // NF30 conversão
      .toDF("pcao_dk", "pcao_vist_dk", "pcao_dt_andamento", "pcao_tpsa_dk",
        "year_month")
      .withColumn("pcao_dt_cancelamento", lit(null).cast("timestamp"))
      .createOrReplaceTempView("mcpr_andamento")

    // (stao_dk, pcao, tppr)
    Seq(
      (91310, 13100, 6497), // OFFP oficio
      (91320, 13200, 6497),
      (91411, 14101, 6374), // DT2I ciencia code
      (91412, 14102, 6449), // DT2I recurso code
      (91421, 14201, 6374),
      (91422, 14202, 6449),
      (91720, 17200, 6291), // IC1A prorrogação
      (92020, 20200, 6011)) // NF30 conversão
      .toDF("stao_dk", "stao_pcao_dk", "stao_tppr_dk")
      // data-dependent for the same reason: constant NULL would fold
      // BDPA's isNotNull filter to false and empty the subtree
      .withColumn("stao_nr_dias_prazo",
        when(col("stao_dk") === -1, lit(30)).cast("int"))
      .createOrReplaceTempView("mcpr_sub_andamento")

    // routing: OUVI pending-receipt items + DCTJ/DNTJ court round-trips
    Seq(
      (111, 91110, 8111), // OUVI: no receipt mark
      (112, 91120, 8112),
      (161, 91610, 8161), // DCTJ out
      (162, 91621, 8162), // DCTJ out
      (162, 91622, 8163), // DCTJ return
      (163, 91630, 8164), // DNTJ out
      (164, 91640, 8165)) // DCTJ out, deadline not reached
      .toDF("item_docu_dk", "item_movi_dk", "item_dk")
      .withColumn("item_in_recebimento", lit(null).cast("string"))
      .createOrReplaceTempView("mcpr_item_movimentacao")

    // (movi_dk, origem, destino, tpgu, receb, criacao)
    Seq(
      (91110, 100, 450, 2, noTs, Some(ts("2026-07-01"))), // OUVI pending
      (91120, 100, 450, 1, noTs, Some(ts("2026-07-01"))), // wrong guia type
      (91610, 900, 960, 1, Some(ts("2026-01-10")), noTs), // DCTJ to court
      (91621, 900, 960, 1, Some(ts("2026-01-10")), noTs), // DCTJ to court
      (91622, 960, 100, 1, Some(ts("2026-02-01")), noTs), // DCTJ returned
      (91630, 900, 960, 1, Some(ts("2026-01-10")), noTs), // DNTJ to court
      (91640, 900, 960, 1, Some(ts("2026-07-20")), noTs)) // 23d ago < 60d prazo
      .toDF("movi_dk", "movi_orga_dk_origem", "movi_orga_dk_destino",
        "movi_tpgu_dk", "movi_dt_recebimento_guia", "movi_dt_criacao_guia")
      .withColumn("movi_dt_envio_guia", lit(null).cast("timestamp"))
      .createOrReplaceTempView("mcpr_movimentacao")

    Seq(
      (392, "INQUÉRITO CIVIL", "PROCEDIMENTOS > IC"),
      (393, "NOTÍCIA DE FATO", "PROCEDIMENTOS > NF"),
      (395, "PROCEDIMENTO PREPARATÓRIO", "PROCEDIMENTOS > PP"),
      (51219, "PA", "PROCEDIMENTOS > PA"),
      (400, "AÇÃO PENAL", "PROCESSO CRIMINAL COMUM"),
      (401, "AÇÃO CIVIL", "PROCESSO CÍVEL"))
      .toDF("cldc_dk", "cldc_ds_classe", "cldc_ds_hierarquia")
      .createOrReplaceTempView("mmps_classe_hierarquia")

    // persons: 7001 = the "MP" party; 8001 recurring victim; 8002 new
    Seq(
      (1, 161, 7001, 7001, 7),
      (2, 162, 7001, 7001, 7),
      (3, 163, 7001, 7001, 7),
      (8, 164, 7001, 7001, 7),
      (4, 151, 8001, 8001, 3),
      (5, 152, 8001, 8001, 3),
      (6, 152, 8002, 8002, 3),
      // PRCR 224: CLARA (born 1995) was 16 at the 2012 fact date ->
      // suspect type 21 triggers the 0.5 prescription factor
      (7, 224, 8002, 8002, 21))
      .toDF("pers_dk", "pers_docu_dk", "pers_pess_dk", "pers_pesf_dk", "pers_tppe_dk")
      .createOrReplaceTempView("mcpr_personagem")

    Seq((7001, "MP")).toDF("pess_dk", "pess_nm_pessoa")
      .createOrReplaceTempView("mcpr_pessoa")
    Seq(
      (8001, "11122233344", "RG1", "MARIA", "ANA", ts("1990-05-01")),
      (8002, "55566677788", "RG2", "CLARA", "RITA", ts("1995-03-02")))
      .toDF("pesf_pess_dk", "pesf_cpf", "pesf_nr_rg", "pesf_nm_pessoa_fisica",
        "pesf_nm_mae", "pesf_dt_nasc")
      .createOrReplaceTempView("mcpr_pessoa_fisica")
    Seq(Tuple1("MP")).toDF("alias").createOrReplaceTempView("mmps_alias")

    Seq(
      (900, "1A PROMOTORIA", 1),
      (950, "GRUPO DE ATUAÇÃO ESPECIALIZADA", 2))
      .toDF("orgi_dk", "orgi_nm_orgao", "orgi_tpor_dk")
      .createOrReplaceTempView("orgi_orgao")
    Seq((960, 63, "TJ VARA 1"), (970, 60, "DP CENTRO"))
      .toDF("orge_orga_dk", "orge_tpoe_dk", "orge_nm_orgao")
      .createOrReplaceTempView("mprj_orgao_ext")

    Seq((174, 2)).toDF("corr_docu_dk2", "corr_tpco_dk")
      .createOrReplaceTempView("mcpr_correlacionamento")
    Seq((6291, "Prorrogação > IC")).toDF("id", "hierarquia")
      .createOrReplaceTempView("mmps_tp_andamento")

    // GATE technical reports
    Seq(
      (51, 121, ts("2026-05-01")),
      (52, 122, ts("2026-05-01")), // vista 2026-06-01 is later -> no
      (53, 123, ts("2026-05-01"))) // vista 2026-01-05 is earlier -> fires
      .toDF("itcn_dk", "itcn_docu_dk", "itcn_dt_cadastro")
      .createOrReplaceTempView("gate_info_tecnica")

    // organ-package map (also carries ABR1's organ-name and COMP's
    // attribution columns, as the reference's aux table does)
    Seq(
      (300, 200, "PIP TERRITORIAL", "PROMOTORIA X", "1A PIP"),
      (310, 180, "TUTELA COLETIVA", "PROMOTORIA Y", "PROMOTORIA DE TUTELA"),
      (320, 20, "MEIO AMBIENTE", "PROMOTORIA Z", "PROMOTORIA AMBIENTAL"),
      (330, 21, "CIDADANIA", "PROMOTORIA CAPITAL A", "PROM CID 1"),
      (332, 21, "CIDADANIA", "PROMOTORIA CAPITAL B", "PROM CID 2"),
      (331, 21, "CIDADANIA", "PROMOTORIA INTERIOR", "PROM CID 3"))
      .toDF("id_orgao", "cod_pct", "pacote_atribuicao", "orgao_codamp", "orgi_nm_orgao")
      .createOrReplaceTempView("atualizacao_pj_pacote")

    // PRCR: subjects + penalty table
    Seq((221, 1), (222, 2), (223, 3), (223, 4), (224, 2))
      .toDF("asdo_docu_dk", "asdo_assu_dk")
      .withColumn("asdo_dt_fim", lit(null).cast("timestamp"))
      .createOrReplaceTempView("mcpr_assunto_documento")
    Seq(
      (1, "art 155", 2.0, "FURTO", 0, 0),
      (2, "art 121", 20.0, "HOMICÍDIO", 0, 0),
      (3, "art 157", 3.0, "ROUBO", 0, 0),
      (4, "art 14", 1.5, "MAJORANTE", 1, 0))
      .toDF("id", "artigo_lei", "max_pena", "nome_delito", "multiplicador", "abuso_menor")
      .createOrReplaceTempView("tb_penas_assuntos")

    // police reports: station 10 gap in year-2026 serials; 20 complete;
    // 30 silent since June
    Seq(
      ("010-00001/2026", ts("2026-08-01")),
      ("010-00002/2026", ts("2026-08-01")),
      ("010-00005/2026", ts("2026-08-01")),
      ("010-00009/2025", ts("2025-08-01")), // other year: excluded by RO
      ("020-00001/2026", ts("2026-08-05")),
      ("020-00002/2026", ts("2026-08-05")),
      ("030-00001/2026", ts("2026-06-01")))
      .toDF("proc_numero", "data_liberacao")
      .createOrReplaceTempView("seg_pub_in_pol_procedimento")
    Seq(
      (10, 501, "DP 10"), (20, 502, "DP 20"), (30, 503, "DP 30"))
      .toDF("cisp_codigo", "pip_codigo", "cisp_nome_apresentacao")
      .createOrReplaceTempView("tb_pip_cisp")

    // procurement outliers
    Seq(
      (1, 11, "1-11", "CANETA AZUL", "2026-01-05", 25.0),
      (2, 12, "2-12", "PAPEL A4", "2026-01-05", 10.0))
      .toDF("contratacao", "id_item", "contrato_iditem", "item",
        "dt_contratacao", "var_perc")
      .createOrReplaceTempView("compras_fora_padrao_capital")

    // SNIS sanitation: NITERÓI under-meters water vs the state (33)
    Seq(
      (33, "ESTADO", 2024, None: Option[String], 20.0, 10.0, 90.0, 10.0),
      (1, "NITERÓI", 2024, None: Option[String], 10.0, 10.0, 90.0, 10.0),
      (1, "NITERÓI", 2024, Some("CEDAE"), 5.0, 5.0, 5.0, 5.0), // excluded
      (1, "NITERÓI", 2020, None: Option[String], 1.0, 1.0, 1.0, 1.0)) // old year
      .toDF("cod_mun", "municipio", "ano_referencia", "cod_prest",
        "in009", "in013", "in023", "in049")
      .createOrReplaceTempView("plataforma_amb_saneamento_snis_info_indic_agua")
    Seq(
      (33, "ESTADO", 2024, 50.0, 50.0, 50.0, 50.0),
      (1, "NITERÓI", 2024, 60.0, 60.0, 60.0, 60.0))
      .toDF("cod_mun", "municipio", "ano_referencia",
        "in015", "in016", "in024", "in046")
      .withColumn("cod_prest", lit(null).cast("string"))
      .createOrReplaceTempView("plataforma_amb_saneamento_snis_info_indic_esgoto")
    Seq(("NITERÓI", 2024, 5.0, 1.0, 1.0, 1.0))
      .toDF("municipio", "ano_referencia", "in020", "in021", "in040", "in041")
      .createOrReplaceTempView("plataforma_amb_saneamento_snis_info_indic_drenagem")
    Seq((10.0, 10.0, 5.0, 5.0, 10.0, 10.0, 10.0, 10.0))
      .toDF("ri013", "ge008", "ri029", "ri067", "ge006", "ie024", "ie017", "ie019")
      .createOrReplaceTempView(
        "meio_ambiente_amb_saneamento_snis_drenagem_info_indic_2018")
    Seq((320, "NITERÓI")).toDF("cod_orgao", "comarca")
      .createOrReplaceTempView("institucional_orgaos_meio_ambiente")
  }
}
