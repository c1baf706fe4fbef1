package graft

import java.time.LocalDateTime

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.harness._

/** Golden assertions for every domain detector over the shared
  * [[DomainFixtures]] mini-world (clock pinned 2026-08-12): each alert
  * fires on exactly its planted positives and nothing else. The planted
  * negatives live in the fixture comments — e.g. GATE's doc 122 (vista
  * newer than the IT) or IC1A's doc 173 (GRUPO DE ATUAÇÃO carga). */
class DomainAlertsSpec extends SparkTestBase {

  private val clock = RunClock(LocalDateTime.of(2026, 8, 12, 12, 0))

  private def docs(df: DataFrame): Set[Int] =
    df.select("alrt_docu_dk").collect().map(_.getInt(0)).toSet

  private def withWorld[A](f: => A): A = {
    DomainFixtures.registerAll(spark)
    ActiveDocs.registerCached(spark)
    try f finally spark.catalog.clearCache()
  }

  test("VADF fires on the open vista of the closed doc only") {
    withWorld { assert(docs(VadfAlert.build(spark)) == Set(99)) }
  }

  test("DORD fires when the latest andamento's organ differs from the responsible") {
    withWorld { assert(docs(new DordAlert().build(spark)) == Set(101)) }
  }

  test("OUVI fires on unreceived type-2 guias of ombudsman docs") {
    withWorld {
      val out = new OuviAlert().build(spark)
      assert(docs(out) == Set(111))
      // destination organ carries the alert
      assert(out.select("alrt_orgi_orga_dk").head.getInt(0) == 450)
    }
  }

  test("GATE fires for never-seen ITs and ITs newer than the last vista") {
    withWorld {
      val out = new GateAlert(clock).build(spark)
      assert(docs(out) == Set(121, 123))
      // elapsed days from IT registration (2026-05-01) to the clock
      assert(out.select("alrt_dias_referencia").distinct().head.getInt(0) == 103)
    }
  }

  test("OFFP fires once the one-year oficio deadline passed") {
    withWorld { assert(docs(new OffpAlert(clock).build(spark)) == Set(131)) }
  }

  test("DT2I fires on recent movement after a recurso that followed a ciência") {
    withWorld {
      val out = new Dt2iAlert(clock).build(spark)
      assert(docs(out) == Set(141))
      assert(out.select("alrt_dias_referencia").head.getInt(0) == 2)
    }
  }

  test("MVVD fires on the recent DV case with a recurring victim") {
    withWorld {
      val out = new MvvdAlert(clock).build(spark)
      assert(docs(out) == Set(152))
      assert(out.count() == 1) // 5-way union deduped by distinct()
    }
  }

  test("DCTJ fires on criminal docs at court past 60 days; returns clear it") {
    withWorld {
      val out = new CourtReturnAlert(clock, criminal = true).build(spark)
      // 162 returned to the responsible organ; 164 dispatched 23 days
      // ago, still inside the 60-day window
      assert(docs(out) == Set(161))
    }
  }

  test("DNTJ fires on non-criminal docs at court past 120 days") {
    withWorld {
      assert(docs(new CourtReturnAlert(clock, criminal = false).build(spark)) ==
        Set(163))
    }
  }

  test("IC1A: stale IC fires; extended / grupo-carga / correlated docs do not") {
    withWorld {
      val out = new Ic1aAlert(clock).build(spark)
      assert(docs(out) == Set(171))
      // no prorrogação andamento -> the cadastro fallback label
      assert(out.select("alrt_info_adicional").head.getString(0) ==
        "Cadastro do Procedimento no Sistema")
    }
  }

  test("PA1A fires on the stale administrative procedure") {
    withWorld { assert(docs(new Pa1aAlert(clock).build(spark)) == Set(181)) }
  }

  test("PPFP emits PPFP past deadline and PPPV inside the approach window") {
    withWorld {
      val out = new PpfpAlert(clock).build(spark)
      val bySigla = out.select("alrt_docu_dk", "alrt_sigla").collect()
        .map(r => r.getInt(0) -> r.getString(1)).toMap
      assert(bySigla == Map(191 -> "PPFP", 192 -> "PPPV"))
    }
  }

  test("NF30 emits NF30/NF120 by age and drops converted notices") {
    withWorld {
      val out = new Nf30Alert(clock).build(spark)
      val bySigla = out.select("alrt_docu_dk", "alrt_sigla").collect()
        .map(r => r.getInt(0) -> r.getString(1)).toMap
      assert(bySigla == Map(201 -> "NF30", 203 -> "NF120"))
    }
  }

  test("PRCR folds per-crime status into subtype siglas; far-future docs drop") {
    withWorld {
      val out = new PrcrAlert(clock).build(spark)
      val bySigla = out.select("alrt_docu_dk", "alrt_sigla").collect()
        .map(r => r.getInt(0) -> r.getString(1)).toMap
      // 221: single prescribed crime; 223: multiplier-factored crime also
      // prescribed (3y * 1.5 -> 12y band from 2012); 222: 20y crime far
      // from prescription -> status 0 -> no sigla; 224: same 20y crime
      // prescribed ONLY because the under-21 suspect halves it to 10y
      assert(bySigla == Map(221 -> "PRCR1", 223 -> "PRCR1", 224 -> "PRCR1"))
    }
  }

  test("RO reports the serial gap per station for the clock year") {
    withWorld {
      val out = new RoAlert(clock).build(spark)
      val r = out.collect()
      assert(r.length == 1)
      assert(r.head.getAs[String]("ro_nr_delegacia") == "10")
      assert(r.head.getAs[Int]("ro_qt_ros_faltantes") == 2) // serials 1,2,5
      assert(r.head.getAs[Int]("alrt_orgi_orga_dk") == 501)
    }
  }

  test("FEBT fires for stations silent beyond 30 days") {
    withWorld {
      val out = new FebtAlert(clock).build(spark)
      assert(out.select("ro_nr_delegacia").collect().map(_.getString(0)).toSet ==
        Set("30"))
    }
  }

  test("COMP fans the over-priced item out to every capital citizenship organ") {
    withWorld {
      val out = new CompAlert().build(spark)
      assert(out.count() == 2) // 1 item >= 20% x organs {330, 332}
      assert(out.select("alrt_orgi_orga_dk").collect().map(_.getInt(0)).toSet ==
        Set(330, 332))
      assert(out.select("comp_item").distinct().head.getString(0) == "CANETA AZUL")
    }
  }

  test("ISPS flags the municipality under-metering water vs the state row") {
    withWorld {
      val out = new IspsAlert().build(spark)
      val r = out.collect()
      assert(r.length == 1)
      assert(r.head.getAs[String]("isps_indicador") == "Índice de Hidrometação")
      assert(r.head.getAs[String]("isps_municipio") == "NITERÓI")
      assert(r.head.getAs[Int]("alrt_orgi_orga_dk") == 320)
      assert(r.head.getAs[Int]("isps_ano_referencia") == 2024)
    }
  }

  test("ABR1 counts >1y tutela procedures per organ, only in gate months") {
    withWorld {
      // clock month (August) not in the gate -> empty, as the reference
      assert(new Abr1Alert(clock).build(spark).isEmpty)
      val out = new Abr1Alert(clock, months = Seq(8)).build(spark)
      val r = out.collect()
      assert(r.length == 1)
      assert(r.head.getAs[Int]("alrt_orgi_orga_dk") == 310)
      assert(r.head.getAs[Int]("abr1_nr_procedimentos") == 1)
    }
  }

  test("RO boundary: serial gaps in a prior year never fire (year rollover)") {
    withWorld {
      import spark.implicits._
      // station 40's gap exists only among LAST year's serials (the
      // reference scopes expected counts to year(now()), alerta_ro.py:
      // 37-38 — serials restart each year); station 50 is complete in
      // the clock year. Nothing may fire.
      Seq(
        ("040-00001/2025", DomainFixtures.ts("2025-08-01")),
        ("040-00005/2025", DomainFixtures.ts("2025-08-01")),
        ("050-00001/2026", DomainFixtures.ts("2026-08-01")),
        ("050-00002/2026", DomainFixtures.ts("2026-08-01")))
        .toDF("proc_numero", "data_liberacao")
        .createOrReplaceTempView("seg_pub_in_pol_procedimento")
      Seq((40, 504, "DP 40"), (50, 505, "DP 50"))
        .toDF("cisp_codigo", "pip_codigo", "cisp_nome_apresentacao")
        .createOrReplaceTempView("tb_pip_cisp")
      assert(new RoAlert(clock).build(spark).isEmpty)
    }
  }

  test("FEBT boundary: exactly 30 days silent does not fire; 31 days does") {
    withWorld {
      import spark.implicits._
      // clock 2026-08-12; the reference's predicate is STRICTLY > 30
      // (alerta_febt.py:38): station 10 released exactly 30 days ago,
      // station 20 released 31 days ago
      Seq(
        ("010-00001/2026", DomainFixtures.ts("2026-07-13")),
        ("020-00001/2026", DomainFixtures.ts("2026-07-12")))
        .toDF("proc_numero", "data_liberacao")
        .createOrReplaceTempView("seg_pub_in_pol_procedimento")
      val out = new FebtAlert(clock).build(spark)
      assert(out.select("ro_nr_delegacia").collect().map(_.getString(0)).toSet ==
        Set("20"))
    }
  }

  test("ABR1 boundary: April fires by default; Nov-2020 carve-out fires; Dec-2020 does not") {
    withWorld {
      // the default gate is month 4 (alerta_abr1.py:23-25)
      val april = RunClock(LocalDateTime.of(2026, 4, 15, 12, 0))
      val aprilOut = new Abr1Alert(april).build(spark).collect()
      assert(aprilOut.length == 1)
      assert(aprilOut.head.getAs[Int]("alrt_orgi_orga_dk") == 310)
      // quirk pin: the reference builds ano_mes UNPADDED
      // (concat_ws('', year, month), alerta_abr1.py:47) — April is
      // "20264". Zero-padding it would diverge from the reference's
      // own key format; this assertion keeps the quirk deliberate.
      assert(aprilOut.head.getAs[String]("abr1_ano_mes") == "20264")
      // November 2020 is hardcoded into the gate even though 11 is not
      // a configured month (alerta_abr1.py:36-38); plant a procedure
      // old enough relative to that clock
      import spark.implicits._
      Seq((900, "MP-900", 310, 392, 1, DomainFixtures.ts("2019-01-10")))
        .toDF("docu_dk", "docu_nr_mp", "docu_orgi_orga_dk_responsavel",
          "docu_cldc_dk", "docu_tpst_dk", "docu_dt_cadastro")
        .withColumn("docu_dt_cancelamento", lit(null).cast("timestamp"))
        .createOrReplaceTempView("documentos_ativos")
      val nov2020 = RunClock(LocalDateTime.of(2020, 11, 15, 12, 0))
      val novOut = new Abr1Alert(nov2020).build(spark).collect()
      assert(novOut.length == 1)
      assert(novOut.head.getAs[String]("abr1_ano_mes") == "202011")
      // one month later the carve-out no longer applies
      val dec2020 = RunClock(LocalDateTime.of(2020, 12, 15, 12, 0))
      assert(new Abr1Alert(dec2020).build(spark).isEmpty)
    }
  }

  test("ISPS boundary: a new reference year invalidates the memo and recomputes") {
    withWorld {
      val db = "t_ispsyear"
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
      val loc = java.nio.file.Files.createTempDirectory("graft_ispsyear")
      spark.sql(s"CREATE DATABASE $db LOCATION '$loc'")
      val aux = s"$db.memo"
      // first run computes and memoizes the 2024 rows
      assert(new IspsAlert(Some(aux)).build(spark).count() == 1)
      spark.catalog.clearCache()
      // 2025 data lands: the memo's 2024 rows must NOT satisfy the new
      // year's lookup (isps.py:44-60 keys the memo on the max year)
      import spark.implicits._
      Seq(
        (33, "ESTADO", 2025, None: Option[String], 20.0, 10.0, 90.0, 10.0),
        (1, "NITERÓI", 2025, None: Option[String], 10.0, 10.0, 90.0, 10.0))
        .toDF("cod_mun", "municipio", "ano_referencia", "cod_prest",
          "in009", "in013", "in023", "in049")
        .createOrReplaceTempView("plataforma_amb_saneamento_snis_info_indic_agua")
      val out = new IspsAlert(Some(aux)).build(spark).collect()
      assert(out.length == 1)
      assert(out.head.getAs[Int]("isps_ano_referencia") == 2025)
      assert(out.head.getAs[String]("isps_indicador") == "Índice de Hidrometação")
      spark.sql(s"DROP DATABASE $db CASCADE")
    }
  }

  test("full lifecycle runAll: every family lands in final + hist tables") {
    withWorld {
      val db = "t_runall"
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
      val loc = java.nio.file.Files.createTempDirectory("graft_runall")
      spark.sql(s"CREATE DATABASE $db LOCATION '$loc'")
      AlertRegistry.runAll(spark, db, clock, includeDisabled = true)

      // MGP: GATE 2, IC1A 1, MVVD 1, OUVI 1, PA1A 1, PPFP 2 (PPFP+PPPV),
      // PRCR 2, VADF 1, NF30 2 (NF30+NF120), DT2I 1, BDPA 0 (no status-3
      // docs planted here) + disabled DCTJ 1, DNTJ 1, DORD 1, OFFP 1
      val mgp = spark.table(s"$db.${AlertRegistry.MgpTable}")
      val siglas = mgp.groupBy("alrt_sigla").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(siglas == Map(
        "GATE" -> 2L, "IC1A" -> 1L, "MVVD" -> 1L, "OUVI" -> 1L,
        "PA1A" -> 1L, "PPFP" -> 1L, "PPPV" -> 1L, "PRCR1" -> 3L,
        "VADF" -> 1L, "NF30" -> 1L, "NF120" -> 1L, "DT2I" -> 1L,
        "DCTJ" -> 1L, "DNTJ" -> 1L, "DORD" -> 1L, "OFFP" -> 1L))

      // RO family holds RO + FEBT; COMP/ISPS/ABR1 their own tables
      assert(spark.table(s"$db.${AlertRegistry.RoTable}").count() == 2)
      assert(spark.table(s"$db.${AlertRegistry.CompTable}").count() == 2)
      assert(spark.table(s"$db.${AlertRegistry.IspsTable}").count() == 1)
      assert(spark.table(s"$db.${AlertRegistry.Abr1Table}").count() == 0)
      assert(spark.table(s"$db.${AlertRegistry.TypesTable}").count() == 25)

      // history stamped with the run day/month partitions
      val hist = spark.table(s"$db.hist_${AlertRegistry.MgpTable}")
      assert(hist.count() == mgp.count())
      assert(hist.select("dt_partition").distinct().head.getString(0) == "202608")

      // every conformed row carries the composite sigla.key.orgao key
      assert(mgp.filter(!col("alrt_key").rlike("^[A-Z0-9]+\\..+\\.\\d+$")).count() == 0)

      // aux side-outputs: PRCR detail + ISPS memo (ABR1's aux lands
      // empty because the month gate filters the whole frame)
      assert(spark.table(s"$db.mmps_alerta_detalhe_prcr").count() > 0)
      assert(spark.table(s"$db.mmps_alerta_isps_aux").count() == 1)
      spark.sql(s"DROP DATABASE $db CASCADE")
    }
  }

  test("ISPS memoizes: second run reads the aux table, not the sources") {
    withWorld {
      val db = "t_ispsmemo"
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
      val loc = java.nio.file.Files.createTempDirectory("graft_ispsmemo")
      spark.sql(s"CREATE DATABASE $db LOCATION '$loc'")
      val aux = s"$db.memo"
      val first = new IspsAlert(Some(aux)).build(spark)
      assert(first.count() == 1)
      spark.catalog.clearCache()
      // poison the live sources: a memoized second run must not see this
      spark.table("plataforma_amb_saneamento_snis_info_indic_agua")
        .withColumn("in009", lit(0.0))
        .createOrReplaceTempView("plataforma_amb_saneamento_snis_info_indic_agua")
      val second = new IspsAlert(Some(aux)).build(spark)
      assert(second.count() == 1)
      assert(second.select("isps_indicador").head.getString(0) ==
        "Índice de Hidrometação")
      spark.sql(s"DROP DATABASE $db CASCADE")
    }
  }
}
