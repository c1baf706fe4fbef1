package graft

import java.time.LocalDateTime

import graft.harness._

/** Structural plan guards for the domain detectors: the properties
  * that keep them viable at scale are topological (equi-join cores,
  * no accidental nested-loop fan-out), so they are asserted on the
  * optimized plan, where they hold at any data size — not on timings.
  */
class AlertPlanSpec extends SparkTestBase {

  private val clock = RunClock(LocalDateTime.of(2026, 8, 12, 12, 0))

  /** Local-relation fixtures would let the optimizer eagerly evaluate
    * filters and collapse empty subtrees (ConvertToLocalRelation →
    * PropagateEmptyRelation), making structural assertions vacuous for
    * detectors with no planted rows — exclude both so the plan shape
    * is the one a parquet-backed table would produce. */
  private val structuralRules =
    "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation," +
      "org.apache.spark.sql.catalyst.optimizer.PropagateEmptyRelation"

  private def withStructuralPlans[T](body: => T): T = {
    spark.conf.set("spark.sql.optimizer.excludedRules", structuralRules)
    try body finally spark.conf.unset("spark.sql.optimizer.excludedRules")
  }

  private def planOf(a: Alert): String = withStructuralPlans {
    DomainFixtures.registerAll(spark)
    ActiveDocs.registerCached(spark)
    try a.build(spark).queryExecution.executedPlan.toString
    finally spark.catalog.clearCache()
  }

  private val equiJoinOnly: Seq[Alert] = Seq(
    VadfAlert, new DordAlert, new OuviAlert, new GateAlert(clock),
    new OffpAlert(clock), new Dt2iAlert(clock), new MvvdAlert(clock),
    new BdpaAlert(clock), new Ic1aAlert(clock), new Pa1aAlert(clock),
    new PpfpAlert(clock), new Nf30Alert(clock), new PrcrAlert(clock),
    new RoAlert(clock), new FebtAlert(clock),
    new CourtReturnAlert(clock, criminal = true),
    new CourtReturnAlert(clock, criminal = false))

  test("no detector with an equi-join core plans a nested-loop or cartesian join") {
    // the DCTJ/DNTJ return probe carries a range conjunct inside a
    // left_anti and MUST keep its equi core (SURVEY §2.3 J5 risk) —
    // same for every other detector; only COMP's fan-out is a
    // deliberate cross join
    equiJoinOnly.foreach { a =>
      val plan = planOf(a)
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"${a.sigla}: nested-loop join leaked into the plan")
      assert(!plan.contains("CartesianProduct"),
        s"${a.sigla}: cartesian product leaked into the plan")
    }
  }

  test("COMP's organ fan-out is the only nested-loop site, on the broadcast dim") {
    val plan = planOf(new CompAlert)
    assert(plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("BDPA's movimentação max-per-group aggregates only candidate docs") {
    // the reference restricts routing rows to baixa candidates BEFORE
    // the max(movi_dt_guia) aggregate (alerta_bdpa.py:60-74); at 100 TB
    // the other order shuffles the whole movimentação table for nothing
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    DomainFixtures.registerAll(spark)
    val plan = withStructuralPlans {
      new BdpaAlert(clock).build(spark).queryExecution.optimizedPlan
    }
    // the optimizer collapses the movi_dt_guia alias into
    // max(coalesce(movi_dt_recebimento_guia, ...)) — match the source cols
    val movAggs = plan.collect {
      case a: Aggregate
        if a.aggregateExpressions.exists(_.toString.contains("movi_dt")) => a
    }
    assert(movAggs.nonEmpty, "movimentação max-per-group aggregate not found")
    movAggs.foreach { a =>
      // the candidate restriction shows as the baixa id-list filter
      // somewhere below the aggregate (the attribute may carry its
      // pre-projection name, so match the ids, not the column)
      assert(a.child.toString.contains("6006"),
        "movimentação aggregate is not restricted to baixa candidates")
    }
  }

  test("reference-placed broadcast hints survive to the physical plan") {
    // BDPA hints nothing (its dims join post-aggregate); the hinted
    // detectors must show at least one BroadcastHashJoin
    Seq(new DordAlert, new GateAlert(clock), new Ic1aAlert(clock),
      new CourtReturnAlert(clock, criminal = true)).foreach { a =>
      assert(planOf(a).contains("BroadcastHashJoin"),
        s"${a.sigla}: broadcast hint did not reach the physical plan")
    }
  }
}
