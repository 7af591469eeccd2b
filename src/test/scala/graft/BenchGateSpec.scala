package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench regression gate (`Bench.budgetCheck`): offenders are the
  * measured-over-budget queries, failure markers are never "under
  * budget", and unbudgeted queries are surfaced so a new registry entry
  * can't silently run ungated. Pure logic — no Spark session. */
class BenchGateSpec extends AnyFunSuite {

  private val budgets =
    """{
      | "q_fast": 0.5,
      | "q_slow": 2.0,
      | "q_failed": 1.0
      |}""".stripMargin

  test("within budget passes, over budget is an offender with its ceiling") {
    val (over, un) = Bench.budgetCheck(
      Seq("q_fast" -> 0.49, "q_slow" -> 2.61), budgets)
    assert(over == Seq(("q_slow", 2.61, 2.0)))
    assert(un.isEmpty)
  }

  test("exactly on budget is not a breach") {
    val (over, _) = Bench.budgetCheck(Seq("q_fast" -> 0.5), budgets)
    assert(over.isEmpty)
  }

  test("a -1 failure marker is not judged by the budget compare") {
    // the caller trips the gate on failed > 0; the compare itself must
    // not report -1 as a (nonsensical) under-budget success or offender
    val (over, _) = Bench.budgetCheck(Seq("q_failed" -> -1.0), budgets)
    assert(over.isEmpty)
  }

  test("queries missing from the budgets file are reported, not gated") {
    val (over, un) = Bench.budgetCheck(
      Seq("q_new" -> 99.0, "q_fast" -> 0.1), budgets)
    assert(over.isEmpty)
    assert(un == Seq("q_new"))
  }

  test("a uniformly loaded machine passes: factor stretches every budget") {
    // round-9 scenario: the driver machine ran ~1.8x slower than
    // pin-time across the board — with the measured load factor applied,
    // none of these uniformly inflated times is an offender
    val (over, _) = Bench.budgetCheck(
      Seq("q_fast" -> 0.9, "q_slow" -> 3.6), budgets, factor = 1.8)
    assert(over.isEmpty)
  }

  test("a genuine regression still fails under load normalization") {
    // q_slow regressed 2x BEYOND the 1.8x load every query shares —
    // the stretched budget (2.0 * 1.8 = 3.6) still catches it, and the
    // offender reports the EFFECTIVE ceiling it was judged against
    val (over, _) = Bench.budgetCheck(
      Seq("q_fast" -> 0.9, "q_slow" -> 7.2), budgets, factor = 1.8)
    assert(over == Seq(("q_slow", 7.2, 3.6)))
  }

  test("a local segment spike stretches only that query's budget") {
    // round-12 scenario: global load 1.0 but one stretch of the board ran
    // under a transient spike — the per-query factor (measured by the
    // probes bracketing that segment) stretches exactly the spiked
    // queries' budgets, leaving the rest of the board gated tight
    val (over, _) = Bench.budgetCheck(
      Seq("q_fast" -> 0.49, "q_slow" -> 5.0), budgets,
      factor = 1.0, perQueryFactor = Map("q_slow" -> 3.0))
    assert(over.isEmpty)
    // the un-spiked query is still judged at factor 1.0
    val (over2, _) = Bench.budgetCheck(
      Seq("q_fast" -> 0.6, "q_slow" -> 5.0), budgets,
      factor = 1.0, perQueryFactor = Map("q_slow" -> 3.0))
    assert(over2 == Seq(("q_fast", 0.6, 0.5)))
  }

  test("per-query factor never tightens below the global factor") {
    // a query whose local probes measured idle still gets the global
    // stretch — max(global, local), never min
    val (over, _) = Bench.budgetCheck(
      Seq("q_slow" -> 3.5), budgets,
      factor = 1.8, perQueryFactor = Map("q_slow" -> 1.0))
    assert(over.isEmpty)
  }

  test("a pass that exists only under an outsized local factor is flagged") {
    // q_slow at 5.0 passes the gate via its 3.0 local factor (budget
    // 2.0 * 3.0 = 6.0) but would breach if local stretch were capped at
    // 1.5x global (2.0 * 1.5 = 3.0) — the self-spike suspect surface
    val flagged = Bench.localOnlyPasses(
      Seq("q_fast" -> 0.49, "q_slow" -> 5.0), budgets,
      factor = 1.0, perQueryFactor = Map("q_slow" -> 3.0))
    assert(flagged == Seq("q_slow"))
    // under a modest local factor (within 1.5x global) nothing is flagged
    assert(Bench.localOnlyPasses(
      Seq("q_slow" -> 2.5), budgets,
      factor = 1.0, perQueryFactor = Map("q_slow" -> 1.4)).isEmpty)
    // an outright breach (fails even WITH the full local factor) is the
    // gate's business, not this flag's
    assert(Bench.localOnlyPasses(
      Seq("q_slow" -> 9.0), budgets,
      factor = 1.0, perQueryFactor = Map("q_slow" -> 3.0)).isEmpty)
  }

  test("calibration factor: ratio of medians, clamped to [1, 4]") {
    // idle machine, pinned 0.4s: factor 1.0 exactly
    assert(Bench.calibrationFactor(Seq(0.4, 0.4, 0.4), Some(0.4)) == 1.0)
    // loaded ~2x: the median (middle sample) carries the factor
    assert(Bench.calibrationFactor(Seq(0.7, 0.8, 0.9), Some(0.4)) == 2.0)
    // faster than pin NEVER tightens budgets below their pinned values
    assert(Bench.calibrationFactor(Seq(0.2, 0.2, 0.2), Some(0.4)) == 1.0)
    // a calibration glitch can't write a blank check past 4x
    assert(Bench.calibrationFactor(Seq(40.0), Some(0.4)) == 4.0)
    // no pin (or a degenerate one) → 1.0, the un-normalized gate
    assert(Bench.calibrationFactor(Seq(0.8), None) == 1.0)
    assert(Bench.calibrationFactor(Seq(0.8), Some(0.0)) == 1.0)
    assert(Bench.calibrationFactor(Nil, Some(0.4)) == 1.0)
  }

  test("_calibration is a reserved key, not a query budget") {
    val withCal = """{ "_calibration": 0.4, "q_fast": 0.5 }"""
    assert(Bench.parseBudgets(withCal).get(Bench.CalibrationKey).contains(0.4))
    // the compare never judges a query against the calibration pin, and
    // a query named like the key would surface as unbudgeted, not gated
    val (over, un) = Bench.budgetCheck(
      Seq("q_fast" -> 0.4, "_calibration" -> 99.0), withCal)
    assert(over.isEmpty)
    assert(un == Seq("_calibration"))
  }

  test("the committed bench_budgets.json pins a calibration baseline") {
    val src = scala.io.Source.fromFile("bench_budgets.json", "UTF-8")
    val text = try src.mkString finally src.close()
    assert(Bench.parseBudgets(text).get(Bench.CalibrationKey).exists(_ > 0),
      "bench_budgets.json must carry a _calibration pin so the gate can " +
        "load-normalize (re-pin with tools/pin_budgets.py)")
  }

  test("the committed bench_budgets.json covers the whole registry") {
    val src = scala.io.Source.fromFile("bench_budgets.json", "UTF-8")
    val text = try src.mkString finally src.close()
    val (_, un) = Bench.budgetCheck(
      SparkEntry.registry.map { case (name, _) => name -> 0.0 }, text)
    assert(un.isEmpty,
      s"registry queries with no pinned budget: ${un.mkString(", ")}")
  }
}
