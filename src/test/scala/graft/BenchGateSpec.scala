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

  test("the committed bench_budgets.json covers the whole registry") {
    val src = scala.io.Source.fromFile("bench_budgets.json", "UTF-8")
    val text = try src.mkString finally src.close()
    val (_, un) = Bench.budgetCheck(
      SparkEntry.registry.map { case (name, _) => name -> 0.0 }, text)
    assert(un.isEmpty,
      s"registry queries with no pinned budget: ${un.mkString(", ")}")
  }
}
