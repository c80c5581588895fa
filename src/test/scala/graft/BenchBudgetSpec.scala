package graft

import org.scalatest.funsuite.AnyFunSuite

/** The per-query bench regression tripwire's own guard: every declared
  * query must carry a budget line in bench_budget.json, so a new
  * operator cannot ship unbudgeted (round 2 shipped an 81% regression
  * that only a manual diff of BENCH files caught — the budget makes
  * that an automatic `budget_violations` entry in the bench output).
  * No Spark session needed: this validates the file against the query
  * registry, not the timings.
  */
class BenchBudgetSpec extends AnyFunSuite {

  test("bench_budget.json parses and covers every declared query") {
    val budgets = Bench.budgets()
    assert(budgets.nonEmpty, "bench_budget.json missing or unparseable")
    assert(budgets.valuesIterator.forall(b => b > 0 && b < 600),
      "budget lines must be positive seconds")
    val missing = SparkEntry.queries.keySet -- budgets.keySet
    assert(missing.isEmpty,
      s"queries without a bench budget line: ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("violation detection trips at >2x the line and not below") {
    val b = Bench.budgets()
    val someQuery = SparkEntry.queries.keySet.min
    val line = b(someQuery)
    assert(Bench.budgetViolations(Seq(someQuery -> line * 1.9)).isEmpty)
    val hit = Bench.budgetViolations(Seq(someQuery -> line * 2.1))
    assert(hit.map(_._1) == Seq(someQuery))
  }
}
