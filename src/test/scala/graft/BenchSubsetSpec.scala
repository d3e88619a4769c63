package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's 18-query BASELINE.md comparison subset against the live
  * registry: a member rename would silently shrink `subset18_total` and
  * read as a cross-round speedup (r12 ADVICE item 3). The totals already
  * print `null` when incomplete; this catches the drift at test time, at
  * the rename itself.
  */
class BenchSubsetSpec extends AnyFunSuite {
  test("every baseline-subset member exists in SparkEntry.queries") {
    val missing = Bench.baselineSubset -- SparkEntry.queries.keySet
    assert(missing.isEmpty,
      s"baseline subset names missing from the registry (renamed?): $missing")
  }

  test("the subset is exactly the 18 round-2 anchor queries") {
    assert(Bench.baselineSubset.size === 18)
  }
}
