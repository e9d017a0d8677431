package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's smoke contract: entry() returns rows on sf0.001. */
class EntrySmokeSpec extends AnyFunSuite {
  test("SparkEntry.entry returns rows") {
    assert(SparkEntry.entry(SparkTestSession.spark).count() > 0)
  }
  test("every query has an oracle — zero rows-only entries") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"queries without oracle: $rowsOnly")
  }
}
