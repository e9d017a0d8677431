package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's smoke contract: entry() returns rows on sf0.001. */
class EntrySmokeSpec extends AnyFunSuite {
  test("SparkEntry.entry returns rows") {
    assert(SparkEntry.entry(SparkTestSession.spark).count() > 0)
  }
  test("every query has either an oracle or is documented rows-only") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // LSH candidate sets are additionally brute-force-verified in OpsSpec
    assert(rowsOnly == Set("q_dedup_minhash", "q_dedup_simhash", "q_knn_ivf"),
      s"unexpected rows-only set: $rowsOnly")
  }
}
