package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's smoke contract: entry() returns rows on sf0.001. */
class EntrySmokeSpec extends AnyFunSuite {
  test("SparkEntry.entry returns rows") {
    assert(SparkEntry.entry(SparkTestSession.spark).count() > 0)
  }
  test("every query has either an oracle or is documented rows-only") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // LSH candidate sets + map/array outputs are brute-force-verified in
    // OpsSpec instead of the SQL gate
    assert(rowsOnly == Set("kg_triples_full", "q_dedup_minhash",
      "q_dedup_simhash", "q_knn_ivf"), s"unexpected rows-only set: $rowsOnly")
  }
}
