package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Knowledge-graph construction pipeline queries (the PoliGraph-equivalent
  * surface). Inputs are synthesized deterministically (no external data);
  * oracles are VALUES-literals generated from the same ground truth.
  */
object KgQueries {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracleSql: Map[String, String] = Map()
}
