package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Training-data pipeline operators (dedup / similarity / text analysis /
  * multimodal) over the `documents` and `embeddings` tables. Filled in
  * incrementally; see Dedup.scala, Similarity.scala, TextStats.scala.
  */
object OpsQueries {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracleSql: Map[String, String] = Map()
}
