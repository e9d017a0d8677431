package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the full operator surface:
  *   - [[graft.operators.RelationalQueries]] — joins/aggs/windows/set-ops
  *   - [[graft.operators.OpsQueries]] — dedup / similarity / text-analysis
  *   - [[graft.kg.KgQueries]] — the PoliGraph-equivalent KG pipeline
  */
object SparkEntry {

  /** Flagship query on sf=0.001: end-to-end KG construction over a
    * deterministic synthetic policy corpus; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries.getOrElse("kg_triples", queries("q_pricing_summary"))(
      spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.RelationalQueries.queries ++
      operators.OpsQueries.queries ++
      kg.KgQueries.queries

  def oracleSql: Map[String, String] =
    operators.RelationalQueries.oracleSql ++
      operators.OpsQueries.oracleSql ++
      kg.KgQueries.oracleSql
}
