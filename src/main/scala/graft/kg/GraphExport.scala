package graft.kg

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.kg.Model.Triple

/** Deterministic graph sinks (SURVEY.md S7/S9; reference
  * graph_utils.py:76-100 node-link YAML with fixed ordering, plus the CSV
  * eval exports).
  *
  * Ordering is part of the contract (byte-stable goldens, W3):
  *   nodes by (type, id); links by (key, source≠'we', source, target);
  *   evidence texts / purpose phrases sorted inside each row.
  */
object GraphExport {

  /** Node table: one row per (url, term, type), deterministically ordered. */
  def nodes(triples: Dataset[Triple]): DataFrame = {
    val t = triples.toDF()
    t.select(col("url"), col("subj").as("id"), col("subjType").as("type"))
      .union(t.select(col("url"), col("obj").as("id"), col("objType").as("type")))
      .distinct()
      .orderBy(col("url"), col("type"), col("id"))
  }

  /** Link table in reference node-link order. */
  def links(triples: Dataset[Triple]): DataFrame =
    triples.toDF()
      .select(
        col("url"), col("pred").as("key"), col("subj").as("source"),
        col("obj").as("target"),
        sort_array(col("text")).as("text"),
        to_json(col("purposes")).as("purposes"))
      .orderBy(col("url"), col("key"), col("source") =!= "we",
        col("source"), col("target"))

  /** Write the node-link pair as parquet + the flat tuples CSV used by the
    * eval tooling (export_poligraph_tuples.py:43-44 shape). */
  def write(triples: Dataset[Triple], dir: String): Unit = {
    nodes(triples).write.mode("overwrite").parquet(s"$dir/nodes")
    links(triples).write.mode("overwrite").parquet(s"$dir/links")
    triples.toDF()
      .select(col("url").as("app_id"), col("subj").as("entity"),
        col("pred").as("action"), col("obj").as("datatype"))
      .orderBy("app_id", "entity", "action", "datatype")
      .write.mode("overwrite").option("header", "true").csv(s"$dir/tuples_csv")
  }
}
