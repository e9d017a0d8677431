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

  /** GraphML "pretty" sink (SURVEY.md S8; reference colorize_graph +
    * nx.write_graphml, build_graph.py:514-527): one XML document per url,
    * nodes carrying label/type, edges re-keyed e0..eN with relationship +
    * newline-joined evidence. Deterministic: nodes by (type, id), edges in
    * reference link order. Runs as a per-group render inside one shuffle. */
  def graphml(triples: Dataset[Triple]): Dataset[(String, String)] = {
    import triples.sparkSession.implicits._
    def esc(s: String): String = s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\"", "&quot;")
    triples.groupByKey(_.url).mapGroups { (url, it) =>
      val ts = it.toVector
      val nodes = ts.flatMap(t => Seq((t.subj, t.subjType), (t.obj, t.objType)))
        .distinct.sortBy { case (id, tp) => (tp, id) }
      val links = ts.sortBy(t => (t.pred, t.subj == "we", t.subj, t.obj))
      val sb = new StringBuilder
      sb ++= "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n"
      sb ++= "<graphml xmlns=\"http://graphml.graphdrawing.org/xmlns\">\n"
      sb ++= "  <key id=\"label\" for=\"node\" attr.name=\"label\" attr.type=\"string\"/>\n"
      sb ++= "  <key id=\"type\" for=\"node\" attr.name=\"type\" attr.type=\"string\"/>\n"
      sb ++= "  <key id=\"relationship\" for=\"edge\" attr.name=\"relationship\" attr.type=\"string\"/>\n"
      sb ++= "  <key id=\"text\" for=\"edge\" attr.name=\"text\" attr.type=\"string\"/>\n"
      sb ++= s"""  <graph id="${esc(url)}" edgedefault="directed">\n"""
      nodes.foreach { case (id, tp) =>
        sb ++= s"""    <node id="${esc(id)}"><data key="label">${esc(id)}</data><data key="type">${esc(tp)}</data></node>\n"""
      }
      links.zipWithIndex.foreach { case (t, i) =>
        sb ++= s"""    <edge id="e$i" source="${esc(t.subj)}" target="${esc(t.obj)}">"""
        sb ++= s"""<data key="relationship">${esc(t.pred)}</data>"""
        sb ++= s"""<data key="text">${esc(t.text.mkString("\n"))}</data></edge>\n"""
      }
      sb ++= "  </graph>\n</graphml>\n"
      (url, sb.toString)
    }
  }

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
