package graft.kg

import java.sql.Timestamp

/** Core data model of the KG-construction pipeline (SURVEY.md §1).
  *
  * Everything is a plain case class with a Spark `Encoder`, so the pipeline
  * stays a typed `Dataset` flow end-to-end (BASELINE.json input_hint).
  */
object Model {

  /** Input row: a Common-Crawl-style web page (cf. BASELINE.json input_hint). */
  final case class WebPage(
      url: String,
      warc_ts: Timestamp,
      html: Array[Byte],
      text: String,
      lang: String)

  /** One structural segment of a page — HEADING / LISTITEM / TEXT
    * (reference: poligrapher/document.py:46-81). `parentId` encodes the
    * segment tree; -1 = root. `text` is already cleaned (TextClean). */
  final case class Segment(
      url: String,
      segId: Int,
      segType: String,
      parentId: Int,
      text: String)

  /** Global token key inside one document: (segment id, token index)
    * (reference token provenance, poligrapher/document.py:111-121). */
  final case class Src(seg: Int, tok: Int) {
    def key: Long = seg.toLong << 32 | (tok & 0xffffffffL)
  }
  object Src { implicit val ord: Ordering[Src] = Ordering.by(s => (s.seg, s.tok)) }

  /** Typed edge in the per-document token-relationship graph
    * (reference: document.link, poligrapher/document.py:232-248). */
  final case class TokenEdge(url: String, src: Src, dst: Src, rel: String)

  /** Final knowledge-graph triple (reference graph node-link output,
    * poligrapher/scripts/build_graph.py:435-477). */
  final case class Triple(
      url: String,
      subj: String,
      subjType: String,
      pred: String,
      obj: String,
      objType: String,
      text: Seq[String],
      purposes: Map[String, Seq[String]])

  /** North-rule lineage row: per-partition stage metrics. */
  final case class LineageRow(
      runId: String,
      stage: String,
      partitionId: Int,
      rowsOut: Long,
      wallMs: Long)

  val Collect = "COLLECT"
  val Subsum = "SUBSUM"
  val Coref = "COREF"
  val Purpose = "PURPOSE"

  /** Sentinel purpose label carried by kernel output when classification is
    * deferred to the corpus-level batched scoring stage (A7): the per-doc
    * build keeps raw purpose phrases under this key, and
    * `KgPipeline.relabelPurposes` replaces it with real labels. */
  val RawPurposeLabel = "_RAW_"

  /** Edge-type universe (reference collection_annotator.py:322-339). */
  val PositiveEdgeTypes: Set[String] =
    Set("COLLECT", "BE_SHARED", "BE_SOLD", "USE", "STORE")
  val NegativeEdgeTypes: Set[String] = PositiveEdgeTypes.map("NOT_" + _)
  val CollectEdgeTypes: Set[String] = PositiveEdgeTypes ++ NegativeEdgeTypes
}
