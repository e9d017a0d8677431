package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.gen.CorpusGen
import graft.nlp.Lexicon

/** KG pipeline query surface (§3.2 KGraph API as DataFrame queries).
  *
  * Inputs are the deterministic synthetic corpus (fixed N_DOCS/seed — no
  * external data), so every query has an exact oracle: a VALUES literal
  * generated from the same ground truth. The driver's DuckDB compare then
  * verifies the *entire* Spark pipeline against construction-time truth.
  */
object KgQueries {

  val N_DOCS = 60
  val SEED = 42L

  private lazy val truthRows: Vector[CorpusGen.Truth] =
    CorpusGen.corpus(N_DOCS, SEED).flatMap(_.truth)

  private def esc(s: String): String = "'" + s.replace("'", "''") + "'"

  private def valuesSql(cols: Seq[String], rows: Seq[Seq[String]], orderBy: Seq[String]): String = {
    require(rows.nonEmpty, "empty VALUES oracle")
    val vals = rows.map(r => r.map(esc).mkString("(", ", ", ")")).mkString(", ")
    s"SELECT * FROM (VALUES $vals) AS t(${cols.mkString(", ")}) ORDER BY ${orderBy.mkString(", ")}"
  }

  // ------------------------------------------------------------------ queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Full pipeline → (url, subj, pred, obj)
    "kg_triples" -> ((s, _) => {
      KgPipeline.run(s, N_DOCS, SEED)
        .select(col("url"), col("subj"), col("pred"), col("obj"))
        .orderBy("url", "subj", "pred", "obj")
    }),

    // "original" build variant: positive edges collapse to COLLECT key,
    // negatives dropped (reference build_graph.py:86-95 variant switch)
    "kg_triples_original" -> ((s, _) => {
      KgPipeline.run(s, N_DOCS, SEED, variant = "original")
        .select(col("url"), col("subj"), col("pred"), col("obj"))
        .orderBy("url", "subj", "pred", "obj")
    }),

    // Triples with evidence + purposes (no SQL oracle: map/array columns)
    "kg_triples_full" -> ((s, _) => {
      KgPipeline.run(s, N_DOCS, SEED).toDF().orderBy("url", "subj", "pred", "obj")
    }),

    // J1/A1: exact P/R against ground truth, computed distributed
    "kg_eval_pr" -> ((s, _) => {
      val got = KgPipeline.run(s, N_DOCS, SEED)
        .select(col("url"), col("subj"), col("pred"), col("obj")).distinct()
      val want = KgPipeline.truth(s, N_DOCS, SEED).toDF()
        .select(col("url"), col("subj"), col("pred"), col("obj")).distinct()
      val keys = Seq("url", "subj", "pred", "obj")
      val tp = got.join(want, keys, "left_semi").count()
      val fp = got.join(want, keys, "left_anti").count()
      val fn = want.join(got, keys, "left_anti").count()
      import s.implicits._
      Seq((tp, fp, fn,
        math.round(tp.toDouble / math.max(1, tp + fp) * 10000) / 10000.0,
        math.round(tp.toDouble / math.max(1, tp + fn) * 10000) / 10000.0))
        .toDF("tp", "fp", "fn", "precision", "recall")
    }),

    // A2: per-predicate edge statistics
    "kg_collect_stats" -> ((s, _) => {
      KgPipeline.run(s, N_DOCS, SEED)
        .groupBy(col("pred"))
        .agg(count(lit(1)).as("n_edges"), countDistinct(col("url")).as("n_policies"))
        .orderBy("pred")
    }),

    // Purposes attached to edges (exploded)
    "kg_purposes" -> ((s, _) => {
      KgPipeline.run(s, N_DOCS, SEED)
        .select(col("url"), col("subj"), col("pred"), col("obj"),
          explode(map_keys(col("purposes"))).as("purpose"))
        .orderBy("url", "subj", "pred", "obj", "purpose")
    }),

    // A5: evidence sentences per edge (substring-deduped, ordered) — full
    // byte-level verification of the text column against construction truth
    "kg_evidence" -> ((s, _) => {
      KgPipeline.run(s, N_DOCS, SEED).toDF()
        .select(col("url"), col("subj"), col("pred"), col("obj"),
          concat_ws(" || ", col("text")).as("evidence"))
        .orderBy("url", "subj", "pred", "obj")
    }),

    // A4/U6: purpose phrases attached to edges (exact span text)
    "kg_purpose_texts" -> ((s, _) => {
      KgPipeline.run(s, N_DOCS, SEED).toDF()
        .select(col("url"), col("subj"), col("obj"),
          explode(flatten(map_values(col("purposes")))).as("purpose_text"))
        .distinct()
        .orderBy("url", "subj", "obj", "purpose_text")
    }),

    // KGraph.who_collect('email address'): direct collectors + collectors of
    // a subsuming category (graph_utils.py:230-236 + ancestors 238-268)
    "kg_who_collect" -> ((s, _) => {
      val t = KgPipeline.run(s, N_DOCS, SEED).cache()
      val collects = t.filter(col("pred") === "COLLECT")
        .select(col("url"), col("subj"), col("obj"))
      val sub = t.filter(col("pred") === "SUBSUM")
        .select(col("url").as("surl"), col("subj").as("upper"), col("obj").as("lower"))
      val direct = collects.filter(col("obj") === "email address")
        .select(col("url"), col("subj"))
      val viaCat = collects
        .join(sub, collects("url") === sub("surl") &&
          collects("obj") === sub("upper") && sub("lower") === "email address")
        .select(collects("url"), collects("subj"))
      direct.union(viaCat).distinct()
        .withColumnRenamed("subj", "actor")
        .orderBy("url", "actor")
    }),

    // J9: contradiction pairs — same (url, subj, obj) with pred and NOT_pred
    "kg_contradictions" -> ((s, _) => {
      val t = KgPipeline.run(s, N_DOCS, SEED).cache()
      val pos = t.filter(!col("pred").startsWith("NOT_"))
        .select(col("url"), col("subj"), col("pred"), col("obj"))
      val neg = t.filter(col("pred").startsWith("NOT_"))
        .select(col("url").as("nurl"), col("subj").as("nsubj"),
          col("pred").as("npred"), col("obj").as("nobj"))
      pos.join(neg,
        pos("url") === col("nurl") && pos("subj") === col("nsubj") &&
          pos("obj") === col("nobj") &&
          concat(lit("NOT_"), pos("pred")) === col("npred"))
        .select(pos("url"), pos("subj"), pos("pred"), pos("obj"))
        .distinct()
        .orderBy("url", "subj", "pred", "obj")
    }),

    // G12: distributed connected components over the entity-alias graph
    "kg_alias_components" -> ((s, _) => {
      import s.implicits._
      val edges = aliasEdges.toDF("src", "dst")
      AliasResolution.connectedComponents(edges)
        .orderBy("vertex")
    }),

    // J7/J8/F7/G9: flow-to-policy consistency (broadcast ontology joins)
    "kg_flow_consistency" -> ((s, _) => {
      import s.implicits._
      val flowsDf = FlowConsistency.flows(N_DOCS, SEED)
        .toDF("url", "domain", "datatype")
      val triples = KgPipeline.run(s, N_DOCS, SEED).toDF()
      FlowConsistency.classify(s, flowsDf, triples)
        .orderBy("url", "domain", "datatype")
    }),

    // KGraph.datatypes (graph_utils.py:202-207): DATA nodes per policy
    "kg_datatypes" -> ((s, _) => {
      val t = KgPipeline.run(s, N_DOCS, SEED).toDF()
      t.filter(col("objType") === "DATA").select(col("url"), col("obj").as("term"))
        .union(t.filter(col("subjType") === "DATA").select(col("url"), col("subj").as("term")))
        .distinct().orderBy("url", "term")
    }),

    // KGraph.entities: ACTOR nodes per policy
    "kg_entities" -> ((s, _) => {
      val t = KgPipeline.run(s, N_DOCS, SEED).toDF()
      t.filter(col("subjType") === "ACTOR").select(col("url"), col("subj").as("term"))
        .union(t.filter(col("objType") === "ACTOR").select(col("url"), col("obj").as("term")))
        .distinct().orderBy("url", "term")
    }),

    // ExtKGraph.can_collect('phone number'): direct, per-policy SUBSUM
    // ancestor, or data-ontology ancestor (G8+G9)
    "kg_can_collect" -> ((s, _) => {
      import s.implicits._
      val dt = "phone number"
      val t = KgPipeline.run(s, N_DOCS, SEED).toDF().cache()
      val collects = t.filter(col("pred") === "COLLECT")
        .select(col("url"), col("subj"), col("obj"))
      val sub = t.filter(col("pred") === "SUBSUM")
        .select(col("url").as("surl"), col("subj").as("upper"), col("obj").as("lower"))
      val ontAnc = Ontology.dataClosure.filter(_._2 == dt).map(_._1).toDF("anc")
      val direct = collects.filter(col("obj") === dt)
      val viaSub = collects.join(sub, collects("url") === col("surl") &&
        collects("obj") === col("upper") && col("lower") === dt)
        .select(collects("url"), collects("subj"), collects("obj"))
      val viaOnt = collects.join(broadcast(ontAnc), col("obj") === col("anc"))
        .select(collects("url"), collects("subj"), collects("obj"))
      direct.union(viaSub).union(viaOnt)
        .select(col("url"), col("subj").as("actor")).distinct()
        .orderBy("url", "actor")
    }),

    // A6: terms defined by SUBSUM in many policies
    "kg_term_defs" -> ((s, _) => {
      KgPipeline.run(s, N_DOCS, SEED).toDF()
        .filter(col("pred") === "SUBSUM")
        .groupBy(col("subj").as("term"))
        .agg(countDistinct(col("url")).as("n_policies"))
        .filter(col("n_policies") >= 2)
        .orderBy("term")
    }),

    // S10: checksum dedup — pages unioned with exact copies (url suffix
    // changes, html identical) collapse back to the original count
    "kg_page_dedup" -> ((s, _) => {
      import s.implicits._
      val ps = KgPipeline.pages(s, N_DOCS, SEED)
      val dups = ps.limit(20).map(p => p.copy(url = p.url + "?copy=1"))
      val deduped = KgPipeline.dedupPages(ps.union(dups))
      Seq((ps.count(), ps.union(dups).count(), deduped.count()))
        .toDF("n_pages", "n_with_dups", "n_after_dedup")
    }),

    // W4: deterministic validation sample of edges (seeded pick — here a
    // length-hash both engines can compute; reference uses random.seed(0))
    "kg_validation_sample" -> ((s, _) => {
      KgPipeline.run(s, N_DOCS, SEED).toDF()
        .select(col("url"), col("subj"), col("pred"), col("obj"))
        .filter((length(col("url")) + length(col("subj")) * 31 +
          length(col("pred")) * 7 + length(col("obj")) * 3) % 11 === 0)
        .orderBy("url", "subj", "pred", "obj")
    }),

    // §3.2: the KGraph analysis surface is plain SQL over the materialized
    // triple view — Catalyst plans/reorders the whole query (this is
    // who_collect expressed in SQL rather than the DataFrame DSL)
    "kg_sql_who_collect" -> ((s, _) => {
      KgPipeline.run(s, N_DOCS, SEED).toDF().createOrReplaceTempView("triples")
      s.sql("""
        SELECT url, subj AS actor FROM triples
        WHERE pred = 'COLLECT' AND obj = 'email address'
        UNION
        SELECT c.url, c.subj AS actor
        FROM triples c
        JOIN triples s0 ON c.url = s0.url AND s0.pred = 'SUBSUM'
          AND c.obj = s0.subj AND s0.obj = 'email address'
        WHERE c.pred = 'COLLECT'
        ORDER BY url, actor""")
    }),

    // A3: per-datatype disclosure matrix (collect / shared / sold / denied)
    "kg_summary_matrix" -> ((s, _) => {
      KgPipeline.run(s, N_DOCS, SEED).toDF()
        .filter(col("objType") === "DATA")
        .groupBy(col("obj").as("datatype"))
        .agg(
          countDistinct(when(col("pred") === "COLLECT", col("url"))).as("n_collect"),
          countDistinct(when(col("pred") === "BE_SHARED", col("url"))).as("n_shared"),
          countDistinct(when(col("pred").startsWith("NOT_"), col("url"))).as("n_denied"))
        .orderBy("datatype")
    }))

  // ------------------------------------------------------------------ oracles

  private def aliasEdges: Seq[(String, String)] =
    Lexicon.entityInfo.toSeq.sortBy(_._1).flatMap { case (canon, (aliases, _)) =>
      aliases.toSeq.sorted.map(a => (a, s"entity:$canon"))
    }

  private def unionFindComponents(edges: Seq[(String, String)]): Map[String, String] = {
    val parent = scala.collection.mutable.Map[String, String]()
    def find(x: String): String = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    verts.map(v => v -> find(v)).toMap
  }

  def oracleSql: Map[String, String] = {
    val t4 = truthRows.map(t => Seq(t.url, t.subj, t.pred, t.obj)).distinct
      .sortBy(r => (r(0), r(1), r(2), r(3)))

    val stats = truthRows.groupBy(_.pred).toSeq.sortBy(_._1).map { case (p, rs) =>
      Seq(p, rs.size.toString, rs.map(_.url).distinct.size.toString)
    }

    val purposes = truthRows.filter(_.purpose.nonEmpty)
      .flatMap(t => t.purpose.split(',').map(p => Seq(t.url, t.subj, t.pred, t.obj, p)))
      .distinct.sortBy(r => (r(0), r(1), r(3), r(4)))

    val whoCollect = {
      val collects = truthRows.filter(_.pred == "COLLECT")
      val subs = truthRows.filter(_.pred == "SUBSUM")
      val direct = collects.filter(_.obj == "email address").map(t => (t.url, t.subj))
      val via = for {
        s <- subs if s.obj == "email address"
        c <- collects if c.url == s.url && c.obj == s.subj
      } yield (c.url, c.subj)
      (direct ++ via).distinct.sorted.map { case (u, a) => Seq(u, a) }
    }

    val contradictions = {
      val pos = truthRows.filterNot(_.pred.startsWith("NOT_"))
      val neg = truthRows.filter(_.pred.startsWith("NOT_"))
        .map(t => (t.url, t.subj, t.pred, t.obj)).toSet
      pos.filter(t => neg.contains((t.url, t.subj, "NOT_" + t.pred, t.obj)))
        .map(t => Seq(t.url, t.subj, t.pred, t.obj)).distinct
        .sortBy(r => (r(0), r(1), r(2), r(3)))
    }

    val comps = unionFindComponents(aliasEdges).toSeq.sorted.map { case (v, c) => Seq(v, c) }

    val flowVerdicts = FlowConsistency.classifyTruth(N_DOCS, SEED)
      .sortBy(identity).map { case (u, d, t0, v) => Seq(u, d, t0, v) }

    val collectFamily = Model.CollectEdgeTypes
    val dataTerms = truthRows.flatMap { t =>
      val fromObj = if (collectFamily(t.pred) || t.pred == "SUBSUM") Seq((t.url, t.obj)) else Nil
      val fromSubj = if (t.pred == "SUBSUM") Seq((t.url, t.subj)) else Nil
      fromObj ++ fromSubj
    }.distinct.sorted.map { case (u, x) => Seq(u, x) }

    val actorTerms = truthRows.filter(t => collectFamily(t.pred))
      .map(t => (t.url, t.subj)).distinct.sorted.map { case (u, x) => Seq(u, x) }

    val canCollect = {
      val dt = "phone number"
      val ontAnc = Ontology.dataClosure.filter(_._2 == dt).map(_._1).toSet
      val collects = truthRows.filter(_.pred == "COLLECT")
      val subs = truthRows.filter(_.pred == "SUBSUM")
      val direct = collects.filter(_.obj == dt)
      val viaSub = collects.filter(c => subs.exists(s =>
        s.url == c.url && s.subj == c.obj && s.obj == dt))
      val viaOnt = collects.filter(c => ontAnc(c.obj))
      (direct ++ viaSub ++ viaOnt).map(c => (c.url, c.subj)).distinct.sorted
        .map { case (u, a) => Seq(u, a) }
    }

    val termDefs = truthRows.filter(_.pred == "SUBSUM")
      .groupBy(_.subj).view.mapValues(_.map(_.url).distinct.size).toSeq
      .filter(_._2 >= 2).sortBy(_._1)
      .map { case (t0, n) => Seq(t0, n.toString) }

    val summary = truthRows
      .filter(t => collectFamily(t.pred) || t.pred == "SUBSUM")
      .groupBy(_.obj).toSeq.sortBy(_._1).map { case (dt, rs) =>
        Seq(dt,
          rs.filter(_.pred == "COLLECT").map(_.url).distinct.size.toString,
          rs.filter(_.pred == "BE_SHARED").map(_.url).distinct.size.toString,
          rs.filter(_.pred.startsWith("NOT_")).map(_.url).distinct.size.toString)
      }

    val m = scala.collection.mutable.Map[String, String]()
    m("kg_triples") = valuesSql(Seq("url", "subj", "pred", "obj"), t4,
      Seq("url", "subj", "pred", "obj"))
    val t4orig = truthRows.collect {
      case t if t.pred == "SUBSUM" => Seq(t.url, t.subj, t.pred, t.obj)
      case t if Model.PositiveEdgeTypes(t.pred) => Seq(t.url, t.subj, "COLLECT", t.obj)
    }.distinct.sortBy(r => (r(0), r(1), r(2), r(3)))
    m("kg_triples_original") = valuesSql(Seq("url", "subj", "pred", "obj"), t4orig,
      Seq("url", "subj", "pred", "obj"))
    m("kg_eval_pr") = {
      val n = t4.size
      s"SELECT CAST($n AS BIGINT) AS tp, CAST(0 AS BIGINT) AS fp, CAST(0 AS BIGINT) AS fn, 1.0::DOUBLE AS precision, 1.0::DOUBLE AS recall"
    }
    // counts cast to BIGINT so dtypes match Spark's
    m("kg_collect_stats") =
      s"SELECT pred, CAST(n_edges_s AS BIGINT) AS n_edges, CAST(n_policies_s AS BIGINT) AS n_policies FROM (${valuesSqlNoOrder(Seq("pred", "n_edges_s", "n_policies_s"), stats)}) ORDER BY pred"
    if (purposes.nonEmpty)
      m("kg_purposes") = valuesSql(Seq("url", "subj", "pred", "obj", "purpose"),
        purposes, Seq("url", "subj", "pred", "obj", "purpose"))
    val evidence = truthRows
      .map(t => Seq(t.url, t.subj, t.pred, t.obj, t.evidence.mkString(" || ")))
      .sortBy(r => (r(0), r(1), r(2), r(3)))
    m("kg_evidence") = valuesSql(Seq("url", "subj", "pred", "obj", "evidence"),
      evidence, Seq("url", "subj", "pred", "obj"))
    val ptexts = truthRows
      .flatMap(t => t.purposeTexts.map(pt => Seq(t.url, t.subj, t.obj, pt)))
      .distinct.sortBy(r => (r(0), r(1), r(2), r(3)))
    if (ptexts.nonEmpty)
      m("kg_purpose_texts") = valuesSql(Seq("url", "subj", "obj", "purpose_text"),
        ptexts, Seq("url", "subj", "obj", "purpose_text"))
    if (whoCollect.nonEmpty) {
      m("kg_who_collect") = valuesSql(Seq("url", "actor"), whoCollect, Seq("url", "actor"))
      m("kg_sql_who_collect") = m("kg_who_collect")
    }
    if (contradictions.nonEmpty)
      m("kg_contradictions") = valuesSql(Seq("url", "subj", "pred", "obj"),
        contradictions, Seq("url", "subj", "pred", "obj"))
    m("kg_alias_components") = valuesSql(Seq("vertex", "component"), comps, Seq("vertex"))
    if (flowVerdicts.nonEmpty)
      m("kg_flow_consistency") = valuesSql(Seq("url", "domain", "datatype", "verdict"),
        flowVerdicts, Seq("url", "domain", "datatype"))
    m("kg_datatypes") = valuesSql(Seq("url", "term"), dataTerms, Seq("url", "term"))
    m("kg_entities") = valuesSql(Seq("url", "term"), actorTerms, Seq("url", "term"))
    if (canCollect.nonEmpty)
      m("kg_can_collect") = valuesSql(Seq("url", "actor"), canCollect, Seq("url", "actor"))
    if (termDefs.nonEmpty)
      m("kg_term_defs") =
        s"SELECT term, CAST(n_s AS BIGINT) AS n_policies FROM (${valuesSqlNoOrder(Seq("term", "n_s"), termDefs)}) ORDER BY term"
    m("kg_page_dedup") =
      s"SELECT CAST($N_DOCS AS BIGINT) AS n_pages, CAST(${N_DOCS + 20} AS BIGINT) AS n_with_dups, CAST($N_DOCS AS BIGINT) AS n_after_dedup"
    val sample = t4.filter { r =>
      (r(0).length + r(1).length * 31 + r(2).length * 7 + r(3).length * 3) % 11 == 0
    }
    if (sample.nonEmpty)
      m("kg_validation_sample") = valuesSql(Seq("url", "subj", "pred", "obj"),
        sample, Seq("url", "subj", "pred", "obj"))
    m("kg_summary_matrix") =
      s"SELECT datatype, CAST(c_s AS BIGINT) AS n_collect, CAST(s_s AS BIGINT) AS n_shared, CAST(d_s AS BIGINT) AS n_denied FROM (${valuesSqlNoOrder(Seq("datatype", "c_s", "s_s", "d_s"), summary)}) ORDER BY datatype"
    m.toMap
  }

  private def valuesSqlNoOrder(cols: Seq[String], rows: Seq[Seq[String]]): String = {
    val vals = rows.map(r => r.map(esc).mkString("(", ", ", ")")).mkString(", ")
    s"SELECT * FROM (VALUES $vals) AS t(${cols.mkString(", ")})"
  }
}
