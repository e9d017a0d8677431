package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.gen.CorpusGen

/** J7/J8/F7/G11: flow-to-policy consistency analysis (reference
  * flow_consistency_analysis.py:13-203).
  *
  * Observed data flows (app url, destination domain, datatype) are checked
  * against the app's knowledge graph: the destination resolves to an entity
  * through the registered-domain map (broadcast J8), the flow is consistent
  * when the policy discloses a COLLECT-family edge whose actor is that
  * entity (or `we` for first-party flows, or an entity-ontology ancestor)
  * and whose data type is the flow's datatype or a data-ontology /
  * per-policy SUBSUM ancestor of it (G9 ontology grafting as broadcast
  * closure joins).
  */
object FlowConsistency {

  final case class Flow(url: String, domain: String, datatype: String)

  /** Deterministic synthetic flows derived from the corpus truth: a mix of
    * consistent third-party flows, first-party flows through an ontology
    * category, unknown trackers, and undisclosed flows. */
  def flows(nDocs: Int, seed: Long = 42L): Seq[Flow] = {
    val domainOf = graft.nlp.Lexicon.entityInfo.map { case (c, (_, ds)) =>
      c -> Ontology.registeredDomain(ds.head)
    }
    val ontChildren = Ontology.dataClosure.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    CorpusGen.corpus(nDocs, seed).flatMap { gp =>
      val url = gp.page.url
      val i = url.replaceAll("[^0-9]", "").toInt
      val truths = gp.truth
      i % 6 match {
        case 0 =>
          // consistent third-party flow: first shared edge whose actor has a
          // known domain
          truths.find(t => t.pred == "BE_SHARED" && domainOf.contains(t.subj))
            .map(t => Flow(url, domainOf(t.subj), t.obj)).toSeq
        case 1 =>
          // first-party flow of an ontology child of a collected category
          truths.collectFirst {
            case t if t.pred == "COLLECT" && t.subj == "we" &&
              ontChildren.getOrElse(t.obj, Nil).nonEmpty =>
              Flow(url, Ontology.registeredDomain(Ontology.hostOf(url)),
                ontChildren(t.obj).min)
          }.toSeq
        case 2 =>
          // unknown tracker domain
          Seq(Flow(url, "trackers-r-us.example", "email address"))
        case 3 =>
          // undisclosed google flow of a never-mentioned datatype, via a
          // subdomain under a multi-label public suffix — exercises the PSL
          // reduction end to end ("metrics.google.co.uk" → "google.co.uk")
          Seq(Flow(url, "metrics.google.co.uk", "voiceprint"))
        case 4 =>
          // member of a sharing actor category: consistent only through the
          // per-policy ACTOR SUBSUM chain ("third parties, such as Stripe")
          truths.collectFirst {
            case t if t.pred == "SUBSUM" && t.subjType == "ACTOR" &&
              domainOf.contains(t.obj) &&
              truths.exists(x => x.pred == "BE_SHARED" && x.subj == t.subj) =>
              Flow(url, domainOf(t.obj),
                truths.find(x => x.pred == "BE_SHARED" && x.subj == t.subj).get.obj)
          }.toSeq
        case _ =>
          // first-party flow of a chain leaf: consistent only through the
          // TRANSITIVE per-policy data SUBSUM closure (depth-2 chains)
          truths.collectFirst {
            case t if t.pred == "SUBSUM" && t.subjType == "DATA" &&
              truths.exists(c => c.pred == "SUBSUM" && c.subjType == "DATA" &&
                c.obj == t.subj) =>
              Flow(url, Ontology.registeredDomain(Ontology.hostOf(url)), t.obj)
          }.toSeq
      }
    }
  }

  /** Spark-side classification: everything is a broadcast join against the
    * (tiny) ontology/domain tables plus one join against the policy triples.
    * Output verdicts: consistent | inconsistent | unknown_entity. */
  def classify(spark: SparkSession, flowsDf: DataFrame, triples: DataFrame): DataFrame = {
    import spark.implicits._
    val domains = Ontology.domainEntity.toDF("domain", "entity")
    val dataAnc = Ontology.dataClosure.map(_.swap).toDF("fdt", "anc_dt") // child -> ancestor
    val entAnc = Ontology.entityClosure.map(_.swap).toDF("fent", "anc_ent")

    // resolve destination entity: known map, else first-party when the flow
    // domain equals the app's own registered domain
    val resolved = flowsDf
      // F7: reduce the observed destination host to its PSL registered
      // domain in-plan (codegen column expression, no UDF) before the
      // entity-map join — "metrics.google.co.uk" → "google.co.uk"
      .withColumn("domain_reg", Ontology.registeredDomainCol(col("domain")))
      .join(broadcast(domains.withColumnRenamed("domain", "rdomain")),
        col("domain_reg") === col("rdomain"), "left_outer")
      .drop("rdomain")
      .withColumn("app_domain",
        regexp_extract(col("url"), "^https?://([^/]+)", 1))
      .withColumn("entity",
        when(col("entity").isNotNull, col("entity"))
          .when(expr("app_domain LIKE '%' || domain_reg"), lit("we")))

    val collectPreds = Seq("COLLECT", "BE_SHARED", "BE_SOLD", "USE", "STORE")
    val disclosures = triples
      .filter(col("pred").isin(collectPreds: _*))
      .select(col("url").as("durl"), col("subj").as("dactor"), col("obj").as("ddt"))

    // acceptable (actor, datatype) pairs per flow: entity itself, an
    // entity-ontology ancestor, or a per-policy ACTOR-SUBSUM ancestor;
    // datatype itself, a data-ontology ancestor, or a per-policy SUBSUM
    // ancestor — TRANSITIVELY, matching the reference's hypernym BFS
    // (flow_consistency_analysis.py:118-203): per-doc closures computed in
    // one mapGroups pass over the (tiny) per-policy SUBSUM graphs
    val subsumClosure = {
      import spark.implicits._
      triples.filter(col("pred") === "SUBSUM")
        .select(col("url"), col("subj"), col("obj"), col("subjType"))
        .as[(String, String, String, String)]
        .groupByKey(_._1).flatMapGroups { (url, it) =>
          val edges = it.toVector
          // parent pointers per node type universe (data: subj SUBSUM obj;
          // actors share the same orientation)
          val radj = edges.groupBy(_._3).view
            .mapValues(_.map(e => (e._2, e._4))).toMap
          val descs = edges.map(e => (e._3, e._4)).distinct
          descs.iterator.flatMap { case (d, _) =>
            val seen = scala.collection.mutable.Set(d)
            val q = scala.collection.mutable.Queue(d)
            val out = Vector.newBuilder[(String, String, String, String)]
            while (q.nonEmpty) {
              radj.getOrElse(q.dequeue(), Vector.empty).foreach { case (a, at) =>
                if (!seen.contains(a)) {
                  seen += a; q.enqueue(a); out += ((url, d, a, at))
                }
              }
            }
            out.result().iterator
          }
        }.toDF("surl", "sdesc", "sanc", "sancType")
    }
    val dtSubsum = subsumClosure.filter(col("sancType") === "DATA")
      .select(col("surl"), col("sdesc"), col("sanc"))
    val entSubsum = subsumClosure.filter(col("sancType") === "ACTOR")
      .select(col("surl").as("eurl"), col("sdesc").as("edesc"), col("sanc").as("eanc"))

    val withDtCandidates = resolved
      .join(broadcast(dataAnc), col("datatype") === col("fdt"), "left_outer")
      .join(dtSubsum,
        col("url") === col("surl") && col("datatype") === col("sdesc"), "left_outer")
      .withColumn("dt_cand",
        array_distinct(filter(array(col("datatype"), col("anc_dt"), col("sanc")), _.isNotNull)))
    val withEntCandidates = withDtCandidates
      .join(broadcast(entAnc), col("entity") === col("fent"), "left_outer")
      .join(entSubsum,
        col("url") === col("eurl") && col("entity") === col("edesc"), "left_outer")
      .withColumn("ent_cand",
        array_distinct(filter(array(col("entity"), col("anc_ent"), col("eanc")), _.isNotNull)))

    val matched = withEntCandidates
      .join(disclosures,
        col("url") === col("durl") &&
          array_contains(col("ent_cand"), col("dactor")) &&
          array_contains(col("dt_cand"), col("ddt")),
        "left_outer")
      .groupBy(col("url"), col("domain"), col("datatype"))
      .agg(max(col("entity")).as("entity"),
        count(col("durl")).as("n_matches"))

    matched.select(col("url"), col("domain"), col("datatype"),
      when(col("entity").isNull, "unknown_entity")
        .when(col("n_matches") > 0, "consistent")
        .otherwise("inconsistent").as("verdict"))
  }

  /** Independent oracle-side classification over ground truth (plain Scala,
    * no Spark — a genuinely separate implementation for the DuckDB VALUES
    * oracle). */
  def classifyTruth(nDocs: Int, seed: Long = 42L): Seq[(String, String, String, String)] = {
    val byUrl = CorpusGen.corpus(nDocs, seed).map(gp => gp.page.url -> gp.truth).toMap
    val domains = Ontology.domainEntity.toMap
    val dataAnc = Ontology.dataClosure.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val entAnc = Ontology.entityClosure.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val collectPreds = Set("COLLECT", "BE_SHARED", "BE_SOLD", "USE", "STORE")
    flows(nDocs, seed).map { f =>
      val appDomain = Ontology.registeredDomain(Ontology.hostOf(f.url))
      val reg = Ontology.registeredDomain(f.domain)
      val entity = domains.get(reg)
        .orElse(if (reg == appDomain) Some("we") else None)
      val verdict = entity match {
        case None => "unknown_entity"
        case Some(e) =>
          val truths = byUrl.getOrElse(f.url, Vector.empty)
          // per-policy transitive SUBSUM ancestors (fixpoint — independent
          // of the engine's BFS)
          def policyAnc(node: String, tpe: String): Set[String] = {
            val up = truths.filter(t => t.pred == "SUBSUM" && t.subjType == tpe)
              .map(t => t.obj -> t.subj)
            var anc = Set.empty[String]
            var frontier = Set(node)
            var grown = true
            while (grown) {
              val next = up.collect { case (d, a) if frontier(d) && !anc(a) => a }.toSet
              grown = next.nonEmpty
              anc ++= next
              frontier = next
            }
            anc
          }
          val dtCand = Set(f.datatype) ++ dataAnc.getOrElse(f.datatype, Set.empty) ++
            policyAnc(f.datatype, "DATA")
          val entCand = Set(e) ++ entAnc.getOrElse(e, Set.empty) ++
            policyAnc(e, "ACTOR")
          val ok = truths.exists(t => collectPreds(t.pred) &&
            entCand(t.subj) && dtCand(t.obj))
          if (ok) "consistent" else "inconsistent"
      }
      (f.url, f.domain, f.datatype, verdict)
    }
  }
}
