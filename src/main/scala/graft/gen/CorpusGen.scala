package graft.gen

import java.sql.Timestamp

import graft.kg.Model.WebPage

/** Deterministic synthetic policy corpus with ground truth known by
  * construction (SURVEY.md §5 t2 / FIXTURES.md §1; the same synthesis idea
  * the reference uses for NER training data,
  * models/named-entity-recognition/gen_ner_data.py:85-143).
  *
  * Every page is assembled from sentence templates whose emitted triples are
  * fixed by the template semantics (ACTION_MAP of collection_annotator.py:
  * 322-339), so `truth` is exact — P/R against it measures the whole
  * pipeline. Seeded SplitMix64; no wall clock, no external data.
  */
object CorpusGen {

  final case class Truth(url: String, subj: String, pred: String, obj: String,
      purpose: String, // comma-joined sorted purpose labels or ""
      evidence: Vector[String] = Vector.empty, // sentences, paragraph order
      purposeTexts: Vector[String] = Vector.empty, // purpose phrases
      subjType: String = "ACTOR", // node types — needed since round 2 adds
      objType: String = "DATA") // ACTOR-SUBSUM-ACTOR and DATA-SUBSUM-DATA rows

  /** corefLabels: (anaphor sentence text, antecedent canonical term) — the
    * doccano-style label channel for the coref eval harness (reference
    * evals/coref/validate-coref.py labels). */
  final class GenPage(val page: WebPage,
      truthThunk: () => Vector[Truth],
      corefThunk: () => Vector[(String, String)]) {
    /** Lazy: the KG bench path reads only `page`; truth dedup (the oracle's
      * evidence/purpose merge) is paid only by oracle/eval consumers. */
    lazy val truth: Vector[Truth] = truthThunk()
    lazy val corefLabels: Vector[(String, String)] = corefThunk()
  }

  // (surface form with possessive, canonical term)
  private val dataTerms: Vector[(String, String)] = Vector(
    ("your email address", "email address"),
    ("your IP address", "ip address"),
    ("your phone number", "phone number"),
    ("your precise location", "precise geolocation"),
    ("your browsing history", "browsing / search history"),
    ("device identifiers", "device identifier"),
    ("payment information", "payment information"),
    ("your date of birth", "date of birth"),
    ("cookies", "cookie / pixel tag"),
    ("your age", "age"),
    ("usage data", "usage information"),
    ("crash reports", "crash / log data"),
    ("health information", "health information"),
    ("account credentials", "account credential"),
    ("your postal address", "postal address"),
    ("your gender", "gender"))

  // list-item surface forms (no possessive)
  private val listItems: Vector[(String, String)] = Vector(
    ("Email address", "email address"),
    ("Phone number", "phone number"),
    ("Precise location", "precise geolocation"),
    ("IP address", "ip address"),
    ("Payment information", "payment information"),
    ("Date of birth", "date of birth"),
    ("Usage data", "usage information"),
    ("Device identifiers", "device identifier"))

  private val actors: Vector[(String, String)] = Vector(
    ("Our partners", "business partner"),
    ("Advertisers", "advertiser"),
    ("Analytics providers", "analytic provider"),
    ("Service providers", "service provider"),
    ("Third parties", "third party"),
    ("Google", "google"),
    ("Facebook", "facebook"),
    ("Law enforcement", "government"))

  private val categories: Vector[(String, String)] = Vector(
    ("personal information", "personal information"),
    ("device information", "device information"),
    ("contact information", "contact information"),
    ("demographic information", "demographic information"))

  private val purposes: Vector[(String, String)] = Vector(
    ("to improve our services", "services"),
    ("for advertising purposes", "advertising"),
    ("for analytics purposes", "analytics"),
    ("for security purposes", "security"),
    ("to comply with legal obligations", "legal"))

  private val collectVerbs = Vector("collect", "gather", "obtain", "receive")
  private val negAux = Vector("do not", "will not", "never", "don't", "won't")

  // depth-2 SUBSUM chains (round 2, VERDICT #1): personal information →
  // mid category → leaf. Exercises transitive who_collect/can_collect —
  // the oracle computes the closure independently.
  private val chains: Vector[(String, String, String)] = Vector(
    // (mid surface == canonical, leaf surface, leaf canonical)
    ("contact information", "your email address", "email address"),
    ("contact information", "your phone number", "phone number"),
    ("demographic information", "your age", "age"),
    ("demographic information", "your gender", "gender"))

  // actor-category membership: "<category>, such as <Member>" — the member
  // reaches collected datatypes through the reversed (SUBSUM_BY) edge in the
  // reference's query graph (graph_utils.py:182-186).
  private val actorMembers: Vector[(String, String, String, String)] = Vector(
    ("third parties", "third party", "Stripe", "stripe"),
    ("advertisers", "advertiser", "Google", "google"),
    ("analytics providers", "analytic provider", "Mixpanel", "mixpanel"),
    ("service providers", "service provider", "PayPal", "paypal"))

  // first-party aliases for "We are <Company>." copula sentences (J6)
  private val firstPartyCos: Vector[(String, String)] = Vector(
    ("Google", "google"),
    ("Facebook", "facebook"),
    ("Amazon", "amazon"))

  // ontology-mediated contradiction material (category, leaf surface, leaf)
  private val contraPairs: Vector[(String, String, String)] = Vector(
    ("personal information", "your email address", "email address"),
    ("personal information", "your phone number", "phone number"),
    ("device information", "device identifiers", "device identifier"))

  /** SplitMix64 — deterministic, platform-independent. */
  final class Rng(seed0: Long) {
    private var s = seed0
    def nextLong(): Long = {
      s += 0x9e3779b97f4a7c15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def nextInt(n: Int): Int = (math.floorMod(nextLong(), n.toLong)).toInt
    def pick[T](v: Vector[T]): T = v(nextInt(v.length))
  }

  /** One generated paragraph: sentence html + its truth triples. */
  private def sentence(url: String, rng: Rng): (String, Vector[Truth]) = {
    val kind = rng.nextInt(24)
    val (dtS, dtC) = rng.pick(dataTerms)
    val (acS, acC) = rng.pick(actors)
    kind match {
      case 0 => // we collect DT
        val v = rng.pick(collectVerbs)
        (s"We $v $dtS.", Vector(Truth(url, "we", "COLLECT", dtC, "")))
      case 1 => // actor collects DT
        val v = rng.pick(collectVerbs)
        (s"$acS may $v $dtS.", Vector(Truth(url, acC, "COLLECT", dtC, "")))
      case 2 => // negated collect
        val na = rng.pick(negAux)
        (s"We $na collect $dtS.", Vector(Truth(url, "we", "NOT_COLLECT", dtC, "")))
      case 3 => // share with
        (s"We may share $dtS with ${acS.toLowerCase}.",
          Vector(Truth(url, acC, "BE_SHARED", dtC, ""),
            Truth(url, "we", "COLLECT", dtC, "")))
      case 4 => // not sell to
        (s"We do not sell $dtS to ${acS.toLowerCase}.",
          Vector(Truth(url, acC, "NOT_BE_SOLD", dtC, "")))
      case 5 => // use + purpose
        val (pS, pC) = rng.pick(purposes)
        // the extracted purpose span starts at the xcomp verb (reference
        // purpose_annotator left_end), so a "to X" surface loses the "to"
        val phrase = if (pS.startsWith("to ")) pS.drop(3) else pS
        (s"We use $dtS $pS.",
          Vector(Truth(url, "we", "USE", dtC, pC, purposeTexts = Vector(phrase))))
      case 6 => // store
        (s"We store $dtS.", Vector(Truth(url, "we", "STORE", dtC, "")))
      case 7 => // subsumption via such-as / including / like cues (U5)
        val (cS, cC) = rng.pick(categories)
        val (d1s, d1c) = dataTerms(rng.nextInt(dataTerms.length))
        var (d2s, d2c) = dataTerms(rng.nextInt(dataTerms.length))
        while (d2c == d1c) { val p = dataTerms(rng.nextInt(dataTerms.length)); d2s = p._1; d2c = p._2 }
        val cue = rng.pick(Vector(", such as", ", including", " like",
          ", e.g.", ", for example"))
        (s"We collect $cS$cue $d1s and $d2s.",
          Vector(Truth(url, "we", "COLLECT", cC, ""),
            Truth(url, cC, "SUBSUM", d1c, "", subjType = "DATA"),
            Truth(url, cC, "SUBSUM", d2c, "", subjType = "DATA")))
      case 8 => // passive share — the implicit sharer (first party) holds
        // the data, so the kernel's recall extension adds a we-collect
        (s"$dtS may be shared with ${acS.toLowerCase}.".capitalize,
          Vector(Truth(url, acC, "BE_SHARED", dtC, ""),
            Truth(url, "we", "COLLECT", dtC, "")))
      case 9 => // provide-with
        (s"We provide ${acS.toLowerCase} with $dtS.",
          Vector(Truth(url, acC, "BE_SHARED", dtC, ""),
            Truth(url, "we", "COLLECT", dtC, "")))
      case 10 => // allow-to-collect
        (s"You allow us to collect $dtS.",
          Vector(Truth(url, "we", "COLLECT", dtC, "")))
      case 11 => // access-to (USE)
        (s"$acS have access to $dtS.",
          Vector(Truth(url, acC, "USE", dtC, "")))
      case 12 => // children-subject (COPPA-style; exercises U7 + extended
        // variant's "@children" data-subject suffix)
        (s"We do not knowingly collect $dtS from children.",
          Vector(Truth(url, "we", "NOT_COLLECT", s"$dtC @children", "")))
      case 13 => // depth-2 SUBSUM chain across two sentences (VERDICT #1):
        // who_collect must walk the transitive closure to reach the leaf
        val (midC, leafS, leafC) = rng.pick(chains)
        val s1 = s"We collect personal information, such as $midC."
        val s2 = s"${midC.capitalize} includes $leafS."
        (s"$s1 $s2", Vector(
          Truth(url, "we", "COLLECT", "personal information", "", Vector(s1)),
          Truth(url, "personal information", "SUBSUM", midC, "", Vector(s1),
            subjType = "DATA"),
          Truth(url, midC, "SUBSUM", leafC, "", Vector(s2), subjType = "DATA")))
      case 14 => // actor-category membership: the member reaches collected
        // datatypes via the reversed SUBSUM edge (graph_utils.py:182-186)
        val (catS, catC, memS, memC) = rng.pick(actorMembers)
        (s"We may share $dtS with $catS, such as $memS.", Vector(
          Truth(url, catC, "BE_SHARED", dtC, ""),
          Truth(url, catC, "SUBSUM", memC, "", subjType = "ACTOR", objType = "ACTOR"),
          Truth(url, "we", "COLLECT", dtC, "")))
      case 15 => // first-party copula alias (J6, subsumption_annotator.py:
        // 418-451): company tuples classify as first-party in the eval
        val (compS, compC) = rng.pick(firstPartyCos)
        val (d2s, d2c) = rng.pick(dataTerms)
        val s1 = s"We are $compS."
        val s2 = s"$compS may collect $dtS."
        val s3 = s"We also collect $d2s."
        (s"$s1 $s2 $s3", Vector(
          Truth(url, "we", "SUBSUM", compC, "", Vector(s1),
            subjType = "ACTOR", objType = "ACTOR"),
          Truth(url, compC, "COLLECT", dtC, "", Vector(s2)),
          Truth(url, "we", "COLLECT", d2c, "", Vector(s3))))
      case 16 => // ontology-mediated contradiction (VERDICT #5): positive on
        // the leaf + negative on the category + in-doc SUBSUM between them
        val (catS, leafS, leafC) = rng.pick(contraPairs)
        val s1 = s"We collect $leafS."
        val s2 = s"We do not collect $catS."
        val s3 = s"${catS.capitalize} includes $leafS."
        (s"$s1 $s2 $s3", Vector(
          Truth(url, "we", "COLLECT", leafC, "", Vector(s1)),
          Truth(url, "we", "NOT_COLLECT", catS, "", Vector(s2)),
          Truth(url, catS, "SUBSUM", leafC, "", Vector(s3), subjType = "DATA")))
      case 17 => // negative phrase rule (VERDICT #8): "non personal
        // information" must NOT normalize to "personal information"
        val na = rng.pick(negAux)
        (s"We $na collect non personal information.",
          Vector(Truth(url, "we", "NOT_COLLECT", "UNSPECIFIED_DATA", "")))
      case 21 => // fronted adverbial clause — the wh/conditional opener
        // must not trip the interrogative filter
        val opener = rng.pick(Vector("When you visit our site",
          "If you contact us", "When you create an account"))
        (s"$opener, we may collect $dtS.",
          Vector(Truth(url, "we", "COLLECT", dtC, "")))
      case 20 => // parenthetical definition (SUBSUM_COLLECTIVELY,
        // subsumption_annotator.py:293-312): the defined term subsumes the
        // listed items and is then used by a later disclosure
        val (d1s, d1c) = rng.pick(dataTerms)
        var (d2s, d2c) = rng.pick(dataTerms)
        while (d2c == d1c) { val q = rng.pick(dataTerms); d2s = q._1; d2c = q._2 }
        val s1 = s"We may collect $d1s and $d2s (collectively, 'personal information')."
        val s2 = "We may share your personal information with advertisers."
        (s"$s1 $s2", Vector(
          Truth(url, "we", "COLLECT", d1c, "", Vector(s1)),
          Truth(url, "we", "COLLECT", d2c, "", Vector(s1)),
          Truth(url, "personal information", "SUBSUM", d1c, "", Vector(s1), subjType = "DATA"),
          Truth(url, "personal information", "SUBSUM", d2c, "", Vector(s1), subjType = "DATA"),
          Truth(url, "advertiser", "BE_SHARED", "personal information", "", Vector(s2)),
          Truth(url, "we", "COLLECT", "personal information", "", Vector(s2))))
      case 19 => // coordinated verbs sharing one object (conjunct
        // flattening, collection_annotator.py:67-90)
        if (rng.nextInt(2) == 0)
          (s"We collect and store $dtS.", Vector(
            Truth(url, "we", "COLLECT", dtC, ""),
            Truth(url, "we", "STORE", dtC, "")))
        else
          (s"We collect, use, and share $dtS.", Vector(
            Truth(url, "we", "COLLECT", dtC, ""),
            Truth(url, "we", "USE", dtC, "")))
      case 18 => // pronoun coreference across sentences (J4): "This
        // information" resolves to the previous sentence's datatype, so the
        // BE_SHARED edge lands on the real term after coref contraction
        val s1 = s"We collect $dtS."
        val s2 = s"This information may be shared with ${acS.toLowerCase}."
        (s"$s1 $s2", Vector(
          // the anaphoric share also yields the implicit-sharer collect, so
          // the merged we-collect cites both sentences
          Truth(url, "we", "COLLECT", dtC, "", Vector(s1, s2)),
          Truth(url, acC, "BE_SHARED", dtC, "", Vector(s1, s2))))
      case 22 => // figurative ingress (round-5 idiom verb classes): a
        // datum-subject motion verb with a first-party store destination
        // asserts collection — the holdout batches 9-10 families, kept
        // exercised at 24k-doc scale by the distributed digest oracle
        val frame = rng.pick(Vector(
          ("%s reaches our servers.", "COLLECT"),
          ("%s ends up in our records.", "COLLECT"),
          ("%s finds its way into our logs.", "COLLECT"),
          ("%s enters our systems.", "COLLECT")))
        (frame._1.format(dtS).capitalize,
          Vector(Truth(url, "we", frame._2, dtC, "")))
      case 23 => // figurative retention / possession presupposition
        if (rng.nextInt(2) == 0)
          (s"$dtS lingers in our archive.".capitalize,
            Vector(Truth(url, "we", "STORE", dtC, "")))
        else
          (s"We treat $dtS as confidential.",
            Vector(Truth(url, "we", "STORE", dtC, "")))
      case _ => ("", Vector.empty)
    }
  }

  /** List section: heading + intro + items. Style 0 is a real HTML list;
    * styles 1/2 render plain-text bullets inside <p> tags — the segmenter's
    * non-HTML list repair (reference document.py:516-608) must recover the
    * same LISTITEM structure, so the truth is identical. */
  private def listSection(url: String, rng: Rng): (String, Vector[Truth]) = {
    val k = 2 + rng.nextInt(3)
    val picked = {
      val idx = scala.collection.mutable.LinkedHashSet[Int]()
      while (idx.size < k) idx += rng.nextInt(listItems.length)
      idx.toVector.map(listItems)
    }
    val style = rng.nextInt(3)
    val items = style match {
      case 0 => s"<ul>${picked.map { case (s, _) => s"<li>$s</li>" }.mkString}</ul>"
      case 1 => picked.map { case (s, _) => s"<p>* $s</p>" }.mkString
      case _ => picked.zipWithIndex.map { case ((s, _), i) => s"<p>${i + 1}. $s</p>" }.mkString
    }
    val html = s"<h2>Information We Collect</h2><p>We collect the following information:</p>$items"
    (html, picked.map { case (s, c) =>
      Truth(url, "we", "COLLECT", c, "",
        evidence = Vector(s"We collect the following information: $s"))
    })
  }

  /** Generate a full page. ~6 paragraphs + optionally one list section. */
  def genPage(i: Int, seed: Long): GenPage = {
    val url = f"https://example-$i%05d.com/privacy"
    val rng = new Rng(seed ^ (i.toLong * 0x9e3779b97f4a7c15L))
    val nSent = 4 + rng.nextInt(4)
    val parts = Vector.newBuilder[String]
    val truth = Vector.newBuilder[Truth]
    val corefLabels = Vector.newBuilder[(String, String)]
    parts += "<h1>Privacy Policy</h1>"
    (0 until nSent).foreach { _ =>
      val (s, t) = sentence(url, rng)
      parts += s"<p>$s</p>"
      truth ++= t.map(x =>
        if (x.evidence.isEmpty) x.copy(evidence = Vector(s)) else x)
      // case 18 carries a coref label: anaphor sentence → antecedent term
      if (s.contains("This information may be shared with"))
        corefLabels += ((s.substring(s.indexOf("This information")),
          t.find(_.pred == "BE_SHARED").get.obj))
    }
    if (rng.nextInt(3) == 0) {
      val (h, t) = listSection(url, rng)
      parts += h
      truth ++= t
    }
    val html = parts.result().mkString("\n")
    val ts = new Timestamp(1700000000000L + (i.toLong * 86400000L % 31536000000L))
    val text = html.replaceAll("<[^>]*>", " ").replaceAll("\\s+", " ").trim
    // ~5% non-English pages exercise the lang gate (no truth)
    val lang = if (rng.nextInt(20) == 0) "de" else "en"
    new GenPage(WebPage(url, ts, html.getBytes("UTF-8"), text, lang),
      () => if (lang == "en") dedupTruth(truth.result()) else Vector.empty,
      () => if (lang == "en") corefLabels.result() else Vector.empty)
  }

  /** The pipeline merges repeated statements into one triple; truth follows
    * set semantics on (url, subj, pred, obj) with union of purposes and
    * evidence in paragraph order, substring-deduped keeping the longest
    * (the reference's finalize rule, build_graph.py:452-477 — independent
    * reimplementation here for the oracle). */
  private def dedupTruth(ts: Vector[Truth]): Vector[Truth] =
    ts.groupBy(t => (t.url, t.subj, t.pred, t.obj)).toVector.sortBy(_._1).map {
      case ((u, s, p, o), vs) =>
        val ev = vs.flatMap(_.evidence).distinct
        val kept = ev.filterNot(e => ev.exists(other => (other ne e) && other.contains(e) && other != e))
        Truth(u, s, p, o,
          vs.map(_.purpose).filter(_.nonEmpty).distinct.sorted.mkString(","),
          evidence = kept,
          purposeTexts = vs.flatMap(_.purposeTexts).distinct.sorted,
          subjType = vs.head.subjType,
          objType = vs.head.objType)
    }

  def corpus(n: Int, seed: Long = 42L): Vector[GenPage] =
    (0 until n).map(genPage(_, seed)).toVector
}
