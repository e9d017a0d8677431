package graft.kg

import graft.nlp.Lexicon
import graft.nlp.RuleNlp.Tok

/** Phrase normalization (SURVEY.md F1-F3; reference
  * phrase_normalization.py:36-152 + extra-data/phrase_map.yml).
  *
  * The reference compiles per-term regex banks; since our NER is already a
  * dictionary matcher, normalization is a canonical-term map over the
  * matched lemma sequence, with an entity-alias matcher for company names
  * and the pronoun / stem fallbacks of the reference cascade
  * (phrase_normalization.py:75-108):
  *   PRON head → we / you / UNSPECIFIED;
  *   dictionary span → canonical term;
  *   else stem (trimmed lemma join) when NER type agrees;
  *   generic nouns → UNSPECIFIED (resolved by the UNSPECIFIED rules in
  *   GraphBuilder step 6).
  */
object Normalizer {

  private val Possessives = Set("your", "our", "their", "its", "my", "his", "her")

  final case class Mention(tokens: Vector[Tok], head: Int, ner: String) {
    def text: String = tokens.map(_.text).mkString(" ")
    /** Lemma join of non-determiner, non-possessive tokens (trim_phrase,
      * phrase_normalization.py:12-30). */
    def stem: String = tokens
      .filterNot(t => t.pos == "DET" || t.pos == "PUNCT" ||
        Possessives.contains(t.text.toLowerCase))
      .map(_.lemma).mkString(" ").toLowerCase
  }

  private val Unspec = "UNSPECIFIED"

  /** Generic lemmas that normalize to UNSPECIFIED (phrase_map.yml UNSPECIFIED
    * rules). */
  private[kg] val genericData: Set[String] = Set("data", "datum", "information",
    "detail", "record", "technology", "thing", "category", "type", "kind",
    "example", "variety", "some", "all", "any", "following", "follow",
    "copy", "backup", "log", "list")
  private val genericActor: Set[String] = Set("party", "entity", "company",
    "organization", "other", "one", "anyone", "someone", "others")

  /** The canonical tables are probed with LEMMA n-grams (canonicalOf), but
    * phrase_map keys are surface forms — a dictionary phrase containing an
    * attributive gerund ("advertising identifier": lemma("advertising") =
    * "advertise") could never match its own lemma form. Index each phrase
    * under its lemma-normalized key too; surface keys win on collision,
    * colliding lemma keys resolve to the lexicographically-least canonical
    * (deterministic). */
  private def withLemmaKeys(table: Map[String, String]): Map[String, String] = {
    val lemmaKeys = table.toSeq
      .map { case (k, v) => k.split(' ').map(Lexicon.lemma).mkString(" ") -> v }
      .filterNot { case (k, _) => table.contains(k) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).min }
    table ++ lemmaKeys
  }

  /** DATA canonicalization: surface phrase → canonical term
    * (graft/phrase_map.yml). */
  val dataCanonical: Map[String, String] =
    withLemmaKeys(graft.nlp.PhraseMapYaml.loaded.dataCanonical)

  /** ACTOR canonicalization (graft/phrase_map.yml). */
  val actorCanonical: Map[String, String] =
    withLemmaKeys(graft.nlp.PhraseMapYaml.loaded.actorCanonical)

  private val dataCanonicalCs = graft.nlp.PhraseMapYaml.loaded.dataCanonicalCs
  private val actorCanonicalCs = graft.nlp.PhraseMapYaml.loaded.actorCanonicalCs
  private val dataNegative = graft.nlp.PhraseMapYaml.loaded.dataNegative
  private val actorNegative = graft.nlp.PhraseMapYaml.loaded.actorNegative

  /** Word-boundary phrase containment (the reference wraps every rule in
    * \b...\b, phrase_normalization.py:57-62). */
  private def containsPhrase(hay: String, needle: String): Boolean = {
    var from = 0
    while (from <= hay.length - needle.length) {
      val at = hay.indexOf(needle, from)
      if (at < 0) return false
      val okL = at == 0 || !hay.charAt(at - 1).isLetterOrDigit
      val okR = at + needle.length == hay.length ||
        !hay.charAt(at + needle.length).isLetterOrDigit
      if (okL && okR) return true
      from = at + 1
    }
    false
  }

  /** alias → canonical entities, inverted once (the per-call scan over the
    * whole entity table dominated PROPN-mention normalization). */
  private val aliasToCanon: Map[String, Set[String]] =
    Lexicon.entityInfo.toSeq
      .flatMap { case (canon, (aliases, _)) => aliases.map(_ -> canon) }
      .groupBy(_._1).map { case (a, cs) => a -> cs.map(_._2).toSet }

  private def lookupEntity(text: String): Set[String] =
    aliasToCanon.getOrElse(text.toLowerCase.trim, Set.empty)

  /** Match a phrase against the entity-alias bank (broadcast-dictionary
    * semantics of J3, phrase_normalization.py:111-152). */
  def matchEntityName(m: Mention): Set[String] = {
    val full = lookupEntity(m.text)
    if (full.nonEmpty) full
    else {
      // try the NER span / trailing n-grams
      val words = m.tokens.map(_.text.toLowerCase)
      (1 to math.min(3, words.length)).flatMap { n =>
        words.sliding(n).flatMap(g => lookupEntity(g.mkString(" ")))
      }.toSet
    }
  }

  private def canonicalOf(m: Mention, table: Map[String, String],
      csTable: Map[String, String], negOf: Map[String, Vector[String]],
      generic: Set[String]): Set[String] = {
    // longest suffix/inner lemma n-gram that hits the canonical table; the
    // dictionary NER guarantees some n-gram matched at tag time. A canonical
    // term whose negative rules match the FULL phrase is blocked — the
    // reference checks negative regexes against original and lemma text
    // before accepting a positive match (phrase_normalization.py:88-103).
    // allocation-lean rewrite (round-4 kernel pass): arrays + while loops
    // instead of per-(n,i) Vector slices and iterator chains; the full-text
    // joins for negative-rule checks are built only when a hit occurs
    val kt = m.tokens.filterNot(t => t.pos == "DET")
    val L = kt.length
    val lemmas = new Array[String](L)
    val exact = new Array[String](L)
    var z = 0
    while (z < L) { lemmas(z) = kt(z).lemma.toLowerCase; exact(z) = kt(z).text; z += 1 }
    var fullLower: String = null
    var fullLemma: String = null
    def negated(c: String): Boolean = {
      val ps = negOf.getOrElse(c, null)
      ps != null && ps.nonEmpty && {
        if (fullLower == null) {
          fullLower = m.tokens.map(_.text).mkString(" ").toLowerCase
          fullLemma = m.tokens.map(_.lemma).mkString(" ").toLowerCase
        }
        ps.exists(p => containsPhrase(fullLower, p) || containsPhrase(fullLemma, p))
      }
    }
    val sb = new java.lang.StringBuilder(32)
    def join(a: Array[String], i: Int, n: Int): String = {
      sb.setLength(0)
      var k = i
      while (k < i + n) { if (k > i) sb.append(' '); sb.append(a(k)); k += 1 }
      sb.toString
    }
    var hit: String = null
    var n = math.min(4, L)
    while (hit == null && n >= 1) {
      var i = 0
      while (hit == null && i <= L - n) {
        val lj = join(lemmas, i, n)
        val c1 = table.getOrElse(lj, null)
        if (c1 != null && !negated(c1)) hit = c1
        else {
          val ej = join(exact, i, n)
          val tj = ej.toLowerCase
          val c2 = if (tj == lj) null else table.getOrElse(tj, null)
          if (c2 != null && !negated(c2)) hit = c2
          else {
            val c3 = csTable.getOrElse(ej, null)
            if (c3 != null && !negated(c3)) hit = c3
          }
        }
        i += 1
      }
      n -= 1
    }
    if (hit != null) Set(hit)
    else {
      val headLemma = m.tokens(m.head).lemma.toLowerCase
      if (generic.contains(headLemma)) Set(Unspec) else Set.empty
    }
  }

  /** Pronoun normalization (phrase_normalization.py:75-84): I/we → we,
    * you → you, anything else → UNSPECIFIED. */
  private def pronounTerm(lemma: String): String = lemma.toLowerCase match {
    case "i" | "we" | "us" | "our" | "ourselves" | "me" => "we"
    case "you" | "your" | "yourself" => "you"
    case _ => Unspec
  }

  /** Memoized normalize — mentions repeat massively across documents
    * ("email address", "we", "our partners"), and the cascade below
    * allocates n-gram joins and stem strings per call. The key captures
    * everything the cascade reads: token (text, lemma, pos, ner) tuples,
    * the head index, and the token type. The lemma is NOT derivable from
    * the text here: DocKernel's synthetic mentions construct Toks with
    * lemma = text verbatim, so a synthetic and a natural mention can share
    * a surface while differing in lemma (round-5 ADVICE medium).
    * Executor-wide bounded cache, like Lexicon's lemma cache. */
  private val normCache =
    new java.util.concurrent.ConcurrentHashMap[String, Set[String]](1 << 14)

  def normalize(m: Mention, tokenType: String): Set[String] = {
    val sb = new java.lang.StringBuilder(48)
    sb.append(tokenType).append(m.head)
    var i = 0
    while (i < m.tokens.length) {
      val t = m.tokens(i)
      sb.append('\u0001').append(t.text).append('\u0002').append(t.lemma)
        .append('\u0002').append(t.pos).append('\u0002').append(t.ner)
      i += 1
    }
    val key = sb.toString
    val hit = normCache.get(key)
    if (hit != null) hit
    else {
      val r = normalizeUncached(m, tokenType)
      if (normCache.size < (1 << 16)) normCache.put(key, r)
      r
    }
  }

  private def normalizeUncached(m: Mention, tokenType: String): Set[String] = {
    val head = m.tokens(m.head)
    if (head.pos == "PRON") {
      val t = pronounTerm(head.lemma)
      if (tokenType == "ACTOR" && (t == "we" || t == "you")) Set(t) else Set(Unspec)
    } else {
      val useStem = head.ner == tokenType
      tokenType match {
        case "DATA" =>
          val terms = canonicalOf(m, dataCanonical, dataCanonicalCs, dataNegative, genericData)
          if (terms.nonEmpty) terms
          else if (useStem && m.stem.nonEmpty) Set(m.stem)
          else Set.empty
        case "ACTOR" =>
          var terms = Set.empty[String]
          var stemOk = useStem
          if (m.tokens.exists(_.pos == "PROPN")) {
            terms ++= matchEntityName(m)
            stemOk = stemOk && terms.isEmpty
          }
          terms ++= canonicalOf(m, actorCanonical, actorCanonicalCs, actorNegative, genericActor)
          if (terms.nonEmpty) terms
          else if (stemOk && m.stem.nonEmpty) Set(m.stem)
          else Set.empty
        case _ => Set.empty
      }
    }
  }

  /** Whether a term is a canonical dictionary datatype (vs a raw stem
    * fallback) — used by the semantic scorer's dictionary-hit indicator. */
  lazy val canonicalDataTerms: Set[String] = dataCanonical.values.toSet
  def isCanonicalData(term: String): Boolean = canonicalDataTerms.contains(term)

  /** Purpose phrase → labels (v1 keyword model; SURVEY.md U8). */
  def classifyPurpose(text: String): Seq[String] = {
    val words = text.toLowerCase.split("[^a-z0-9-]+").filter(_.nonEmpty).toSet
    val lemmas = words.map(Lexicon.lemma)
    Lexicon.purposeKeywords.toSeq.sortBy(_._1).collect {
      case (label, kws) if (words ++ lemmas).exists(kws.contains) => label
    }
  }
}
