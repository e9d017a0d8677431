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

  final case class Mention(tokens: Vector[Tok], head: Int, ner: String) {
    def text: String = tokens.map(_.text).mkString(" ")
    /** Lemma join of non-determiner, non-possessive tokens (trim_phrase,
      * phrase_normalization.py:12-30). */
    def stem: String = tokens
      .filterNot(t => t.pos == "DET" || t.pos == "PUNCT" ||
        Set("your", "our", "their", "its", "my", "his", "her").contains(t.text.toLowerCase))
      .map(_.lemma).mkString(" ").toLowerCase
  }

  private val Unspec = "UNSPECIFIED"

  /** Generic lemmas that normalize to UNSPECIFIED (phrase_map.yml UNSPECIFIED
    * rules). */
  private val genericData: Set[String] = Set("data", "datum", "information",
    "detail", "record", "technology", "thing", "category", "type", "kind",
    "example", "variety", "some", "all", "any", "following")
  private val genericActor: Set[String] = Set("party", "entity", "company",
    "organization", "other", "one", "anyone", "someone", "others")

  /** DATA canonicalization: surface phrase → canonical term
    * (graft/phrase_map.yml). */
  val dataCanonical: Map[String, String] = graft.nlp.PhraseMapYaml.loaded.dataCanonical

  /** ACTOR canonicalization (graft/phrase_map.yml). */
  val actorCanonical: Map[String, String] = graft.nlp.PhraseMapYaml.loaded.actorCanonical

  private def lookupEntity(text: String): Set[String] = {
    val lw = text.toLowerCase.trim
    Lexicon.entityInfo.collect {
      case (canon, (aliases, _)) if aliases.contains(lw) => canon
    }.toSet
  }

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

  private def canonicalOf(m: Mention, table: Map[String, String], generic: Set[String]): Set[String] = {
    // longest suffix/inner lemma n-gram that hits the canonical table; the
    // dictionary NER guarantees some n-gram matched at tag time.
    val lemmas = m.tokens.filterNot(t => t.pos == "DET").map(_.lemma.toLowerCase)
    val texts = m.tokens.filterNot(t => t.pos == "DET").map(_.text.toLowerCase)
    val grams = for {
      n <- (math.min(4, lemmas.length) to 1 by -1).iterator
      i <- (0 to lemmas.length - n).iterator
      g <- Iterator(lemmas.slice(i, i + n).mkString(" "), texts.slice(i, i + n).mkString(" "))
    } yield g
    grams.collectFirst { case g if table.contains(g) => table(g) } match {
      case Some(c) => Set(c)
      case None =>
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

  def normalize(m: Mention, tokenType: String): Set[String] = {
    val head = m.tokens(m.head)
    if (head.pos == "PRON") {
      val t = pronounTerm(head.lemma)
      if (tokenType == "ACTOR" && (t == "we" || t == "you")) Set(t) else Set(Unspec)
    } else {
      val useStem = head.ner == tokenType
      tokenType match {
        case "DATA" =>
          val terms = canonicalOf(m, dataCanonical, genericData)
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
          terms ++= canonicalOf(m, actorCanonical, genericActor)
          if (terms.nonEmpty) terms
          else if (stemOk && m.stem.nonEmpty) Set(m.stem)
          else Set.empty
        case _ => Set.empty
      }
    }
  }

  /** Purpose phrase → labels (v1 keyword model; SURVEY.md U8). */
  def classifyPurpose(text: String): Seq[String] = {
    val words = text.toLowerCase.split("[^a-z0-9-]+").filter(_.nonEmpty).toSet
    val lemmas = words.map(Lexicon.lemma)
    Lexicon.purposeKeywords.toSeq.sortBy(_._1).collect {
      case (label, kws) if (words ++ lemmas).exists(kws.contains) => label
    }
  }
}
