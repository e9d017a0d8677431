package graft.nlp

import scala.jdk.CollectionConverters._

/** Loader for the phrase-normalization dictionary resource
  * (graft/phrase_map.yml — same role as the reference's
  * extra-data/phrase_map.yml + entity_info.json). Parsed once per JVM;
  * consumed by the NER trie (Lexicon) and the normalizer canonical maps.
  *
  * Rule prefixes (reference phrase_normalization.py:36-73):
  *   "!"  negative rule — if the phrase matches, the canonical term is
  *        blocked for that phrase ("non personal information" must not
  *        normalize to "personal information");
  *   "="  case-sensitive rule — matches only with exact case ("UDID", not
  *        "udid"). Default rules are case-insensitive.
  */
object PhraseMapYaml {

  final case class Loaded(
      dataCanonical: Map[String, String], // lowercase phrase -> canonical term
      actorCanonical: Map[String, String],
      dataCanonicalCs: Map[String, String], // exact-case phrase -> canonical
      actorCanonicalCs: Map[String, String],
      dataNegative: Map[String, Vector[String]], // canonical -> neg phrases (lc)
      actorNegative: Map[String, Vector[String]],
      dataPhrases: Set[Vector[String]], // NER trie banks (tokenized, lc)
      actorPhrases: Set[Vector[String]],
      entityInfo: Map[String, (Set[String], Set[String])]) // canon -> (aliases, domains)

  lazy val loaded: Loaded = {
    val in = getClass.getResourceAsStream("/graft/phrase_map.yml")
    require(in != null, "missing resource graft/phrase_map.yml")
    val yaml = new org.yaml.snakeyaml.Yaml()
    val root = yaml.load[java.util.Map[String, Object]](in)
    in.close()

    final case class Section(
        canonical: Map[String, String],
        canonicalCs: Map[String, String],
        negative: Map[String, Vector[String]])

    def canonSection(name: String): Section = {
      val ci = Map.newBuilder[String, String]
      val cs = Map.newBuilder[String, String]
      val neg = scala.collection.mutable.Map[String, Vector[String]]()
      root.get(name).asInstanceOf[java.util.Map[String, java.util.List[String]]]
        .asScala.foreach { case (canon, phrases) =>
          phrases.asScala.foreach { raw =>
            var p = raw
            val isNeg = p.startsWith("!")
            if (isNeg) p = p.substring(1)
            val isCs = p.startsWith("=")
            if (isCs) p = p.substring(1)
            if (isNeg) neg(canon) = neg.getOrElse(canon, Vector.empty) :+ p.toLowerCase
            else if (isCs) cs += (p -> canon)
            else ci += (p.toLowerCase -> canon)
          }
        }
      Section(ci.result(), cs.result(), neg.toMap)
    }

    def nerOnly(name: String): Seq[String] =
      root.get(name).asInstanceOf[java.util.List[String]].asScala.toSeq

    val data = canonSection("DATA")
    val actor = canonSection("ACTOR")
    // NER banks are recall-oriented: case-sensitive phrases enter lowercased
    // (tagging is case-insensitive; case is enforced at normalization time);
    // negative phrases never enter the bank.
    val dataBank = (data.canonical.keySet ++ data.canonicalCs.keySet.map(_.toLowerCase) ++
      nerOnly("DATA_NER_ONLY")).map(_.split(' ').toVector)
    val actorBank = (actor.canonical.keySet ++ actor.canonicalCs.keySet.map(_.toLowerCase) ++
      nerOnly("ACTOR_NER_ONLY")).map(_.split(' ').toVector)

    val entities = root.get("entities")
      .asInstanceOf[java.util.Map[String, java.util.Map[String, java.util.List[String]]]]
      .asScala.map { case (canon, m) =>
        canon -> (m.get("aliases").asScala.toSet, m.get("domains").asScala.toSet)
      }.toMap

    Loaded(data.canonical, actor.canonical, data.canonicalCs, actor.canonicalCs,
      data.negative, actor.negative, dataBank, actorBank, entities)
  }
}
