package graft.nlp

import scala.jdk.CollectionConverters._

/** Loader for the phrase-normalization dictionary resource
  * (graft/phrase_map.yml — same role as the reference's
  * extra-data/phrase_map.yml + entity_info.json). Parsed once per JVM;
  * consumed by the NER trie (Lexicon) and the normalizer canonical maps. */
object PhraseMapYaml {

  final case class Loaded(
      dataCanonical: Map[String, String], // surface phrase -> canonical term
      actorCanonical: Map[String, String],
      dataPhrases: Set[Vector[String]], // NER trie banks (tokenized)
      actorPhrases: Set[Vector[String]],
      entityInfo: Map[String, (Set[String], Set[String])]) // canon -> (aliases, domains)

  lazy val loaded: Loaded = {
    val in = getClass.getResourceAsStream("/graft/phrase_map.yml")
    require(in != null, "missing resource graft/phrase_map.yml")
    val yaml = new org.yaml.snakeyaml.Yaml()
    val root = yaml.load[java.util.Map[String, Object]](in)
    in.close()

    def canonSection(name: String): Map[String, String] =
      root.get(name).asInstanceOf[java.util.Map[String, java.util.List[String]]]
        .asScala.flatMap { case (canon, phrases) =>
          phrases.asScala.map(_ -> canon)
        }.toMap

    def nerOnly(name: String): Seq[String] =
      root.get(name).asInstanceOf[java.util.List[String]].asScala.toSeq

    val dataCanon = canonSection("DATA")
    val actorCanon = canonSection("ACTOR")
    val dataBank = (dataCanon.keySet ++ nerOnly("DATA_NER_ONLY"))
      .map(_.split(' ').toVector)
    val actorBank = (actorCanon.keySet ++ nerOnly("ACTOR_NER_ONLY"))
      .map(_.split(' ').toVector)

    val entities = root.get("entities")
      .asInstanceOf[java.util.Map[String, java.util.Map[String, java.util.List[String]]]]
      .asScala.map { case (canon, m) =>
        canon -> (m.get("aliases").asScala.toSet, m.get("domains").asScala.toSet)
      }.toMap

    Loaded(dataCanon, actorCanon, dataBank, actorBank, entities)
  }
}
