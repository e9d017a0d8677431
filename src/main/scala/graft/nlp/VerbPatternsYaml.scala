package graft.nlp

import scala.jdk.CollectionConverters._

/** Loader for the collection-pattern DSL resource
  * (graft/verb_patterns.yml). The dictionary stays data: the verb lexicons
  * and dependency-chain patterns are editable without recompiling (SURVEY.md
  * U4 — same DSL family as the reference's verb_patterns.yml). Parsed once
  * per JVM (executor-singleton). */
object VerbPatternsYaml {

  final case class PatternSpec(root: String, chains: Seq[String], transform: Seq[String])

  lazy val (tokenMap: Map[String, Set[String]], patterns: Vector[PatternSpec]) = {
    val in = getClass.getResourceAsStream("/graft/verb_patterns.yml")
    require(in != null, "missing resource graft/verb_patterns.yml")
    val yaml = new org.yaml.snakeyaml.Yaml()
    val root = yaml.load[java.util.Map[String, Object]](in)
    in.close()
    val tm = root.get("token_map").asInstanceOf[java.util.Map[String, java.util.List[String]]]
      .asScala.map { case (k, v) => k -> v.asScala.toSet }.toMap
    val ps = root.get("patterns").asInstanceOf[java.util.List[java.util.Map[String, Object]]]
      .asScala.map { p =>
        PatternSpec(
          p.get("root").asInstanceOf[String],
          p.get("match").asInstanceOf[java.util.List[String]].asScala.toSeq,
          p.get("transform").asInstanceOf[java.util.List[String]].asScala.toSeq)
      }.toVector
    (tm, ps)
  }
}
