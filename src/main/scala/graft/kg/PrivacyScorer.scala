package graft.kg

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-policy keyword scorer (SURVEY.md U9; reference
  * analysis/privacy_scorer.py:6-152 + criteria/scoring_criteria.toml).
  *
  * Four weighted categories × three criteria; a criterion whose `required`
  * phrases appear scores full points when a `matching` phrase also appears,
  * half otherwise (privacy_scorer.py:99-116). Everything compiles to plain
  * Column expressions over lower(text) — whole-stage codegen, no UDF — so
  * scoring 10^12 policies is a narrow map over the page scan. The criteria
  * live in the graft/scoring_criteria.yml resource (data, not code).
  */
object PrivacyScorer {

  final case class Criterion(name: String, points: Double,
      required: Vector[String], matching: Vector[String])
  final case class Category(name: String, weight: Double, criteria: Vector[Criterion])

  lazy val categories: Vector[Category] = {
    val in = getClass.getResourceAsStream("/graft/scoring_criteria.yml")
    require(in != null, "missing resource graft/scoring_criteria.yml")
    val root = new org.yaml.snakeyaml.Yaml()
      .load[java.util.Map[String, Object]](in)
    in.close()
    val weights = root.get("weights").asInstanceOf[java.util.Map[String, Object]]
      .asScala.map { case (k, v) => k -> v.toString.toDouble }.toMap
    root.get("categories").asInstanceOf[java.util.Map[String, java.util.Map[String, Object]]]
      .asScala.toVector.sortBy(_._1).map { case (cat, crits) =>
        val cs = crits.asScala.toVector.sortBy(_._1).map { case (name, spec0) =>
          val spec = spec0.asInstanceOf[java.util.Map[String, Object]]
          def strs(k: String): Vector[String] =
            spec.get(k).asInstanceOf[java.util.List[String]].asScala.toVector
          Criterion(name, spec.get("points").toString.toDouble, strs("required"), strs("matching"))
        }
        Category(cat, weights(cat), cs)
      }
  }

  private def anyPhrase(lowerText: Column, phrases: Vector[String]): Column =
    phrases.map(p => lowerText.contains(p.toLowerCase)).reduce(_ || _)

  /** Per-category weighted score as a single expression tree
    * (privacy_scorer.py:118-122: normalized raw / max × weight, 2dp). */
  private def categoryScore(lowerText: Column, cat: Category): Column = {
    val raw = cat.criteria.map { c =>
      when(anyPhrase(lowerText, c.required),
        when(anyPhrase(lowerText, c.matching), lit(c.points)).otherwise(lit(c.points / 2)))
        .otherwise(lit(0.0))
    }.reduce(_ + _)
    val maxPossible = cat.criteria.length * 100.0
    round(raw / maxPossible * cat.weight, 2)
  }

  /** Score pages: (url, <category columns>, total_score, grade). */
  def score(pages: DataFrame): DataFrame = {
    val lt = lower(col("text"))
    val catCols = categories.map(c => categoryScore(lt, c).as(c.name))
    val withCats = pages.select(col("url") +: catCols: _*)
    val total = round(categories.map(c => col(c.name)).reduce(_ + _), 1)
    withCats
      .withColumn("total_score", total)
      .withColumn("grade",
        when(col("total_score") >= 90, "A")
          .when(col("total_score") >= 75, "B")
          .when(col("total_score") >= 50, "C")
          .when(col("total_score") >= 25, "D")
          .otherwise("F"))
  }

  /** Driver-side reimplementation for the VALUES oracle (plain string ops —
    * no shared Spark code path). */
  def scoreText(text: String): (Map[String, Double], Double, String) = {
    val lt = text.toLowerCase
    val cats = categories.map { cat =>
      val raw = cat.criteria.map { c =>
        if (c.required.exists(p => lt.contains(p.toLowerCase))) {
          if (c.matching.exists(p => lt.contains(p.toLowerCase))) c.points else c.points / 2
        } else 0.0
      }.sum
      val weighted = math.round(raw / (cat.criteria.length * 100.0) * cat.weight * 100) / 100.0
      cat.name -> weighted
    }.toMap
    val total = math.round(cats.values.sum * 10) / 10.0
    val grade =
      if (total >= 90) "A" else if (total >= 75) "B"
      else if (total >= 50) "C" else if (total >= 25) "D" else "F"
    (cats, total, grade)
  }
}
