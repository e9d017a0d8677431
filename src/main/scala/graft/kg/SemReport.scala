package graft.kg

import java.nio.charset.StandardCharsets.UTF_8

/** Dev tool: semantic-scorer report on the open-era batches (10-21; 21 is
  * the standing OPEN batch once 20 closes) — kernel-only vs kernel ∪
  * scorer, with per-doc diffs for the combined system.
  * `sbt "runMain graft.kg.SemReport"` */
object SemReport {

  def scorerTuples(pages: Vector[Model.WebPage],
      ner: Option[MentionNer.Models] = None): Set[(String, String, String)] = {
    val m = SemanticScorer.fromResource
    pages.flatMap { p =>
      val cands = SemanticScorer.candidates(p.url, new String(p.html, UTF_8), ner)
      SemanticScorer.predictTuples(m, cands)
    }.toSet
  }

  def main(args: Array[String]): Unit = {
    // both open-era batches: 10 (the scorer's original frozen test) and 11
    def batch(tag: String, pages: Vector[Model.WebPage],
        truth: Vector[(String, String, String)]): Set[(String, String, String)] = {
      val want = truth.toSet
      val kernel = Holdout.predict(pages).toSet
      val combined = kernel ++ scorerTuples(pages)
      val withNer = kernel ++ scorerTuples(pages, Some(MentionNer.fromResource))
      def show(sys: String, got: Set[(String, String, String)]): Unit =
        Holdout.prRows(got, want).foreach { case (p, tp, fp, fn, pr, rc) =>
          println(f"SEM$tag $sys%-12s $p%-10s tp=$tp%3d fp=$fp%3d fn=$fn%3d precision=$pr%.4f recall=$rc%.4f")
        }
      show("kernel", kernel)
      show("kernel+mlp", combined)
      show("kernel+mlp+ner", withNer)
      withNer
    }
    batch("10", Holdout.pages10, Holdout.truth10)
    batch("11", Holdout.pages11, Holdout.truth11)
    batch("12", Holdout.pages12, Holdout.truth12)
    batch("13", Holdout.pages13, Holdout.truth13)
    batch("14", Holdout.pages14, Holdout.truth14)
    batch("15", Holdout.pages15, Holdout.truth15)
    batch("16", Holdout.pages16, Holdout.truth16)
    batch("17", Holdout.pages17, Holdout.truth17)
    batch("18", Holdout.pages18, Holdout.truth18)
    batch("19", Holdout.pages19, Holdout.truth19)
    batch("20", Holdout.pages20, Holdout.truth20)
    batch("21", Holdout.pages21, Holdout.truth21)
    batch("22", Holdout.pages22, Holdout.truth22)
    batch("23", Holdout.pages23, Holdout.truth23)
    batch("24", Holdout.pages24, Holdout.truth24)
    val combined = batch("25", Holdout.pages25, Holdout.truth25)
    val want = Holdout.truth25.toSet
    val byUrl = (combined ++ want).map(_._1).toVector.distinct.sorted
    byUrl.foreach { u =>
      val g = combined.filter(_._1 == u).map(t => (t._2, t._3))
      val w = want.filter(_._1 == u).map(t => (t._2, t._3))
      val miss = w -- g
      val extra = g -- w
      if (miss.nonEmpty || extra.nonEmpty) {
        println(s"DOC $u")
        miss.toVector.sorted.foreach(t => println(s"  MISS  $t"))
        extra.toVector.sorted.foreach(t => println(s"  EXTRA $t"))
      }
    }
  }
}
