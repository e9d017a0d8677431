package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.kg.{Holdout, MentionNer, SemanticScorer}

/** Pins the round-6 headline deliverable (round-5 VERDICT next #1): the
  * learned mention NER breaks the datum-vocabulary closed world. Batch 21
  * is the controlled probe — 17 of 25 tuples carry datum surfaces absent
  * from the phrase dictionary; the kernel and the semantic scorer both sit
  * at R 0.320 there (frozen rows, COVERAGE.md) because their mention reach
  * is dictionary-bounded. The NER union must recover gap tuples WITHOUT
  * polluting the closed batches.
  *
  * Batch 25 is the standing open batch (the third compound vocabulary ×
  * frame probe). Floors sit under its frozen first-eval rows: union
  * tp=17 fp=6 (P 0.739 / R 0.654). */
class NerSpec extends AnyFunSuite {

  private def nerUnion(pages: Vector[graft.kg.Model.WebPage]): Set[(String, String, String)] = {
    val sem = SemanticScorer.fromResource
    val ner = MentionNer.fromResource
    Holdout.predict(pages).toSet ++ pages.flatMap { p =>
      SemanticScorer.predictTuples(sem,
        SemanticScorer.candidates(p.url, new String(p.html, UTF_8), Some(ner)))
    }.toSet.filter(Holdout.isRealTuple)
  }

  test("committed models match the featurizer dimensions") {
    val m = MentionNer.fromResource
    assert(m.span.dim == MentionNer.SpanDim)
    assert(m.cat.dim == MentionNer.CatDim)
    assert(m.cat.labels.nonEmpty && m.cat.labels == m.cat.labels.sorted)
  }

  test("NER union breaks the vocabulary wall on batch 25 (compound probe)") {
    val want = Holdout.truth25.toSet
    val kernel = Holdout.predicted25.toSet
    val got = nerUnion(Holdout.pages25)
    val tp = (got & want).size.toDouble
    val p = tp / math.max(1, got.size)
    val r = tp / math.max(1, want.size)
    info(f"kernel R=${(kernel & want).size.toDouble / want.size}%.3f  ner-union P=$p%.3f R=$r%.3f")
    assert(kernel.subsetOf(got), "union must preserve kernel tuples")
    assert(r >= 0.60, s"NER-union recall floor on the compound probe: $r")
    assert(p >= 0.65, s"NER-union precision floor: $p")
    // the specific deliverable: gap-datum tuples (unreachable by kernel
    // AND scorer) now score above zero
    val gap = want -- kernel
    val gapHit = (got & gap).size
    info(s"gap tuples recovered: $gapHit/${gap.size}")
    assert(gapHit >= 2, s"gap-datum recall must stay above zero: $gapHit")
  }

  test("NER union adds zero false positives on every closed batch") {
    val batches = Seq(
      Holdout.pages -> Holdout.truth, Holdout.pages2 -> Holdout.truth2,
      Holdout.pages3 -> Holdout.truth3, Holdout.pages4 -> Holdout.truth4,
      Holdout.pages5 -> Holdout.truth5, Holdout.pages6 -> Holdout.truth6,
      Holdout.pages7 -> Holdout.truth7, Holdout.pages8 -> Holdout.truth8,
      Holdout.pages9 -> Holdout.truth9, Holdout.pages10 -> Holdout.truth10,
      Holdout.pages11 -> Holdout.truth11, Holdout.pages12 -> Holdout.truth12,
      Holdout.pages13 -> Holdout.truth13, Holdout.pages14 -> Holdout.truth14,
      Holdout.pages15 -> Holdout.truth15, Holdout.pages16 -> Holdout.truth16,
      Holdout.pages17 -> Holdout.truth17, Holdout.pages18 -> Holdout.truth18,
      Holdout.pages19 -> Holdout.truth19, Holdout.pages20 -> Holdout.truth20,
      Holdout.pages21 -> Holdout.truth21, Holdout.pages22 -> Holdout.truth22,
      Holdout.pages23 -> Holdout.truth23, Holdout.pages24 -> Holdout.truth24)
    val fps = batches.flatMap { case (pages, truth) =>
      nerUnion(pages) -- truth.toSet
    }
    assert(fps.isEmpty, s"NER union polluted closed batches: ${fps.take(10)}")
  }
}
