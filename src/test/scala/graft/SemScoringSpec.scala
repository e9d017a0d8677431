package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.kg.{Holdout, SemanticScorer}

/** Pins the round-5 semantic-scorer deliverable (round-4 VERDICT next #1):
  * the committed model, trained only on CLOSED batches + the synthetic
  * corpus, evaluated ZERO-SHOT on the standing open batch (now 25 — the
  * compound vocabulary × frame probe). The gap half is outside the
  * scorer's reach (dictionary-bounded candidates — the NER's axis); the
  * fresh-frame half is exactly the scorer's competence, so here BOTH a
  * recall lift and a precision floor are pinned. Frozen rows live in
  * COVERAGE.md. */
class SemScoringSpec extends AnyFunSuite {

  private def prf(got: Set[(String, String, String)],
      want: Set[(String, String, String)]): (Double, Double, Double) = {
    val tp = (got & want).size.toDouble
    val p = tp / math.max(1, got.size)
    val r = tp / math.max(1, want.size)
    val f = if (p + r == 0) 0.0 else 2 * p * r / (p + r)
    (p, r, f)
  }

  test("committed model matches the featurizer dimensions") {
    val m = SemanticScorer.fromResource
    assert(m.dim == SemanticScorer.Dim)
    assert(m.labels == Vector("collect"))
  }

  test("semantic scorer lifts recall zero-shot on open batch 25 (compound probe)") {
    val want = Holdout.truth25.toSet
    val kernel = Holdout.predicted25.toSet
    val m = SemanticScorer.fromResource
    val scored = Holdout.pages25.flatMap { p =>
      SemanticScorer.predictTuples(m,
        SemanticScorer.candidates(p.url, new String(p.html, UTF_8)))
    }.toSet.filter(Holdout.isRealTuple)
    val combined = kernel ++ scored
    val (kp, kr, kf) = prf(kernel, want)
    val (cp, cr, cf) = prf(combined, want)
    info(f"kernel     P=$kp%.3f R=$kr%.3f F1=$kf%.3f")
    info(f"kernel+mlp P=$cp%.3f R=$cr%.3f F1=$cf%.3f")
    // frozen first-evaluation rows on b25 (COVERAGE.md): kernel tp=11
    // fp=0 (P 1.000 / R 0.423); kernel ∪ scorer tp=15 fp=1
    // (P 0.938 / R 0.577). Floors sit under the frozen rows.
    assert(cr >= kr, "scorer union must never lose kernel recall")
    assert(cr >= 0.50, s"combined zero-shot recall floor: $cr")
    assert(cp >= 0.85, s"combined zero-shot precision floor: $cp")
  }
}
