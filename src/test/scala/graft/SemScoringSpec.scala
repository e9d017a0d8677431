package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.kg.{Holdout, SemanticScorer}

/** Pins the round-5 semantic-scorer deliverable (round-4 VERDICT next #1):
  * the committed model, trained only on CLOSED batches + the synthetic
  * corpus, evaluated ZERO-SHOT on the standing open batch (now 22 — the
  * gap-datum VOCABULARY probe). Batch 21 is deliberately outside the
  * scorer's reach: its candidate generator only emits
  * dictionary-canonicalizable mentions, so on gap-datum tuples the scorer
  * adds NOTHING — the pinned state is precision (no fp flood), not a
  * recall lift. The recall-lift floors move to the learned mention NER
  * (round-6 deliverable) once it lands. Frozen rows live in COVERAGE.md. */
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

  test("semantic scorer holds precision zero-shot on open batch 22 (vocabulary probe)") {
    val want = Holdout.truth22.toSet
    val kernel = Holdout.predicted22.toSet
    val m = SemanticScorer.fromResource
    val scored = Holdout.pages22.flatMap { p =>
      SemanticScorer.predictTuples(m,
        SemanticScorer.candidates(p.url, new String(p.html, UTF_8)))
    }.toSet.filter(Holdout.isRealTuple)
    val combined = kernel ++ scored
    val (kp, kr, kf) = prf(kernel, want)
    val (cp, cr, cf) = prf(combined, want)
    info(f"kernel     P=$kp%.3f R=$kr%.3f F1=$kf%.3f")
    info(f"kernel+mlp P=$cp%.3f R=$cr%.3f F1=$cf%.3f")
    // frozen first-evaluation rows on b22 (COVERAGE.md): kernel tp=10
    // fp=0 (P 1.000 / R 0.400 — all 10 in-dictionary controls, 0/15 gap
    // tuples); kernel ∪ scorer tp=10 fp=1 (P 0.909 / R 0.400 — the scorer
    // cannot reach out-of-dictionary datums; that boundary belongs to the
    // NER). Floors pin: no recall regression below the control set, no fp
    // flood from the scorer on OOV-heavy text.
    assert(cr >= kr, "scorer union must never lose kernel recall")
    assert(cr >= 0.30, s"combined zero-shot recall floor: $cr")
    assert(cp >= 0.85, s"combined zero-shot precision floor: $cp")
  }
}
