package graft.kg

import java.nio.charset.StandardCharsets.UTF_8

import graft.kg.Model.WebPage
import graft.text.HtmlSegmenter

/** Held-out naturalistic evaluation corpus (round-2 VERDICT "what's missing
  * #1"): hand-written policy paragraphs + hand-labeled party tuples that the
  * synthetic generator NEVER sees, breaking the closed evaluation loop in
  * which `CorpusGen` renders from the same grammar the kernel parses. The
  * analogue of the reference's manually-annotated 200-policy tuple set
  * (evals/tuples/evaluate.py:16-65, P=96.9/R=70.6 published).
  *
  * The honest deliverable is the P/R NUMBER `kg_eval_holdout` reports —
  * reported in COVERAGE.md with a target to beat next round — not a green
  * oracle (the oracle replays the same kernel; it gates the distributed
  * plumbing, not the linguistics).
  */
object Holdout {

  private def resourceLines(name: String): Vector[String] = {
    val in = getClass.getResourceAsStream(s"/graft/$name")
    require(in != null, s"missing resource $name")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filterNot(l => l.startsWith("#") || l.trim.isEmpty).toVector
    finally in.close()
  }

  def urlOf(id: String): String = s"https://holdout.example/$id"

  private def loadPages(resource: String): Vector[WebPage] = {
    val frags = resourceLines(resource).map { l =>
      val Array(id, html) = l.split('\t')
      (id, html)
    }
    frags.groupBy(_._1).toVector.sortBy(_._1).map { case (id, rows) =>
      val html = "<html><body>\n" + rows.map(_._2).mkString("\n") + "\n</body></html>"
      val text = html.replaceAll("<[^>]*>", " ").replaceAll("\\s+", " ").trim
      WebPage(urlOf(id), java.sql.Timestamp.valueOf("2026-01-01 00:00:00"),
        html.getBytes(UTF_8), text, "en")
    }
  }

  private def loadTruth(resource: String): Vector[(String, String, String)] =
    resourceLines(resource).map { l =>
      val Array(id, party, dt) = l.split('\t')
      (urlOf(id), party, dt)
    }

  /** Batch 1: the held-out pages, one per labeled document. Iterated against
    * through rounds 2-3 (saturated at P/R = 1.0) — tracks "no regression",
    * not generalization. */
  lazy val pages: Vector[WebPage] = loadPages("holdout_docs.tsv")

  /** Hand-labeled (url, party, datatype) tuples for batch 1. */
  lazy val truth: Vector[(String, String, String)] = loadTruth("holdout_truth.tsv")

  /** Batch 2 (round 3): written after batch 1 saturated; the kernel's FIRST
    * run against it is the honest zero-shot generalization number (recorded
    * in COVERAGE.md at the introducing commit). */
  lazy val pages2: Vector[WebPage] = loadPages("holdout2_docs.tsv")
  lazy val truth2: Vector[(String, String, String)] = loadTruth("holdout2_truth.tsv")

  /** Batch 3 (round 3 close): written after batches 1-2 both closed at
    * 1.0/1.0 — its FIRST run re-measures zero-shot generalization of the
    * full round-3 mechanism set (frozen in COVERAGE.md). */
  lazy val pages3: Vector[WebPage] = loadPages("holdout3_docs.tsv")
  lazy val truth3: Vector[(String, String, String)] = loadTruth("holdout3_truth.tsv")

  /** Batch 4 (round-4 opening move): written and labeled BEFORE any round-4
    * kernel commit, per the protocol frozen at round-3 close. Its FIRST run
    * measures whether the ~45 round-3 mechanisms compound on new hard text
    * (target: zero-shot both-recall ≥ 0.45 vs batch 3's 0.353). */
  lazy val pages4: Vector[WebPage] = loadPages("holdout4_docs.tsv")
  lazy val truth4: Vector[(String, String, String)] = loadTruth("holdout4_truth.tsv")

  /** Batch 5 (round-4 close): written after batch 4 closed — the repo's
    * standing open batch; its FIRST run is the live zero-shot number. */
  lazy val pages5: Vector[WebPage] = loadPages("holdout5_docs.tsv")
  lazy val truth5: Vector[(String, String, String)] = loadTruth("holdout5_truth.tsv")

  /** Batch 6 (round-4 close): the standing open batch after batch 5
    * closed; its FIRST run is the live zero-shot number. */
  lazy val pages6: Vector[WebPage] = loadPages("holdout6_docs.tsv")
  lazy val truth6: Vector[(String, String, String)] = loadTruth("holdout6_truth.tsv")

  /** Batch 7 (round-4 close): the standing open batch after batch 6
    * closed; its FIRST run is the live zero-shot number. */
  lazy val pages7: Vector[WebPage] = loadPages("holdout7_docs.tsv")
  lazy val truth7: Vector[(String, String, String)] = loadTruth("holdout7_truth.tsv")

  /** Batch 8 (round-4 close): the standing open batch after batch 7
    * closed; its FIRST run is the live zero-shot number. */
  lazy val pages8: Vector[WebPage] = loadPages("holdout8_docs.tsv")
  lazy val truth8: Vector[(String, String, String)] = loadTruth("holdout8_truth.tsv")

  /** Batch 9 (round-4 close): the standing open batch after batch 8
    * closed; its FIRST run is the live zero-shot number. */
  lazy val pages9: Vector[WebPage] = loadPages("holdout9_docs.tsv")
  lazy val truth9: Vector[(String, String, String)] = loadTruth("holdout9_truth.tsv")

  /** Batch 10 (round-5 opening): written and labeled BEFORE any round-5
    * kernel commit; doubles as the zero-shot held-out test set for the
    * learned semantic scorer (round-4 VERDICT next #1). */
  lazy val pages10: Vector[WebPage] = loadPages("holdout10_docs.tsv")
  lazy val truth10: Vector[(String, String, String)] = loadTruth("holdout10_truth.tsv")

  /** Batch 11 (round 5): written after the scorer's batch-10 zero-shot row
    * froze and before any batch-10 closure work; the zero-shot test set
    * for BOTH the rule kernel and kernel + semantic scorer. */
  lazy val pages11: Vector[WebPage] = loadPages("holdout11_docs.tsv")
  lazy val truth11: Vector[(String, String, String)] = loadTruth("holdout11_truth.tsv")

  /** Batch 12 (round 6 opening): written before any batch-11 closure work;
    * the zero-shot test set for BOTH the rule kernel and kernel + semantic
    * scorer once batch 11 closes. */
  lazy val pages12: Vector[WebPage] = loadPages("holdout12_docs.tsv")
  lazy val truth12: Vector[(String, String, String)] = loadTruth("holdout12_truth.tsv")

  /** Batch 13 (round 6): written after batch 11 closed and before any
    * batch-12 closure work; the zero-shot test set for BOTH the rule
    * kernel and kernel + semantic scorer once batch 12 closes. */
  lazy val pages13: Vector[WebPage] = loadPages("holdout13_docs.tsv")
  lazy val truth13: Vector[(String, String, String)] = loadTruth("holdout13_truth.tsv")

  /** Batch 14: written after batch 12 closed and before any batch-13
    * closure work; the zero-shot test set for BOTH the rule kernel and
    * kernel + semantic scorer once batch 13 closes. */
  lazy val pages14: Vector[WebPage] = loadPages("holdout14_docs.tsv")
  lazy val truth14: Vector[(String, String, String)] = loadTruth("holdout14_truth.tsv")

  /** Batch 15: written after batch 13 closed and before any batch-14
    * closure work; the zero-shot test set for BOTH the rule kernel and
    * kernel + semantic scorer once batch 14 closes. */
  lazy val pages15: Vector[WebPage] = loadPages("holdout15_docs.tsv")
  lazy val truth15: Vector[(String, String, String)] = loadTruth("holdout15_truth.tsv")

  /** Batch 16: written after batch 14 closed and before any batch-15
    * closure work; the zero-shot test set for BOTH the rule kernel and
    * kernel + semantic scorer once batch 15 closes. */
  lazy val pages16: Vector[WebPage] = loadPages("holdout16_docs.tsv")
  lazy val truth16: Vector[(String, String, String)] = loadTruth("holdout16_truth.tsv")

  /** Batch 17: written after batch 15 closed and before any batch-16
    * closure work; the zero-shot test set for BOTH the rule kernel and
    * kernel + semantic scorer once batch 16 closes. */
  lazy val pages17: Vector[WebPage] = loadPages("holdout17_docs.tsv")
  lazy val truth17: Vector[(String, String, String)] = loadTruth("holdout17_truth.tsv")

  /** Batch 18: written after batch 16 closed and before any batch-17
    * closure work; the zero-shot test set for BOTH the rule kernel and
    * kernel + semantic scorer once batch 17 closes. */
  lazy val pages18: Vector[WebPage] = loadPages("holdout18_docs.tsv")
  lazy val truth18: Vector[(String, String, String)] = loadTruth("holdout18_truth.tsv")

  /** Batch 19: written after batch 17 closed and before any batch-18
    * closure work; the zero-shot test set for BOTH the rule kernel and
    * kernel + semantic scorer once batch 18 closes. */
  lazy val pages19: Vector[WebPage] = loadPages("holdout19_docs.tsv")
  lazy val truth19: Vector[(String, String, String)] = loadTruth("holdout19_truth.tsv")

  /** Batch 20: written after batch 18 closed and before any batch-19
    * closure work; the zero-shot test set for BOTH the rule kernel and
    * kernel + semantic scorer once batch 19 closes. */
  lazy val pages20: Vector[WebPage] = loadPages("holdout20_docs.tsv")
  lazy val truth20: Vector[(String, String, String)] = loadTruth("holdout20_truth.tsv")

  /** Batch 21 (round 6 opening): written after batch 19 closed and before
    * any batch-20 closure work — the gap-datum VOCABULARY probe (16 of 25
    * docs carry out-of-dictionary datum heads under in-dictionary
    * predicate frames); the zero-shot test set for the rule kernel, the
    * semantic scorer, and the round-6 learned mention NER once batch 20
    * closes. */
  lazy val pages21: Vector[WebPage] = loadPages("holdout21_docs.tsv")
  lazy val truth21: Vector[(String, String, String)] = loadTruth("holdout21_truth.tsv")

  /** Batch 22 (round 6): written after batch 20 closed and before any
    * batch-21 closure work — the PROTOCOL-CLEAN zero-shot test for the
    * learned mention NER (batch 21's diagnostics steered its development;
    * these surfaces were never read by any training, tuning, or probe). */
  lazy val pages22: Vector[WebPage] = loadPages("holdout22_docs.tsv")
  lazy val truth22: Vector[(String, String, String)] = loadTruth("holdout22_truth.tsv")

  /** Batch 23 (round 6): written after batch 21 closed and before any
    * batch-22 closure work — the first COMPOUND probe (gap datums under
    * known frames + in-dictionary datums under fresh idiomatic frames);
    * the zero-shot test set for all three systems once batch 22 closes. */
  lazy val pages23: Vector[WebPage] = loadPages("holdout23_docs.tsv")
  lazy val truth23: Vector[(String, String, String)] = loadTruth("holdout23_truth.tsv")

  /** Batch 24 (round 6): written after batch 22 closed and before any
    * batch-23 closure work — the second compound probe; the zero-shot
    * test set for all three systems once batch 23 closes. */
  lazy val pages24: Vector[WebPage] = loadPages("holdout24_docs.tsv")
  lazy val truth24: Vector[(String, String, String)] = loadTruth("holdout24_truth.tsv")

  /** Batch 25 (round 6): written after batch 23 closed and before any
    * batch-24 closure work — the third compound probe; the zero-shot
    * test set for all three systems once batch 24 closes. */
  lazy val pages25: Vector[WebPage] = loadPages("holdout25_docs.tsv")
  lazy val truth25: Vector[(String, String, String)] = loadTruth("holdout25_truth.tsv")

  /** UNSPECIFIED_* pseudo-terms are engine bookkeeping (unresolvable
    * mentions), not datatypes a human labeler can assert — both sides of
    * the comparison exclude them (the reference's tuple eval likewise
    * scores real datatype names only). */
  def isRealTuple(t: (String, String, String)): Boolean =
    !t._3.startsWith("UNSPECIFIED")

  /** Driver-side single-threaded run of the SAME kernel over a page set →
    * predicted party tuples (used for the VALUES oracle and specs). */
  def predict(ps: Vector[WebPage]): Vector[(String, String, String)] = ps.flatMap { p =>
    val segs = HtmlSegmenter.segment(p.url, new String(p.html, UTF_8))
    val g = new KgApi.PolicyGraph(DocKernel.process(p.url, segs))
    val fp = g.firstParty
    (for {
      dt <- g.dataNodes
      actor <- g.whoCollect(dt)
      if actor != "you" && actor != "user" // data subjects, not collecting parties (KgApi.partyTuples)
    } yield (p.url, if (fp(actor)) "we" else "3rd-party", dt)).distinct
      .filter(isRealTuple)
  }

  lazy val predicted: Vector[(String, String, String)] = predict(pages)
  lazy val predicted2: Vector[(String, String, String)] = predict(pages2)
  lazy val predicted3: Vector[(String, String, String)] = predict(pages3)
  lazy val predicted4: Vector[(String, String, String)] = predict(pages4)
  lazy val predicted5: Vector[(String, String, String)] = predict(pages5)
  lazy val predicted6: Vector[(String, String, String)] = predict(pages6)
  lazy val predicted7: Vector[(String, String, String)] = predict(pages7)
  lazy val predicted8: Vector[(String, String, String)] = predict(pages8)
  lazy val predicted9: Vector[(String, String, String)] = predict(pages9)
  lazy val predicted10: Vector[(String, String, String)] = predict(pages10)
  lazy val predicted11: Vector[(String, String, String)] = predict(pages11)
  lazy val predicted12: Vector[(String, String, String)] = predict(pages12)
  lazy val predicted13: Vector[(String, String, String)] = predict(pages13)
  lazy val predicted14: Vector[(String, String, String)] = predict(pages14)
  lazy val predicted15: Vector[(String, String, String)] = predict(pages15)
  lazy val predicted16: Vector[(String, String, String)] = predict(pages16)
  lazy val predicted17: Vector[(String, String, String)] = predict(pages17)
  lazy val predicted18: Vector[(String, String, String)] = predict(pages18)
  lazy val predicted19: Vector[(String, String, String)] = predict(pages19)
  lazy val predicted20: Vector[(String, String, String)] = predict(pages20)
  lazy val predicted21: Vector[(String, String, String)] = predict(pages21)
  lazy val predicted22: Vector[(String, String, String)] = predict(pages22)
  lazy val predicted23: Vector[(String, String, String)] = predict(pages23)
  lazy val predicted24: Vector[(String, String, String)] = predict(pages24)
  lazy val predicted25: Vector[(String, String, String)] = predict(pages25)

  /** Per-party (+ "both") tp/fp/fn/precision/recall rows from got-vs-want
    * tuple sets — the evaluate.py:29-65 metric. */
  def prRows(got: Set[(String, String, String)],
      want: Set[(String, String, String)]): Vector[(String, Long, Long, Long, Double, Double)] = {
    def r4(x: Double): Double = math.round(x * 10000) / 10000.0
    val parties = (got.map(_._2) ++ want.map(_._2)).toVector.distinct.sorted
    val per = parties.map { p =>
      val g = got.filter(_._2 == p); val w = want.filter(_._2 == p)
      (p, (g & w).size.toLong, (g -- w).size.toLong, (w -- g).size.toLong)
    }
    val both = ("both", per.map(_._2).sum, per.map(_._3).sum, per.map(_._4).sum)
    (per :+ both).sortBy(_._1).map { case (p, tp, fp, fn) =>
      (p, tp, fp, fn,
        r4(tp.toDouble / math.max(1, tp + fp)),
        r4(tp.toDouble / math.max(1, tp + fn)))
    }
  }
}
