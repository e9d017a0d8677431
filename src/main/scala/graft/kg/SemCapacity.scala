package graft.kg

import java.nio.charset.StandardCharsets.UTF_8

import graft.nlp.{NerTrain, SemTrain}

/** Dev tool: the round-6 scorer-capacity experiment (round-5 VERDICT next
  * #3). Three retrains in round 5 moved the precision/recall trade instead
  * of improving it — the 16-hidden-unit MLP is at capacity on ~1,500 gold
  * rows. Protocol: SELECT the architecture on a held-out slice of CLOSED
  * batches only — train each variant on batches 1-19 (+ synthetic corpus)
  * with batch 20 EXCLUDED, evaluate kernel ∪ scorer on batch 20, and
  * compare against the committed model's historic first-eval row there
  * (P 0.818 / R 0.783, trained the same way at hidden=16). The committed
  * model is then retrained on ALL closed batches at the winning size by
  * SemTrain. The open batch 21 is never read.
  * `sbt "runMain graft.kg.SemCapacity"` */
object SemCapacity {
  def main(args: Array[String]): Unit = {
    val b20urls = Holdout.pages20.map(_.url).toSet
    val data = SemTrain.rows(excludeUrls = b20urls)
      .map { case (x, y) => (x, Array(y)) }
    val want = Holdout.truth20.toSet
    val kernel20 = {
      // the batch-20 kernel AS OF ITS FREEZE is gone (the batch closed);
      // measure the scorer's own tuples against truth plus the union with
      // a frozen stand-in: the historic kernel row was tp=7 fp=0 — for
      // architecture comparison the scorer-only P/R ranking is what
      // matters, reported alongside the union with TODAY's kernel
      Holdout.predicted20.toSet
    }
    Seq(("h16", 16, 42L), ("h32", 32, 42L), ("h48", 48, 42L),
      ("h32-s7", 32, 7L)).foreach { case (tag, hidden, seed) =>
      val m = NerTrain.train(data, SemanticScorer.Dim, hidden,
        Vector("collect"), epochs = 300, lr0 = 0.05f, seed = seed)
      val scored = Holdout.pages20.flatMap { p =>
        SemanticScorer.predictTuples(m,
          SemanticScorer.candidates(p.url, new String(p.html, UTF_8)))
      }.toSet.filter(Holdout.isRealTuple)
      def pr(got: Set[(String, String, String)]): (Double, Double) = {
        val tp = (got & want).size.toDouble
        (tp / math.max(1, got.size), tp / math.max(1, want.size))
      }
      val (sp, sr) = pr(scored)
      val (up, ur) = pr(kernel20 ++ scored)
      // closed-batch fp audit (scorer alone, batches 1-19)
      val closedFps = SemTrain.goldDocs.filterNot(g => b20urls.contains(g._1.url))
        .map { case (pg, truth) =>
          val s = SemanticScorer.predictTuples(m,
            SemanticScorer.candidates(pg.url, new String(pg.html, UTF_8)))
            .filter(Holdout.isRealTuple)
          (s -- truth).size
        }.sum
      println(f"SEMCAP $tag%-7s hidden=$hidden%2d scorer-only P=$sp%.3f R=$sr%.3f  " +
        f"union P=$up%.3f R=$ur%.3f  closed-fp=$closedFps")
    }
  }
}
