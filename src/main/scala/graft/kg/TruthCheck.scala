package graft.kg

import graft.gen.CorpusGen
import graft.text.HtmlSegmenter

/** Dev tool: kernel-vs-ground-truth diff over the synthetic corpus (no
  * Spark). `sbt "runMain graft.kg.TruthCheck [n]"` prints P/R and the first
  * mismatching documents. */
object TruthCheck {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200)
    val corpus = CorpusGen.corpus(n)
    var tp = 0; var fp = 0; var fn = 0
    var purposeBad = 0
    var shown = 0
    corpus.foreach { gp =>
      val page = gp.page
      if (page.lang == "en") {
        val segs = HtmlSegmenter.segment(page.url, new String(page.html, "UTF-8"))
        val triples = DocKernel.process(page.url, segs)
        val got = triples.map(t => (t.subj, t.pred, t.obj)).toSet
        val want = gp.truth.map(t => (t.subj, t.pred, t.obj)).toSet
        tp += got.intersect(want).size
        fp += (got -- want).size
        fn += (want -- got).size
        // purposes + evidence agreement on matched triples
        val purposeGot = triples.map(t => (t.subj, t.pred, t.obj) ->
          t.purposes.keys.toVector.sorted.mkString(",")).toMap
        val evidenceGot = triples.map(t => (t.subj, t.pred, t.obj) ->
          t.text.mkString(" || ")).toMap
        val typesGot = triples.map(t => (t.subj, t.pred, t.obj) ->
          (t.subjType, t.objType)).toMap
        gp.truth.foreach { tr =>
          if (got.contains((tr.subj, tr.pred, tr.obj))) {
            val g = purposeGot.getOrElse((tr.subj, tr.pred, tr.obj), "")
            if (g != tr.purpose) {
              purposeBad += 1
              if (shown < 10) println(s"PURPOSE ${page.url} (${tr.subj},${tr.pred},${tr.obj}): got '$g' want '${tr.purpose}'")
            }
            val ev = evidenceGot.getOrElse((tr.subj, tr.pred, tr.obj), "")
            if (ev != tr.evidence.mkString(" || ")) {
              purposeBad += 1
              if (shown < 10) println(s"EVIDENCE ${page.url} (${tr.subj},${tr.pred},${tr.obj}):\n  got  '$ev'\n  want '${tr.evidence.mkString(" || ")}'")
            }
            val ty = typesGot.getOrElse((tr.subj, tr.pred, tr.obj), ("", ""))
            if (ty != ((tr.subjType, tr.objType))) {
              purposeBad += 1
              if (shown < 10) println(s"TYPES ${page.url} (${tr.subj},${tr.pred},${tr.obj}): got $ty want ${(tr.subjType, tr.objType)}")
            }
          }
        }
        if ((got != want) && shown < 12) {
          shown += 1
          println(s"== ${page.url}")
          println(new String(page.html, "UTF-8"))
          (got -- want).foreach(t => println(s"  FP: $t"))
          (want -- got).foreach(t => println(s"  FN: $t"))
        }
      }
    }
    val p = tp.toDouble / math.max(1, tp + fp)
    val r = tp.toDouble / math.max(1, tp + fn)
    println(f"docs=$n tp=$tp fp=$fp fn=$fn precision=$p%.4f recall=$r%.4f purposeMismatch=$purposeBad")
  }
}
