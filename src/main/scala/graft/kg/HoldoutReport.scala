package graft.kg

/** Dev tool: holdout P/R plus per-document miss/false-alarm diffs.
  * `sbt "runMain graft.kg.HoldoutReport [verbose]"` */
object HoldoutReport {
  def main(args: Array[String]): Unit = {
    val got = Holdout.predicted.toSet
    val want = Holdout.truth.toSet
    Holdout.prRows(got, want).foreach { case (p, tp, fp, fn, pr, rc) =>
      println(f"HOLDOUT $p%-10s tp=$tp%3d fp=$fp%3d fn=$fn%3d precision=$pr%.4f recall=$rc%.4f")
    }
    val byUrl = (got ++ want).map(_._1).toVector.distinct.sorted
    byUrl.foreach { u =>
      val g = got.filter(_._1 == u).map(t => (t._2, t._3))
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
