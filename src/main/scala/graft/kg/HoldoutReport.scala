package graft.kg

/** Dev tool: holdout P/R plus per-document miss/false-alarm diffs for both
  * holdout batches. `sbt "runMain graft.kg.HoldoutReport"` */
object HoldoutReport {

  private def report(tag: String, got: Set[(String, String, String)],
      want: Set[(String, String, String)]): Unit = {
    Holdout.prRows(got, want).foreach { case (p, tp, fp, fn, pr, rc) =>
      println(f"HOLDOUT$tag $p%-10s tp=$tp%3d fp=$fp%3d fn=$fn%3d precision=$pr%.4f recall=$rc%.4f")
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

  def main(args: Array[String]): Unit = {
    report("1", Holdout.predicted.toSet, Holdout.truth.toSet)
    report("2", Holdout.predicted2.toSet, Holdout.truth2.toSet)
    report("3", Holdout.predicted3.toSet, Holdout.truth3.toSet)
    report("4", Holdout.predicted4.toSet, Holdout.truth4.toSet)
    report("5", Holdout.predicted5.toSet, Holdout.truth5.toSet)
    report("6", Holdout.predicted6.toSet, Holdout.truth6.toSet)
    report("7", Holdout.predicted7.toSet, Holdout.truth7.toSet)
    report("8", Holdout.predicted8.toSet, Holdout.truth8.toSet)
    report("9", Holdout.predicted9.toSet, Holdout.truth9.toSet)
    report("10", Holdout.predicted10.toSet, Holdout.truth10.toSet)
    report("11", Holdout.predicted11.toSet, Holdout.truth11.toSet)
    report("12", Holdout.predicted12.toSet, Holdout.truth12.toSet)
    report("13", Holdout.predicted13.toSet, Holdout.truth13.toSet)
    report("14", Holdout.predicted14.toSet, Holdout.truth14.toSet)
    report("15", Holdout.predicted15.toSet, Holdout.truth15.toSet)
    report("16", Holdout.predicted16.toSet, Holdout.truth16.toSet)
    report("17", Holdout.predicted17.toSet, Holdout.truth17.toSet)
    report("18", Holdout.predicted18.toSet, Holdout.truth18.toSet)
    report("19", Holdout.predicted19.toSet, Holdout.truth19.toSet)
    report("20", Holdout.predicted20.toSet, Holdout.truth20.toSet)
    report("21", Holdout.predicted21.toSet, Holdout.truth21.toSet)
    report("22", Holdout.predicted22.toSet, Holdout.truth22.toSet)
    report("23", Holdout.predicted23.toSet, Holdout.truth23.toSet)
    report("24", Holdout.predicted24.toSet, Holdout.truth24.toSet)
    report("25", Holdout.predicted25.toSet, Holdout.truth25.toSet)
  }
}
