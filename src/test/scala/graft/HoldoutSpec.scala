package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.kg.Holdout

/** Held-out naturalistic eval (VERDICT round 2, missing #1): integrity of the
  * hand-labeled corpus and regression floors for the honest P/R numbers.
  * The floors sit just under the measured round-3 baseline — they exist to
  * catch kernel regressions, not to certify quality (COVERAGE.md carries the
  * actual numbers and the round-4 target). */
class HoldoutSpec extends AnyFunSuite {

  test("holdout labels use canonical datatype vocabulary and known doc ids") {
    val loaded = graft.nlp.PhraseMapYaml.loaded
    val canonical = loaded.dataCanonical.values.toSet ++
      loaded.dataCanonicalCs.values.toSet
    val docUrls = Holdout.pages.map(_.url).toSet
    assert(Holdout.truth.nonEmpty && Holdout.pages.size >= 40)
    Holdout.truth.foreach { case (url, party, dt) =>
      assert(docUrls.contains(url), s"label references unknown doc: $url")
      assert(Set("we", "3rd-party").contains(party), s"bad party: $party")
      assert(canonical.contains(dt), s"non-canonical datatype label: $dt")
    }
  }

  test("holdout corpus is genuinely held out from the generator grammar") {
    // no holdout sentence may appear in the synthetic corpus (the closed
    // loop the holdout exists to break)
    val synth = graft.gen.CorpusGen.corpus(graft.kg.KgQueries.N_DOCS,
      graft.kg.KgQueries.SEED).map(gp => gp.page.text).mkString("\n")
    Holdout.pages.foreach { p =>
      val firstSentence = p.text.split('.').head.trim
      assert(!synth.contains(firstSentence), s"holdout text leaked into generator: ${p.url}")
    }
  }

  test("holdout P/R regression floors (round-3, 90-doc corpus)") {
    val rows = Holdout.prRows(Holdout.predicted.toSet, Holdout.truth.toSet)
      .map(r => r._1 -> r).toMap
    val (_, _, _, _, p, r) = rows("both")
    assert(p >= 0.99, s"holdout precision regressed: $p")
    assert(r >= 0.99, s"holdout recall regressed: $r")
  }

  test("holdout batch-2 P/R regression floors (closed at 1.0/1.0 end of round 3)") {
    val rows = Holdout.prRows(Holdout.predicted2.toSet, Holdout.truth2.toSet)
      .map(r => r._1 -> r).toMap
    val (_, _, _, _, p, r) = rows("both")
    assert(p >= 0.99, s"holdout2 precision regressed: $p")
    assert(r >= 0.99, s"holdout2 recall regressed: $r")
  }

  test("holdout batch-3 P/R regression floors (closed at 1.0/1.0 end of round 3)") {
    val rows = Holdout.prRows(Holdout.predicted3.toSet, Holdout.truth3.toSet)
      .map(r => r._1 -> r).toMap
    val (_, _, _, _, p, r) = rows("both")
    assert(p >= 0.99, s"holdout3 precision regressed: $p")
    assert(r >= 0.99, s"holdout3 recall regressed: $r")
  }

  test("holdout batch-4 P/R regression floors (closed at 1.0/1.0 in round 4)") {
    val rows = Holdout.prRows(Holdout.predicted4.toSet, Holdout.truth4.toSet)
      .map(r => r._1 -> r).toMap
    val (_, _, _, _, p, r) = rows("both")
    assert(p >= 0.99, s"holdout4 precision regressed: $p")
    assert(r >= 0.99, s"holdout4 recall regressed: $r")
  }

  test("holdout batch-5 P/R regression floors (closed at 1.0/1.0 in round 4)") {
    val rows = Holdout.prRows(Holdout.predicted5.toSet, Holdout.truth5.toSet)
      .map(r => r._1 -> r).toMap
    val (_, _, _, _, p, r) = rows("both")
    assert(p >= 0.99, s"holdout5 precision regressed: $p")
    assert(r >= 0.99, s"holdout5 recall regressed: $r")
  }

  test("holdout batch-6 P/R regression floors (closed at 1.0/1.0 in round 4)") {
    val rows = Holdout.prRows(Holdout.predicted6.toSet, Holdout.truth6.toSet)
      .map(r => r._1 -> r).toMap
    val (_, _, _, _, p, r) = rows("both")
    assert(p >= 0.99, s"holdout6 precision regressed: $p")
    assert(r >= 0.99, s"holdout6 recall regressed: $r")
  }

  test("holdout batch-7 P/R regression floors (closed at 1.0/1.0 in round 4)") {
    val rows = Holdout.prRows(Holdout.predicted7.toSet, Holdout.truth7.toSet)
      .map(r => r._1 -> r).toMap
    val (_, _, _, _, p, r) = rows("both")
    assert(p >= 0.99, s"holdout7 precision regressed: $p")
    assert(r >= 0.99, s"holdout7 recall regressed: $r")
  }

  test("holdout batch-8 P/R regression floors (closed at 1.0/1.0 in round 4)") {
    val rows = Holdout.prRows(Holdout.predicted8.toSet, Holdout.truth8.toSet)
      .map(r => r._1 -> r).toMap
    val (_, _, _, _, p, r) = rows("both")
    assert(p >= 0.99, s"holdout8 precision regressed: $p")
    assert(r >= 0.99, s"holdout8 recall regressed: $r")
  }

  test("holdout batch-9 P/R regression floors (closed at 1.0/1.0 in round 5)") {
    val rows = Holdout.prRows(Holdout.predicted9.toSet, Holdout.truth9.toSet)
      .map(r => r._1 -> r).toMap
    val (_, _, _, _, p, r) = rows("both")
    assert(p >= 0.99, s"holdout9 precision regressed: $p")
    assert(r >= 0.99, s"holdout9 recall regressed: $r")
  }

  test("holdout batch-10 P/R regression floors (closed at 1.0/1.0 in round 5)") {
    val rows = Holdout.prRows(Holdout.predicted10.toSet, Holdout.truth10.toSet)
      .map(r => r._1 -> r).toMap
    val (_, _, _, _, p, r) = rows("both")
    assert(p >= 0.99, s"holdout10 precision regressed: $p")
    assert(r >= 0.99, s"holdout10 recall regressed: $r")
  }

  test("holdout batch-11 P/R regression floors (closed at 1.0/1.0 in round 5)") {
    val rows = Holdout.prRows(Holdout.predicted11.toSet, Holdout.truth11.toSet)
      .map(r => r._1 -> r).toMap
    val (_, _, _, _, p, r) = rows("both")
    assert(p >= 0.99, s"holdout11 precision regressed: $p")
    assert(r >= 0.99, s"holdout11 recall regressed: $r")
  }

  test("holdout batch-12 P/R regression floors (closed at 1.0/1.0 in round 5)") {
    val rows = Holdout.prRows(Holdout.predicted12.toSet, Holdout.truth12.toSet)
      .map(r => r._1 -> r).toMap
    val (_, _, _, _, p, r) = rows("both")
    assert(p >= 0.99, s"holdout12 precision regressed: $p")
    assert(r >= 0.99, s"holdout12 recall regressed: $r")
  }

  test("holdout batch-13 P/R regression floors (closed at 1.0/1.0 in round 5)") {
    val rows = Holdout.prRows(Holdout.predicted13.toSet, Holdout.truth13.toSet)
      .map(r => r._1 -> r).toMap
    val (_, _, _, _, p, r) = rows("both")
    assert(p >= 0.99, s"holdout13 precision regressed: $p")
    assert(r >= 0.99, s"holdout13 recall regressed: $r")
  }

  test("holdout batch-14 P/R regression floors (closed at 1.0/1.0 in round 5)") {
    val rows = Holdout.prRows(Holdout.predicted14.toSet, Holdout.truth14.toSet)
      .map(r => r._1 -> r).toMap
    val (_, _, _, _, p, r) = rows("both")
    assert(p >= 0.99, s"holdout14 precision regressed: $p")
    assert(r >= 0.99, s"holdout14 recall regressed: $r")
  }

  test("holdout batch-15 P/R regression floors (closed at 1.0/1.0 in round 5)") {
    val rows = Holdout.prRows(Holdout.predicted15.toSet, Holdout.truth15.toSet)
      .map(r => r._1 -> r).toMap
    val (_, _, _, _, p, r) = rows("both")
    assert(p >= 0.99, s"holdout15 precision regressed: $p")
    assert(r >= 0.99, s"holdout15 recall regressed: $r")
  }

  test("holdout batch-16 P/R regression floors (closed at 1.0/1.0 in round 5)") {
    val rows = Holdout.prRows(Holdout.predicted16.toSet, Holdout.truth16.toSet)
      .map(r => r._1 -> r).toMap
    val (_, _, _, _, p, r) = rows("both")
    assert(p >= 0.99, s"holdout16 precision regressed: $p")
    assert(r >= 0.99, s"holdout16 recall regressed: $r")
  }

  test("holdout batch-17 P/R regression floors (closed at 1.0/1.0 in round 5)") {
    val rows = Holdout.prRows(Holdout.predicted17.toSet, Holdout.truth17.toSet)
      .map(r => r._1 -> r).toMap
    val (_, _, _, _, p, r) = rows("both")
    assert(p >= 0.99, s"holdout17 precision regressed: $p")
    assert(r >= 0.99, s"holdout17 recall regressed: $r")
  }

  test("holdout batch-18 P/R regression floors (closed at 1.0/1.0 in round 5)") {
    val rows = Holdout.prRows(Holdout.predicted18.toSet, Holdout.truth18.toSet)
      .map(r => r._1 -> r).toMap
    val (_, _, _, _, p, r) = rows("both")
    assert(p >= 0.99, s"holdout18 precision regressed: $p")
    assert(r >= 0.99, s"holdout18 recall regressed: $r")
  }

  test("holdout batch-19 P/R regression floors (closed at 1.0/1.0 in round 5)") {
    val rows = Holdout.prRows(Holdout.predicted19.toSet, Holdout.truth19.toSet)
      .map(r => r._1 -> r).toMap
    val (_, _, _, _, p, r) = rows("both")
    assert(p >= 0.99, s"holdout19 precision regressed: $p")
    assert(r >= 0.99, s"holdout19 recall regressed: $r")
  }

  test("holdout batch-20 P/R regression floors (closed at 1.0/1.0 in round 6)") {
    val rows = Holdout.prRows(Holdout.predicted20.toSet, Holdout.truth20.toSet)
      .map(r => r._1 -> r).toMap
    val (_, _, _, _, p, r) = rows("both")
    assert(p >= 0.99, s"holdout20 precision regressed: $p")
    assert(r >= 0.99, s"holdout20 recall regressed: $r")
  }

  test("holdout batch-21 P/R regression floors (closed at 1.0/1.0 in round 6)") {
    val rows = Holdout.prRows(Holdout.predicted21.toSet, Holdout.truth21.toSet)
      .map(r => r._1 -> r).toMap
    val (_, _, _, _, p, r) = rows("both")
    assert(p >= 0.99, s"holdout21 precision regressed: $p")
    assert(r >= 0.99, s"holdout21 recall regressed: $r")
  }

  test("holdout batch-22 P/R regression floors (closed at 1.0/1.0 in round 6)") {
    val rows = Holdout.prRows(Holdout.predicted22.toSet, Holdout.truth22.toSet)
      .map(r => r._1 -> r).toMap
    val (_, _, _, _, p, r) = rows("both")
    assert(p >= 0.99, s"holdout22 precision regressed: $p")
    assert(r >= 0.99, s"holdout22 recall regressed: $r")
  }

  test("holdout batch-23 P/R regression floors (closed at 1.0/1.0 in round 6)") {
    val rows = Holdout.prRows(Holdout.predicted23.toSet, Holdout.truth23.toSet)
      .map(r => r._1 -> r).toMap
    val (_, _, _, _, p, r) = rows("both")
    assert(p >= 0.99, s"holdout23 precision regressed: $p")
    assert(r >= 0.99, s"holdout23 recall regressed: $r")
  }

  test("holdout batch-24 P/R regression floors (closed at 1.0/1.0 in round 6)") {
    val rows = Holdout.prRows(Holdout.predicted24.toSet, Holdout.truth24.toSet)
      .map(r => r._1 -> r).toMap
    val (_, _, _, _, p, r) = rows("both")
    assert(p >= 0.99, s"holdout24 precision regressed: $p")
    assert(r >= 0.99, s"holdout24 recall regressed: $r")
  }
}
