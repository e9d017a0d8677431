package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.kg.GoldenGen

/** t1: the byte-identical extracted-text invariant (BASELINE.json
  * input_hint). The committed golden pins every segment's cleaned text for
  * 50 corpus pages; any byte drift in segmentation or cleanup fails here. */
class GoldenTextSpec extends AnyFunSuite {
  test("extracted segment text is byte-identical to the committed golden") {
    val golden = scala.io.Source.fromResource("golden_texts.tsv").mkString
    val now = GoldenGen.render(50)
    if (golden != now) {
      val g = golden.linesIterator.toVector
      val n = now.linesIterator.toVector
      val firstDiff = g.zipAll(n, "<missing>", "<missing>")
        .zipWithIndex.find { case ((a, b), _) => a != b }
      fail(s"golden text drift at line ${firstDiff.map(_._2)}: " +
        s"golden=${firstDiff.map(_._1._1)} now=${firstDiff.map(_._1._2)}")
    }
  }
}
