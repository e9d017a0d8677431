package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.gen.CorpusGen
import graft.kg.{DocKernel, GraphBuilder}
import graft.nlp.{Lexicon, RuleNlp}
import graft.text.{HtmlSegmenter, TextClean}

/** ScalaCheck properties (SURVEY.md §5 t3). */
class PropertySpec extends AnyFunSuite {

  private def forAll[A](g: Gen[A])(f: A => Boolean): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100),
      Prop.forAll(g)(f))
    assert(res.passed, res.status.toString)
  }

  test("TextClean.clean is idempotent") {
    forAll(Gen.asciiPrintableStr) { s =>
      val once = TextClean.clean(s)
      TextClean.clean(once) == once
    }
  }

  test("dedupBySubstring is idempotent and never grows") {
    forAll(Gen.listOf(Gen.oneOf("a", "ab", "abc", "b c", "xyz", "x"))) { l =>
      val v = l.toVector
      val once = GraphBuilder.dedupBySubstring(v)
      GraphBuilder.dedupBySubstring(once) == once && once.size <= v.distinct.size
    }
  }

  test("lemma is a fixpoint after one application for vocabulary words") {
    (Lexicon.verbLemmas ++ Lexicon.stopWords).foreach { w =>
      assert(Lexicon.lemma(Lexicon.lemma(w)) == Lexicon.lemma(w))
    }
  }

  test("tokenize round-trips token text") {
    forAll(Gen.listOf(Gen.oneOf("we", "collect", "your", "email", "."))) { words =>
      val text = words.mkString(" ")
      val (toks, _) = RuleNlp.tokenize(text)
      toks.mkString("") == text.replace(" ", "")
    }
  }

  test("SUBSUM subgraph of any generated doc is a DAG") {
    forAll(Gen.choose(0, 400)) { i =>
      val gp = CorpusGen.genPage(i, 7L)
      gp.page.lang != "en" || {
        val segs = HtmlSegmenter.segment(gp.page.url, new String(gp.page.html, "UTF-8"))
        val sub = DocKernel.process(gp.page.url, segs)
          .filter(_.pred == "SUBSUM").map(t => t.subj -> t.obj)
        val adj = sub.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
        def reach(a: String, b: String, seen: Set[String]): Boolean =
          a == b || adj.getOrElse(a, Nil).exists(n => !seen(n) && reach(n, b, seen + n))
        !sub.exists { case (u, v) => reach(v, u, Set(v)) }
      }
    }
  }

  test("YAML pattern bank equals the inline compiler test vector (no drift)") {
    assert(graft.kg.Patterns.bank == graft.kg.Patterns.bankInline)
  }

  test("NOT_ and positive predicates partition the edge-type universe (SO5)") {
    import graft.kg.Model._
    assert(NegativeEdgeTypes.forall(_.startsWith("NOT_")))
    assert(PositiveEdgeTypes.intersect(NegativeEdgeTypes).isEmpty)
    assert(CollectEdgeTypes == PositiveEdgeTypes ++ NegativeEdgeTypes)
  }

  test("kernel never crashes on garbage HTML (fuzz)") {
    val frag = Gen.oneOf("<p>", "</p>", "<li>", "<ul>", "<h2>", "we", "collect",
      "email", "<", ">", "&amp;", "你好", "<script>x</script>", ":", ".", "<!--",
      "<div", "randomword", "\u0000", "é",
      // new token paths: contractions, bullets, partitives, abbreviations
      "don't", "won't", "n't", "'", "e.g.", "i.e.", "e.g", "* item", "1.",
      "a.", "some", "of", "such", "as", "for", "example", "-",
      // round-3-close mechanisms: clefts, exceptives, gerund preps,
      // negative inversion, additive PPs, Q-A fragments
      "It", "is", "that", "aside", "from", "except", "unless", "without",
      "At", "no", "time", "in", "addition", "to", "?", "before",
      "collecting", "including", "but", "not", "limited", "which")
    forAll(Gen.listOf(frag)) { parts =>
      val html = parts.mkString(" ")
      val segs = HtmlSegmenter.segment("fuzz", html)
      DocKernel.process("fuzz", segs) // must not throw
      true
    }
  }

  test("kernel is deterministic: same page → same triples") {
    (0 until 20).foreach { i =>
      val gp = CorpusGen.genPage(i, 42L)
      val segs = HtmlSegmenter.segment(gp.page.url, new String(gp.page.html, "UTF-8"))
      val a = DocKernel.process(gp.page.url, segs)
      val b = DocKernel.process(gp.page.url, segs)
      assert(a == b)
    }
  }
}
