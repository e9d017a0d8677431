package graft.kg

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import graft.gen.CorpusGen
import graft.text.HtmlSegmenter

/** Dev tool: raw kernel scaling without Spark — isolates JVM/CPU scaling
  * from Spark overheads. `sbt "runMain graft.kg.ScaleProbe [nDocs]"`. */
object ScaleProbe {
  private def run(nDocs: Int, threads: Int): Double = {
    val pool = Executors.newFixedThreadPool(threads)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val t0 = System.nanoTime()
    val chunk = math.max(1, nDocs / (threads * 4))
    val futures = (0 until nDocs).grouped(chunk).map { ids =>
      Future {
        ids.foreach { i =>
          val gp = CorpusGen.genPage(i, 42L)
          if (gp.page.lang == "en") {
            val segs = HtmlSegmenter.segment(gp.page.url, new String(gp.page.html, "UTF-8"))
            DocKernel.process(gp.page.url, segs)
          }
        }
      }
    }.toVector
    Await.result(Future.sequence(futures), Duration.Inf)
    pool.shutdown()
    (System.nanoTime() - t0) / 1e9
  }

  /** Bytes allocated per document by the kernel (ThreadMXBean-based) —
    * the allocation-rate number behind the 8→32 memory-bandwidth analysis
    * in BENCH/BASELINE.md. */
  private def allocPerDoc(nDocs: Int): Double = {
    val tmx = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    val tid = Thread.currentThread().getId
    val a0 = tmx.getThreadAllocatedBytes(tid)
    var i = 0
    while (i < nDocs) {
      val gp = CorpusGen.genPage(i, 42L)
      if (gp.page.lang == "en") {
        val segs = HtmlSegmenter.segment(gp.page.url, new String(gp.page.html, "UTF-8"))
        DocKernel.process(gp.page.url, segs)
      }
      i += 1
    }
    (tmx.getThreadAllocatedBytes(tid) - a0).toDouble / nDocs
  }

  /** Per-stage allocation breakdown (same ThreadMXBean counter), plus wall
    * time per doc for the same bracket (round-7: time attribution next to
    * the allocation attribution — they do not always rank stages the same
    * way). */
  private def allocBreakdown(nDocs: Int): Unit = {
    val tmx = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    val tid = Thread.currentThread().getId
    def measure(label: String)(f: Int => Unit): Unit = {
      val a0 = tmx.getThreadAllocatedBytes(tid)
      val t0 = System.nanoTime()
      var i = 0
      while (i < nDocs) { f(i); i += 1 }
      val usPerDoc = (System.nanoTime() - t0) / 1e3 / nDocs
      println(f"  $label%-12s ${(tmx.getThreadAllocatedBytes(tid) - a0).toDouble / nDocs / 1024}%.1f KiB/doc  $usPerDoc%.0f us/doc")
    }
    measure("genPage")(i => CorpusGen.genPage(i, 42L))
    val pages = (0 until nDocs).map(CorpusGen.genPage(_, 42L))
      .filter(_.page.lang == "en").map(gp => (gp.page.url, new String(gp.page.html, "UTF-8")))
    measure("segment")(i => if (i < pages.size) HtmlSegmenter.segment(pages(i)._1, pages(i)._2))
    val segs = pages.map { case (u, h) => (u, HtmlSegmenter.segment(u, h)) }
    measure("buildDocs")(i => if (i < segs.size) DocKernel.buildDocs(segs(i)._2))
    measure("annotate")(i => if (i < segs.size) DocKernel.annotate(segs(i)._1, segs(i)._2))
    measure("full")(i => if (i < segs.size) DocKernel.process(segs(i)._1, segs(i)._2))
    // per-annotator deltas: cumulative prefixes of the annotator chain (each
    // includes buildDocs; successive differences isolate one annotator)
    val chain = Seq[(String, DocKernel.DocState => Unit)](
      // MUST mirror DocKernel.annotate ordering exactly, or the cumulative
      // prefix deltas attribute allocation to the wrong annotator
      "actRelcl" -> DocKernel.annotateActivityRelcl,
      "recMedia" -> DocKernel.annotateRecordedMedia,
      "nominal" -> DocKernel.annotateNominalizations,
      "exceptive" -> DocKernel.annotateExceptives,
      "qaFrag" -> DocKernel.annotateQaFragments,
      "topical" -> DocKernel.annotateTopicalization,
      "access" -> DocKernel.annotateAccessPredicates,
      "gapping" -> DocKernel.annotateGapping,
      "taxonomy" -> DocKernel.annotateColonTaxonomy,
      "subsum" -> DocKernel.annotateSubsumption,
      "coref" -> DocKernel.annotateCoreference,
      "collect" -> DocKernel.annotateCollection,
      "oovTrans" -> DocKernel.annotateOovTransmission,
      "purpose" -> DocKernel.annotatePurpose,
      "list" -> DocKernel.annotateList,
      "subject" -> DocKernel.annotateSubject)
    (0 to chain.length).foreach { k =>
      val label = if (k == 0) "state-only" else s"+${chain(k - 1)._1}"
      measure(label) { i =>
        if (i < segs.size) {
          val st = DocKernel.DocState(segs(i)._1, segs(i)._2,
            DocKernel.buildDocs(segs(i)._2))
          chain.take(k).foreach(_._2(st))
        }
      }
    }
    // parse-phase attribution over the SELF text of every segment (no
    // context-chain duplication — ratios locate the buildDocs mass):
    // tokenize → tag → nerTag → sentence-split+parseSentence
    locally {
      import graft.nlp.RuleNlp
      measure("bd/tokenize")(i => if (i < segs.size)
        segs(i)._2.foreach(sg => RuleNlp.tokenize(sg.text)))
      val tokenized = segs.map(_._2.filter(_.text.nonEmpty)
        .map(sg => RuleNlp.tokenize(sg.text)))
      measure("bd/tag")(i => if (i < tokenized.size)
        tokenized(i).foreach { case (tv, wv) => RuleNlp.tag(tv, wv) })
      measure("bd/tag+ner")(i => if (i < tokenized.size)
        tokenized(i).foreach { case (tv, wv) => RuleNlp.nerTag(RuleNlp.tag(tv, wv)) })
      measure("bd/parse")(i => if (i < tokenized.size)
        tokenized(i).foreach { case (tv, wv) => RuleNlp.parse(tv, wv) })
      // parseSentence section attribution (ParseProbe brackets)
      RuleNlp.ParseProbe.enabled = true
      RuleNlp.ParseProbe.acc.clear()
      tokenized.foreach(_.foreach { case (tv, wv) => RuleNlp.parse(tv, wv) })
      RuleNlp.ParseProbe.enabled = false
      import scala.jdk.CollectionConverters._
      RuleNlp.ParseProbe.acc.asScala.toSeq.sortBy(_._1).foreach { case (l, a) =>
        println(f"  parse/$l%-11s ${a.sum.toDouble / tokenized.size / 1024}%.1f KiB/doc")
      }
    }
    // graph build in isolation (build() does not mutate the state)
    val states = segs.map { case (u, ss) =>
      val st = DocKernel.DocState(u, ss, DocKernel.buildDocs(ss))
      chain.foreach(_._2(st))
      st
    }
    measure("build-only")(i => if (i < states.size) GraphBuilder.build(states(i), "extended"))
    // per-step attribution inside GraphBuilder.build
    GraphBuilder.BuildProbe.enabled = true
    GraphBuilder.BuildProbe.acc.clear()
    states.foreach(st => GraphBuilder.build(st, "extended"))
    GraphBuilder.BuildProbe.enabled = false
    import scala.jdk.CollectionConverters._
    GraphBuilder.BuildProbe.acc.asScala.toSeq.sortBy(_._1).foreach { case (l, a) =>
      println(f"  build/$l%-12s ${a.sum.toDouble / states.size / 1024}%.1f KiB/doc")
    }
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(24000)
    run(2000, 8) // warmup
    println(f"alloc/doc = ${allocPerDoc(4000) / 1024}%.1f KiB")
    allocBreakdown(3000)
    Seq(1, 8, 32).foreach { th =>
      val t = run(n, th)
      println(f"threads=$th%2d wall=$t%.2f s throughput=${n / t}%.0f docs/s per-thread=${n / t / th}%.1f")
    }
  }
}
