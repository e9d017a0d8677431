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

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(24000)
    run(2000, 8) // warmup
    Seq(1, 8, 32).foreach { th =>
      val t = run(n, th)
      println(f"threads=$th%2d wall=$t%.2f s throughput=${n / t}%.0f docs/s per-thread=${n / t / th}%.1f")
    }
  }
}
