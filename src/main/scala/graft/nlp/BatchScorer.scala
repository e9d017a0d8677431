package graft.nlp

import org.apache.spark.sql.{DataFrame, Dataset}

/** Batched model-scoring slot (SURVEY.md U1/U8): the reference scores
  * purpose phrases with a SetFit transformer in batches of 256
  * (build_graph.py:98-119, purpose_classification.py:5-24). In production
  * this trait is backed by an ONNX session held once per executor and
  * invoked over batches inside `mapPartitions`; in this container no ONNX
  * runtime is available, so the deterministic keyword model stands in.
  * The Spark-side contract — distinct-before-score (A7), partition-level
  * batching, join-back by text — is real and tested (BatchScoringSpec).
  */
trait BatchScorer extends Serializable {
  /** One call per batch; returns per-text (label, score) candidates. */
  def scoreBatch(texts: Seq[String]): Seq[Seq[(String, Double)]]
}

/** Deterministic stand-in scorer: the keyword purpose model with score 1.0
  * per matched label (same labels the kernel uses inline). */
object KeywordPurposeScorer extends BatchScorer {
  override def scoreBatch(texts: Seq[String]): Seq[Seq[(String, Double)]] =
    texts.map(t => graft.kg.Normalizer.classifyPurpose(t).map(_ -> 1.0))
}

object BatchScoring {

  /** Score distinct purpose texts in executor-side batches and return
    * (purpose_text, labels). The `distinct()` is the reference's
    * unique-purpose-text batching (A7): at corpus scale the same phrases
    * repeat millions of times and must hit the model once. */
  def scorePurposeTexts(texts: Dataset[String], scorer: BatchScorer,
      batchSize: Int = 256, threshold: Double = 0.5): DataFrame = {
    val spark = texts.sparkSession
    import spark.implicits._
    texts.distinct()
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val scored = scorer.scoreBatch(batch)
          batch.iterator.zip(scored.iterator).map { case (t, ls) =>
            (t, ls.collect { case (l, sc) if sc >= threshold => l }.sorted)
          }
        }
      }
      .toDF("purpose_text", "labels")
  }
}
