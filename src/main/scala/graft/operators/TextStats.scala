package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: token counting,
  * quality scoring, language ID, document fingerprinting. All pure column
  * expressions (whole-stage codegen; no UDFs) with DuckDB-expressible
  * semantics so every query carries an oracle.
  */
object TextStats {

  private val enMarkers = Seq("the", "a", "and", "of", "to", "is", "in")
  private val frMarkers = Seq("le", "la", "les", "et", "de", "un", "une")
  private val deMarkers = Seq("der", "die", "das", "und", "ein", "nicht")
  private val esMarkers = Seq("el", "los", "las", "y", "un", "una", "que")

  private def hits(words: Column, markers: Seq[String]): Column =
    size(filter(words, w => w.isInCollection(markers)))

  /** Marker-word language ID (n-gram heuristic family, SURVEY U1-adjacent);
    * CJK characters short-circuit to zh. */
  def langId(text: Column): Column = {
    val words = split(lower(text), " ")
    val en = hits(words, enMarkers)
    val fr = hits(words, frMarkers)
    val de = hits(words, deMarkers)
    val es = hits(words, esMarkers)
    when(text.rlike("[\\u4e00-\\u9fff]"), "zh")
      .when(fr > en && fr >= de && fr >= es, "fr")
      .when(de > en && de > fr && de >= es, "de")
      .when(es > en && es > fr && es > de, "es")
      .otherwise("en")
  }

  /** Per-document token/char statistics. */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(split(col("text"), " ")).as("n_tokens"),
      length(col("text")).as("n_chars_m"),
      round(length(regexp_replace(col("text"), " ", "")).cast("double") /
        size(split(col("text"), " ")), 4).as("avg_word_len"))

  /** Quality score: stopword ratio, distinct-token ratio, length band
    * (the length/punct/stopword-ratio family of heuristics). */
  def quality(docs: DataFrame): DataFrame = {
    val words = split(col("text"), " ")
    val stop = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
    docs.select(
      col("doc_id"),
      col("source"),
      round(size(filter(words, w => w.isInCollection(stop))).cast("double") /
        size(words), 4).as("stopword_ratio"),
      round(size(array_distinct(words)).cast("double") / size(words), 4).as("distinct_ratio"),
      when(length(col("text")) < 100, "short")
        .when(length(col("text")) < 400, "medium")
        .otherwise("long").as("len_band"))
  }

  /** Quality rollup per source (the aggregate a curation pipeline filters on). */
  def qualityBySource(docs: DataFrame): DataFrame =
    quality(docs)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg(col("stopword_ratio")), 4).as("avg_stopword_ratio"),
        round(avg(col("distinct_ratio")), 4).as("avg_distinct_ratio"),
        count(when(col("len_band") === "short", 1)).as("n_short"))
      .orderBy(col("source"))

  /** Deterministic document fingerprint (xxhash64 of text) + collision check
    * against exact distinct counts per source. */
  def fingerprintStats(docs: DataFrame): DataFrame =
    docs.select(col("source"), col("text"), xxhash64(col("text")).as("fp"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("n_unique_fp"))
      .orderBy(col("source"))
}
