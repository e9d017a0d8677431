package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Training-data pipeline operators (dedup / similarity / text analysis /
  * multimodal) over `documents` and `embeddings`. EVERY query carries a
  * DuckDB oracle: the approximate operators are designed so their output is
  * deterministically recomputable (exact-recall banding, portable md5-based
  * hashing, deterministic centroids), and OpsSpec additionally pins them
  * against brute force.
  */
object OpsQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- dedup ---------------------------------------------------------
    "q_dedup_exact" -> ((s, d) =>
      Dedup.exact(t(s, d, "documents")).orderBy(col("keep_id"))),

    "q_dedup_minhash" -> ((s, d) =>
      Dedup.minhashPairs(t(s, d, "documents"), threshold = 0.5)
        .orderBy(col("a"), col("b"))),

    "q_dedup_simhash" -> ((s, d) =>
      Dedup.simhashPairs(t(s, d, "documents"), maxHamming = 3)
        .orderBy(col("a"), col("b"))),

    // near-dup input = table ∪ exact duplicates of the first 50 vectors
    // (vec_id + 1e6) — ground truth is those 50 pairs by construction
    "q_dedup_embedding" -> ((s, d) => {
      val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
      val dups = emb.filter(col("vec_id") < 50)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      Dedup.embeddingPairs(emb.union(dups), threshold = 0.9)
        .orderBy(col("a"), col("b"))
    }),

    // ---- similarity search ----------------------------------------------
    "q_knn_bruteforce" -> ((s, d) =>
      Similarity.bruteForceTopK(t(s, d, "embeddings"), nQueries = 64, k = 5)),

    "q_knn_ivf" -> ((s, d) =>
      Similarity.ivfTopK(t(s, d, "embeddings"), nQueries = 64, k = 5)),

    // ---- text analysis ---------------------------------------------------
    "q_text_tokens" -> ((s, d) =>
      TextStats.tokenStats(t(s, d, "documents")).orderBy(col("doc_id"))),

    "q_quality_by_source" -> ((s, d) =>
      TextStats.qualityBySource(t(s, d, "documents"))),

    "q_lang_id" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), TextStats.langId(col("text")).as("lang_pred"))
        .orderBy(col("doc_id"))),

    "q_fingerprint_stats" -> ((s, d) =>
      TextStats.fingerprintStats(t(s, d, "documents"))),

    // ---- multimodal (stubbed decode, real plumbing) ----------------------
    "q_media_features" -> ((s, d) => {
      Multimodal.extractFeatures(Multimodal.mediaTable(s, t(s, d, "documents")))
        .toDF()
        .select(col("doc_id"), col("format"), col("n_bytes"), col("n_frames"),
          size(col("feature")).as("feature_dim"))
        .orderBy(col("doc_id"))
    }),

    "q_media_frames" -> ((s, d) => {
      Multimodal.sampleFrames(Multimodal.mediaTable(s, t(s, d, "documents")))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_sampled"))
        .orderBy(col("doc_id"))
    }),

    // REAL multimodal decode: genuine BMP/WAV binaries parsed in a batched
    // narrow map (headers + pixel/sample data), 8×8-gray image embeddings
    // and duration/rms/zcr/peak audio features; the oracle replays the same
    // decode driver-side (gates the distributed plumbing)
    "q_media_decode" -> ((s, _) =>
      Multimodal.decodeReal(Multimodal.realMediaTable(s, MediaDecodeRows))
        .orderBy(col("doc_id"))),

    // ---- streaming-shaped batch window -----------------------------------
    "q_event_windows" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
        .orderBy(col("window_start"), col("event_type"))))

  private val stopList = "'the','a','an','and','or','of','to','in','is','it'"

  val MediaDecodeRows = 300

  private def mediaDecodeOracle: String = {
    val rows = (0 until MediaDecodeRows).map { i =>
      val r = Multimodal.decodeRow(Multimodal.realMediaRow(i.toLong))
      s"(${r._1}, '${r._2}', ${r._3}, ${r._4}, ${r._5}, ${r._6}, ${r._7}, ${r._8}, ${r._9})"
    }.mkString(", ")
    s"""SELECT CAST(doc_id AS BIGINT) AS doc_id, kind,
       CAST(dim1 AS INT) AS dim1, CAST(dim2 AS INT) AS dim2,
       CAST(n_units AS INT) AS n_units,
       CAST(f0 AS DOUBLE) AS f0, CAST(f1 AS DOUBLE) AS f1,
       CAST(f2 AS DOUBLE) AS f2, CAST(f3 AS DOUBLE) AS f3
       FROM (VALUES $rows)
       AS t(doc_id, kind, dim1, dim2, n_units, f0, f1, f2, f3)
       ORDER BY doc_id"""
  }

  def oracleSql: Map[String, String] = Map(
    "q_media_decode" -> mediaDecodeOracle,
    "q_dedup_exact" ->
      """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
         FROM documents GROUP BY text ORDER BY keep_id""",
    // brute-force exact 3-shingle Jaccard — O(n²) is fine at oracle scale;
    // the Spark side is LSH-bucketed + exact-verified, and every real pair
    // in the corpus sits far above the banding recall knee (j ≥ 0.9), so
    // the two answers coincide (OpsSpec pins 100% recall at j ≥ 0.8)
    "q_dedup_minhash" ->
      """WITH sh AS (
           SELECT doc_id, list_distinct(list_transform(
             range(greatest(len(string_split(text,' ')) - 3, 0) + 1),
             i -> array_to_string(list_slice(string_split(text,' '), i+1, i+3), ' '))) AS s
           FROM documents)
         SELECT a, b, jaccard FROM (
           SELECT l.doc_id AS a, r.doc_id AS b,
             round(len(list_intersect(l.s, r.s))::DOUBLE
                   / len(list_distinct(l.s || r.s)), 4) AS jaccard
           FROM sh l JOIN sh r ON l.doc_id < r.doc_id)
         WHERE jaccard >= 0.5 ORDER BY a, b""",
    // full SimHash recompute: md5-derived 60-bit word hashes make the
    // signature engine-portable; at maxHamming=3 the 4-band LSH is
    // exact-recall (pigeonhole), so brute force here equals the Spark LSH
    "q_dedup_simhash" ->
      """WITH words AS (
           SELECT doc_id, ('0x' || substr(md5(w), 1, 15))::BIGINT AS h
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
           WHERE w <> ''),
         bits AS (
           SELECT doc_id, i, SUM(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS sgn
           FROM words, range(60) t(i) GROUP BY doc_id, i),
         sig AS (
           SELECT doc_id, SUM(CASE WHEN sgn > 0 THEN (1::BIGINT << i) ELSE 0 END) AS simhash
           FROM bits GROUP BY doc_id)
         SELECT a, b, hamming FROM (
           SELECT l.doc_id AS a, r.doc_id AS b,
             CAST(bit_count(xor(l.simhash, r.simhash)) AS INT) AS hamming
           FROM sig l JOIN sig r ON l.doc_id < r.doc_id)
         WHERE hamming <= 3 ORDER BY a, b""",
    // independent IVF recompute: same deterministic centroid set (vec_id <
    // 16), same argmax assignment and nprobe=4 probe, ranked by cosine
    "q_knn_ivf" ->
      """WITH cent AS (
           SELECT vec_id AS cell_id, embedding AS ce FROM embeddings WHERE vec_id < 16),
         assigned AS (
           SELECT e.vec_id, e.embedding,
             (SELECT c.cell_id FROM cent c
              ORDER BY list_cosine_similarity(e.embedding, c.ce) DESC, c.cell_id
              LIMIT 1) AS cell_id
           FROM embeddings e),
         q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 64),
         probes AS (
           SELECT query_id, qe, cell_id FROM (
             SELECT q.query_id, q.qe, c.cell_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                 ORDER BY list_cosine_similarity(q.qe, c.ce) DESC, c.cell_id) AS rk
             FROM q, cent c) WHERE rk <= 4),
         scored AS (
           SELECT p.query_id, a.vec_id,
             list_cosine_similarity(p.qe, a.embedding) AS cosine
           FROM probes p JOIN assigned a ON a.cell_id = p.cell_id
           WHERE a.vec_id <> p.query_id),
         ranked AS (
           SELECT query_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
           FROM scored)
         SELECT query_id, rank, vec_id AS neighbor_id
         FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""",
    "q_dedup_embedding" ->
      """SELECT vec_id AS a, vec_id + 1000000 AS b, 1.0::DOUBLE AS cosine
         FROM embeddings WHERE vec_id < 50 ORDER BY a""",
    "q_text_tokens" ->
      """SELECT doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         length(text) AS n_chars_m,
         ROUND(CAST(length(replace(text, ' ', '')) AS DOUBLE) /
               len(string_split(text, ' ')), 4) AS avg_word_len
         FROM documents ORDER BY doc_id""",
    "q_quality_by_source" ->
      s"""WITH q AS (
           SELECT doc_id, source,
             ROUND(CAST(len(list_filter(string_split(text,' '), w -> w IN ($stopList))) AS DOUBLE)
                   / len(string_split(text,' ')), 4) AS stopword_ratio,
             ROUND(CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
                   / len(string_split(text,' ')), 4) AS distinct_ratio,
             CASE WHEN length(text) < 100 THEN 'short'
                  WHEN length(text) < 400 THEN 'medium' ELSE 'long' END AS len_band
           FROM documents)
         SELECT source, COUNT(*) AS n_docs,
           ROUND(AVG(stopword_ratio), 4) AS avg_stopword_ratio,
           ROUND(AVG(distinct_ratio), 4) AS avg_distinct_ratio,
           COUNT(*) FILTER (len_band = 'short') AS n_short
         FROM q GROUP BY source ORDER BY source""",
    "q_lang_id" ->
      """SELECT doc_id,
         CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
              WHEN fr > en AND fr >= de AND fr >= es THEN 'fr'
              WHEN de > en AND de > fr AND de >= es THEN 'de'
              WHEN es > en AND es > fr AND es > de THEN 'es'
              ELSE 'en' END AS lang_pred
         FROM (
           SELECT doc_id, text,
             len(list_filter(string_split(lower(text),' '), w -> w IN ('the','a','and','of','to','is','in'))) AS en,
             len(list_filter(string_split(lower(text),' '), w -> w IN ('le','la','les','et','de','un','une'))) AS fr,
             len(list_filter(string_split(lower(text),' '), w -> w IN ('der','die','das','und','ein','nicht'))) AS de,
             len(list_filter(string_split(lower(text),' '), w -> w IN ('el','los','las','y','un','una','que'))) AS es
           FROM documents)
         ORDER BY doc_id""",
    "q_fingerprint_stats" ->
      """SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT text) AS n_unique_fp
         FROM documents GROUP BY source ORDER BY source""",
    "q_knn_bruteforce" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 64),
         scored AS (
           SELECT q.query_id, e.vec_id,
             list_cosine_similarity(q.qe, e.embedding) AS cosine
           FROM embeddings e, q WHERE e.vec_id <> q.query_id),
         ranked AS (
           SELECT query_id, vec_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
           FROM scored)
         SELECT query_id, rank, vec_id AS neighbor_id
         FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""",
    "q_media_features" ->
      """SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS format,
         CAST(length(text) AS INT) AS n_bytes,
         CAST(CASE doc_id % 3
           WHEN 2 THEN GREATEST(1, length(text) // 64)
           WHEN 1 THEN GREATEST(1, length(text) // 256)
           ELSE 1 END AS INT) AS n_frames,
         16 AS feature_dim
         FROM documents ORDER BY doc_id""",
    "q_media_frames" ->
      """SELECT doc_id,
         CAST(CEIL(GREATEST(1, length(text) // 64) / 4.0) AS BIGINT) AS n_sampled
         FROM documents WHERE doc_id % 3 = 2 ORDER BY doc_id""",
    "q_event_windows" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
         event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
         FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""")
}
