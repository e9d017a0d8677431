package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Large-scale deduplication operators over the `documents` table.
  *
  * Scale design: exact dedup is one hash-shuffle on the text digest; MinHash
  * LSH and SimHash banding turn the O(n²) pair problem into an equi-join on
  * band keys (the standard shingle→minhash→band→bucket-join shape), so the
  * only quadratic work happens inside buckets — at 100 TB the band join is a
  * shuffle whose keys are uniformly distributed by construction, and skewed
  * buckets (boilerplate docs) are handled by AQE skew-join splitting.
  * Verification of candidates recomputes exact similarity only for bucket
  * pairs (a tiny fraction).
  */
object Dedup {

  /** Word shingles as array column. */
  def shingles(text: Column, n: Int): Column =
    transform(
      sequence(lit(0), greatest(size(split(text, " ")) - n, lit(0))),
      i => concat_ws(" ", slice(split(text, " "), i + 1, lit(n))))

  /** Exact dedup: winner per identical text (min doc_id), via one shuffle. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))

  /** 64-permutation MinHash signature from word 3-shingles, banded.
    * Shingle strings are hashed to 64-bit once; the 64 permutations are
    * cheap long re-mixes of that value — hashing the string 64 times was
    * the dominant cost of the signature. */
  def minhashBands(docs: DataFrame, numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sh = docs.select(col("doc_id"),
      transform(shingles(col("text"), 3), s => xxhash64(s)).as("hs"))
    val sigCols = (0 until numHashes).map { i =>
      array_min(transform(col("hs"), h => xxhash64(h, lit(i)))).as(s"h$i")
    }
    val sig = sh.select(col("doc_id") +: sigCols: _*)
    val bandCols = (0 until bands).map { b =>
      xxhash64((Seq(lit(b)) ++ (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}"))): _*)
        .as(s"band$b")
    }
    sig.select(col("doc_id") +: bandCols: _*)
  }

  /** Candidate pairs from LSH buckets, verified with exact shingle Jaccard.
    * Returns (a, b, jaccard) with a < b and jaccard >= threshold.
    *
    * Buckets larger than `maxBucket` are dropped before the self-join — the
    * standard boilerplate defense: a giant bucket is (quadratically) the
    * whole cost of LSH and near-dup pairs inside it still co-occur in other,
    * smaller bands with high probability. At 100 TB this cap is what keeps
    * the band join linear. */
  def minhashPairs(docs: DataFrame, threshold: Double = 0.8,
      maxBucket: Int = 64): DataFrame = {
    val banded = minhashBands(docs)
    val bands = banded.columns.filter(_.startsWith("band"))
    // explode to (band_key, doc_id) then self-join per bucket
    val kv0 = banded.select(col("doc_id"),
      explode(array(bands.zipWithIndex.map { case (c, i) =>
        struct(lit(i).as("b"), col(c).as("h"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("bk.b").as("b"), col("bk.h").as("h"))
    val kv = capBuckets(kv0, Seq("b", "h"), maxBucket)
    val pairs = kv.as("l").join(kv.as("r"),
        col("l.b") === col("r.b") && col("l.h") === col("r.h") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
      .distinct()
    verifyJaccard(pairs, docs, threshold)
  }

  /** Keep only rows whose bucket has at most `cap` members. */
  private def capBuckets(kv: DataFrame, keys: Seq[String], cap: Int): DataFrame = {
    val sizes = kv.groupBy(keys.map(col): _*).agg(count(lit(1)).as("_sz"))
      .filter(col("_sz") <= cap)
      .drop("_sz")
    kv.join(sizes, keys, "left_semi")
  }

  /** Exact word-3-shingle Jaccard for the given candidate pairs. */
  def verifyJaccard(pairs: DataFrame, docs: DataFrame, threshold: Double): DataFrame = {
    val sh = docs.select(col("doc_id"), array_distinct(shingles(col("text"), 3)).as("sh"))
    pairs
      .join(sh.select(col("doc_id").as("a"), col("sh").as("sha")), Seq("a"))
      .join(sh.select(col("doc_id").as("b"), col("sh").as("shb")), Seq("b"))
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("uni", size(array_union(col("sha"), col("shb"))))
      .withColumn("jaccard", round(col("inter") / col("uni"), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** 60-bit SimHash over word hashes. Word hashes come from md5 (first 15
    * hex chars → 60-bit int): unlike xxhash64, md5 is computable identically
    * in any engine, so the whole signature is cross-engine deterministic and
    * the DuckDB oracle can recompute it bit-for-bit. Still pure codegen. */
  def simhash(docs: DataFrame): DataFrame = {
    // sum of per-bit contributions: for each word hash, bit i adds +1/-1
    val words = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .select(col("doc_id"),
        conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long").as("h"))
    val bitCols = (0 until 60).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"b$i")
    }
    val agg = words.groupBy(col("doc_id")).agg(bitCols.head, bitCols.tail: _*)
    val sig = (0 until 60).map { i =>
      when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    agg.select(col("doc_id"), sig.as("simhash"))
  }

  /** Near-dup pairs by 4×15-bit band join + exact Hamming verification.
    * With 4 bands, any pair within Hamming distance 3 shares at least one
    * whole band (pigeonhole), so at the default `maxHamming = 3` the LSH
    * output EQUALS the brute-force answer — which is what the DuckDB oracle
    * computes. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3, maxBucket: Int = 64): DataFrame = {
    val sig = simhash(docs).cache()
    val banded0 = sig.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("b"),
          shiftright(col("simhash"), b * 15).bitwiseAND(lit(0x7fffL)).as("k"))): _*)).as("bk"))
      .select(col("doc_id"), col("simhash"), col("bk.b"), col("bk.k"))
    val banded = capBuckets(banded0, Seq("b", "k"), maxBucket)
    val cand = banded.as("l").join(banded.as("r"),
        col("l.b") === col("r.b") && col("l.k") === col("r.k") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"),
        col("l.simhash").as("sa"), col("r.simhash").as("sb"))
      .distinct()
    cand.withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming"))
  }

  /** Embedding near-dup: random-hyperplane LSH (bands × planes) + exact
    * cosine verification. Banding trades precision for recall the usual way:
    * a pair is a candidate if ANY band of hyperplane signs agrees. */
  def embeddingPairs(emb: DataFrame, threshold: Double = 0.95,
      bands: Int = 4, planesPerBand: Int = 8): DataFrame = {
    val dim = 64
    def bandSketch(b: Int): Column = (0 until planesPerBand).map { j =>
      val p = b * planesPerBand + j
      // deterministic pseudo-random hyperplane from xxhash64(plane, coord)
      val dot = aggregate(
        zip_with(col("embedding"),
          transform(sequence(lit(0), lit(dim - 1)),
            c => (xxhash64(lit(p), c).cast("double") / lit(Long.MaxValue.toDouble))),
          (x, r) => x.cast("double") * r),
        lit(0.0), (acc, x) => acc + x)
      when(dot > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    val sk = emb.select(col("vec_id") +: col("embedding") +:
      (0 until bands).map(b => bandSketch(b).as(s"sk$b")): _*)
    val kv = sk.select(col("vec_id"), col("embedding"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("b"), col(s"sk$b").as("k"))): _*)).as("bk"))
      .select(col("vec_id"), col("embedding"), col("bk.b"), col("bk.k"))
    val cand = kv.as("l").join(kv.as("r"),
        col("l.b") === col("r.b") && col("l.k") === col("r.k") &&
          col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("a"), col("r.vec_id").as("b"),
        col("l.embedding").as("ea"), col("r.embedding").as("eb"))
      .distinct()
    cand.withColumn("cosine", round(Similarity.cosine(col("ea"), col("eb")), 4))
      .filter(col("cosine") >= threshold)
      .select(col("a"), col("b"), col("cosine"))
  }
}
