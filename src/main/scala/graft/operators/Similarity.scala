package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small) query set
  * against a full scan, all inside whole-stage codegen (`zip_with` +
  * `aggregate`, no UDFs). Scale path: IVF — vectors are assigned to their
  * nearest centroid in a NARROW map (centroids are literals, the broadcast
  * equivalent for expressions: zero shuffle, zero fan-out), and queries probe
  * only the nearest `nprobe` cells, cutting the scan by ~cells/nprobe.
  *
  * Top-k everywhere runs a per-partition partial top-k (bounded heap) before
  * the final window, so the rank shuffle moves ≤ k·queries rows per
  * partition instead of the full candidate set — the piece that keeps the
  * plan alive at 100 TB.
  */
object Similarity {

  /** Codegen-friendly cosine similarity of two float-array columns. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))
    val nb = sqrt(aggregate(transform(b, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))
    dot / (na * nb)
  }

  /** Centroid vectors as literal columns: the first `cells` vectors
    * (deterministic seed set). A bounded driver-side collect — 16 rows —
    * standing in for a broadcast variable, so the assignment below stays a
    * narrow projection. */
  private def centroidLits(emb: DataFrame, cells: Int): Seq[(Int, Column)] =
    emb.filter(col("vec_id") < cells)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0).toInt, typedlit(r.getSeq[Float](1).toArray)))
      .sortBy(_._1).toSeq

  /** Per-partition partial top-k on (query_id, vec_id, cosine): keeps the k
    * best rows per query per partition under (cosine desc, vec_id asc), so
    * the global rank only sorts ≤ k·queries rows per partition. */
  private def partialTopK(scored: DataFrame, k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    scored.select(col("query_id").cast("long"), col("vec_id").cast("long"),
        col("cosine").cast("double"))
      .as[(Long, Long, Double)]
      .mapPartitions { it =>
        // max-heap whose head is the WORST kept element per query
        val worstFirst = Ordering.by[(Double, Long), (Double, Long)] {
          case (cos, id) => (-cos, id)
        }
        val heaps = scala.collection.mutable.Map[Long, scala.collection.mutable.PriorityQueue[(Double, Long)]]()
        it.foreach { case (q, v, c) =>
          val h = heaps.getOrElseUpdate(q, scala.collection.mutable.PriorityQueue.empty(worstFirst))
          h.enqueue((c, v))
          if (h.size > k) h.dequeue()
        }
        heaps.iterator.flatMap { case (q, h) => h.iterator.map { case (c, v) => (q, v, c) } }
      }
      .toDF("query_id", "vec_id", "cosine")
  }

  /** Brute-force top-k neighbors for the query rows (vec_id < nQueries).
    * Output carries ids + rank only: ranking uses the raw (unrounded) cosine
    * so the oracle compare is robust to last-ulp accumulation differences. */
  def bruteForceTopK(emb: DataFrame, nQueries: Int = 8, k: Int = 5): DataFrame = {
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val scored = emb.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("qe"), col("embedding")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    partialTopK(scored, k)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF cell assignment: argmax over the literal centroids in a single
    * narrow projection — no cross join, no window, no shuffle (round-1 used
    * a crossJoin + Window sort-shuffle of n×cells rows; ADVICE fix).
    * Ties break to the lowest cell id (array_position returns the first
    * maximum). */
  def ivfAssign(emb: DataFrame, cells: Int = 16): DataFrame = {
    val cents = centroidLits(emb, cells)
    val ds = array(cents.map { case (_, c) => cosine(col("embedding"), c) }: _*)
    emb.withColumn("ds", ds)
      .withColumn("cell_id", (array_position(col("ds"), array_max(col("ds"))) - 1).cast("int"))
      .select(col("vec_id"), col("embedding"), col("cell_id"))
  }

  /** IVF top-k: probe the query's `nprobe` best cells only. Probe selection
    * is also a narrow array-sort over the literal centroids. */
  def ivfTopK(emb: DataFrame, nQueries: Int = 8, k: Int = 5,
      cells: Int = 16, nprobe: Int = 4): DataFrame = {
    val cents = centroidLits(emb, cells)
    val assigned = ivfAssign(emb, cells)
    // (negated cosine, cell_id) structs sort ascending = cosine desc, id asc
    val probeArr = slice(array_sort(array(cents.map { case (id, c) =>
      struct((-cosine(col("qe"), c)).as("negd"), lit(id).as("cell_id"))
    }: _*)), 1, nprobe)
    val probes = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      .withColumn("probe", explode(probeArr))
      .select(col("query_id"), col("qe"), col("probe.cell_id").as("cell_id"))
    val scored = assigned.join(broadcast(probes), Seq("cell_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("qe"), col("embedding")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    partialTopK(scored, k)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
      .orderBy(col("query_id"), col("rank"))
  }
}
