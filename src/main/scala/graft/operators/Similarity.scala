package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small) query set
  * against a full scan, all inside whole-stage codegen (`zip_with` +
  * `aggregate`, no UDFs). Scale path: IVF — a one-pass k-means-lite
  * assignment to deterministic centroids; queries probe only the nearest
  * `nprobe` cells, cutting the scan by ~k/nprobe. At 100 TB the cell
  * assignment is a narrow map and the probe is a semi-join on cell ids.
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
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF cell assignment: centroids = the first `cells` vectors (deterministic
    * seed set); every vector joins its nearest centroid. */
  def ivfAssign(emb: DataFrame, cells: Int = 16): DataFrame = {
    val centroids = emb.filter(col("vec_id") < cells)
      .select(col("vec_id").as("cell_id"), col("embedding").as("ce"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("d").desc, col("cell_id"))
    emb.crossJoin(broadcast(centroids))
      .withColumn("d", cosine(col("embedding"), col("ce")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("embedding"), col("cell_id"))
  }

  /** IVF top-k: probe the query's `nprobe` best cells only. */
  def ivfTopK(emb: DataFrame, nQueries: Int = 8, k: Int = 5,
      cells: Int = 16, nprobe: Int = 4): DataFrame = {
    val assigned = ivfAssign(emb, cells).cache()
    val centroids = emb.filter(col("vec_id") < cells)
      .select(col("vec_id").as("cell_id"), col("embedding").as("ce"))
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val wq = Window.partitionBy(col("query_id")).orderBy(col("d").desc, col("cell_id"))
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("d", cosine(col("qe"), col("ce")))
      .withColumn("rk", row_number().over(wq))
      .filter(col("rk") <= nprobe)
      .select(col("query_id"), col("qe"), col("cell_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    assigned.join(broadcast(probes), Seq("cell_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", round(cosine(col("qe"), col("embedding")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }
}
