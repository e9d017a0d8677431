package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity}

/** Round-7 optimization gate: the fused JVM rewrites of the dedup/knn hot
  * paths must reproduce the ROUND-6 catalyst-expression forms bit for bit.
  * Each test rebuilds the old expression pipeline inline and compares
  * exactly (longs for hashes/keys, raw doubles for cosines) — if a rewrite
  * ever drifts by one ulp or one hash bit, the oracle hashes would move,
  * so this is the first tripwire.
  */
class BitIdentitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"
  lazy val docs = spark.read.parquet(s"$sf/documents.parquet").cache()
  lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet").cache()

  test("JVM shingle strings equal the transform/slice expression form") {
    val expr = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val jvm = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> Dedup.shingleStrings(r.getString(1), 3).toSeq).toMap
    assert(expr.keySet == jvm.keySet)
    expr.foreach { case (id, s) => assert(jvm(id) == s, s"doc $id") }
  }

  test("JVM minhash band keys equal the expression-hashed form") {
    // round-6 first-level hash: xxhash64 over each shingle string
    val exprHashes = docs.select(col("doc_id"),
        transform(Dedup.shingles(col("text"), 3), s => xxhash64(s)).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    import org.apache.spark.sql.catalyst.expressions.{XXH64, XxHash64Function}
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    docs.select(col("doc_id"), col("text")).collect().foreach { r =>
      val jvm = Dedup.shingleStrings(r.getString(1), 3).toSeq
        .map(s => XxHash64Function.hash(UTF8String.fromString(s), StringType, 42L))
      assert(jvm == exprHashes(r.getLong(0)), s"doc ${r.getLong(0)}")
    }
    // and the banded frame stays keyed by those hashes end to end
    val banded = Dedup.minhashBands(docs)
    assert(banded.columns.toSeq == "doc_id" +: (0 until 16).map(b => s"band$b"))
    assert(banded.count() == docs.count())
  }

  test("JVM simhash signatures equal the explode/aggregate expression form") {
    val words = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .select(col("doc_id"),
        conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long").as("h"))
    val bitCols = (0 until 60).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"b$i")
    }
    val agg = words.groupBy(col("doc_id")).agg(bitCols.head, bitCols.tail: _*)
    val sigExpr = (0 until 60).map { i =>
      when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    val old = agg.select(col("doc_id"), sigExpr.as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val now = Dedup.simhash(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(now == old)
  }

  test("JVM hyperplane band keys equal the aggregate(zip_with) expression form") {
    val bands = 8; val ppb = 16; val dim = 64
    def bandSketch(b: Int) = (0 until ppb).map { j =>
      val plane = typedlit(Array.tabulate(dim)(c => Dedup.planeCoeff(b * ppb + j, c)))
      val dot = aggregate(zip_with(col("embedding"), plane,
        (x, r) => x.cast("double") * r), lit(0.0), (acc, x) => acc + x)
      when(dot > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    val old = emb.select(col("vec_id") +: (0 until bands).map(b => bandSketch(b).as(s"sk$b")): _*)
      .collect().map(r => r.getLong(0) -> (0 until bands).map(b => r.getLong(1 + b))).toMap
    val now = Dedup.embeddingBandKeys(emb, bands, ppb)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
      }
    assert(now.keySet == old.keySet)
    old.foreach { case (id, ks) => assert(now(id) == ks, s"vec $id") }
  }

  test("JVM cosine equals the HOF expression cosine to the last bit") {
    val pairs = emb.as("a").join(emb.as("b"),
        col("a.vec_id") + 7 === col("b.vec_id"))
      .select(col("a.vec_id").as("ia"), col("a.embedding").as("ea"),
        col("b.embedding").as("eb"))
    val exprCos = pairs
      .withColumn("c", Similarity.cosine(col("ea"), col("eb")))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    pairs.collect().foreach { r =>
      val a = r.getSeq[Float](1).toArray
      val b = r.getSeq[Float](2).toArray
      // same fold order as the rewritten scoring loop
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { dot += a(i).toDouble * b(i).toDouble; i += 1 }
      i = 0; while (i < a.length) { na += a(i).toDouble * a(i).toDouble; i += 1 }
      i = 0; while (i < b.length) { nb += b(i).toDouble * b(i).toDouble; i += 1 }
      val c = dot / (math.sqrt(na) * math.sqrt(nb))
      assert(java.lang.Double.doubleToLongBits(c) ==
        java.lang.Double.doubleToLongBits(exprCos(r.getLong(0))), s"pair ${r.getLong(0)}")
    }
  }
}
