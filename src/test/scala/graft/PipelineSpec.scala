package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.kg.{KgPipeline, StageStore}

/** Spark-level pipeline tests: checkpoint/resume equivalence (north rule)
  * and lineage rows. */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("resume from checkpoint produces identical triples (t3)") {
    val dir = Files.createTempDirectory("graft-ckpt").toString
    val first = KgPipeline.runCheckpointed(spark, 20, dir, "run1")
      .select("url", "subj", "pred", "obj").collect().map(_.toString).sorted
    // second run must read the stage tables, not recompute
    val second = KgPipeline.runCheckpointed(spark, 20, dir, "run2")
      .select("url", "subj", "pred", "obj").collect().map(_.toString).sorted
    assert(first.nonEmpty)
    assert(first.sameElements(second))
    // lineage has per-partition rows for both stages
    val lineage = new StageStore(spark, dir, "x").lineage()
    val stages = lineage.select("stage").distinct().collect().map(_.getString(0)).toSet
    assert(stages == Set("segments", "triples_raw", "triples", "closure"))
    assert(lineage.filter(col("rowsOut") > 0).count() > 0)
    // the closure stage table answers who_collect as a pure filter,
    // identically to recomputing reachability from the triples
    val fromStage = graft.kg.KgApi.whoCollectFromClosure(
        spark.read.parquet(s"$dir/closure"), "email address")
      .collect().map(_.toString).sorted
    val recomputed = graft.kg.KgApi.whoCollect(
        spark.read.parquet(s"$dir/triples").as[graft.kg.Model.Triple](
          org.apache.spark.sql.Encoders.product[graft.kg.Model.Triple]),
        "email address")
      .collect().map(_.toString).sorted
    assert(fromStage.nonEmpty && fromStage.sameElements(recomputed))
  }

  test("pred-partitioned stage table prunes partitions on pred filters") {
    val dir = Files.createTempDirectory("graft-ckpt3").toString
    KgPipeline.runCheckpointed(spark, 20, dir, "run1").count()
    val scan = spark.read.parquet(s"$dir/triples").filter(col("pred") === "COLLECT")
    val formatted = scan.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the filter must land in PartitionFilters (directory pruning), not in
    // the data filters — at 10^12 rows this is the analysis queries' I/O win
    assert(formatted.contains("PartitionFilters: [isnotnull(pred"),
      s"pred filter not pruning partitions:\n$formatted")
    assert(scan.count() > 0)
  }

  test("fresh pipeline equals checkpointed pipeline (batched == inline purposes)") {
    // the checkpointed path labels purposes via the corpus-level batched
    // scorer; the fresh path labels inline per document — full-row equality
    // (incl. the purpose maps) pins batched == inline
    def rows(ds: org.apache.spark.sql.Dataset[graft.kg.Model.Triple]) =
      ds.collect().map(t => (t.url, t.subj, t.pred, t.obj, t.text,
        t.purposes.toSeq.map { case (k, v) => (k, v.toVector) }.sortBy(_._1)))
        .sortBy(_.toString)
    val dir = Files.createTempDirectory("graft-ckpt2").toString
    val fresh = rows(KgPipeline.run(spark, 20))
    val ckpt = rows(KgPipeline.runCheckpointed(spark, 20, dir, "run1"))
    assert(fresh.nonEmpty)
    assert(fresh.sameElements(ckpt))
    assert(fresh.exists(_._6.nonEmpty), "no purposes exercised by the corpus")
  }

  test("salted repartition spreads a hot key across partitions") {
    import spark.implicits._
    // 400 rows with the SAME url — the degenerate hot key
    val hot = KgPipeline.pages(spark, 400)
      .map(p => p.copy(url = "https://hot.example/privacy"))
    val unsalted = KgPipeline.saltedRepartition(hot, 8)
      .mapPartitions(it => Iterator.single(it.size)).filter(_ > 0).count()
    val salted = KgPipeline.saltedRepartition(hot, 8, saltBuckets = 8)
      .mapPartitions(it => Iterator.single(it.size)).filter(_ > 0).count()
    assert(unsalted == 1L, s"hot key should collapse to one partition unsalted, got $unsalted")
    assert(salted >= 4L, s"salting should spread the hot key, got $salted partitions")
    // row count is preserved either way
    assert(KgPipeline.saltedRepartition(hot, 8, saltBuckets = 8).count() == 400)
  }

  test("pointer jumping keeps rounds logarithmic in the component diameter") {
    import spark.implicits._
    // 1024-node chain: propagation alone needs ~1024 rounds; with pointer
    // jumping the reach doubles per round → ≤ log2(1023) + 2 = 12
    val chain = spark.range(0, 1023)
      .select(format_string("c%04d", col("id")).as("src"),
        format_string("c%04d", col("id") + 1).as("dst"))
    // localFinishEdges=0 disables the driver union-find so the distributed
    // propagate/jump path is what's measured
    val (labels, rounds) = graft.kg.AliasResolution.connectedComponentsWithRounds(
      chain, localFinishEdges = 0L)
    assert(labels.select("component").distinct().count() == 1)
    assert(rounds <= 12, s"rounds=$rounds for diameter 1023")
  }

  test("label parking: active frame shrinks monotonically and stars park at seed") {
    import spark.implicits._
    // 10k-spoke star + 64-node chain: the star must park at the first
    // contraction, so the iterate phase only ever shuffles the chain core
    val star = spark.range(1, 10001)
      .select(format_string("g%05d", col("id")).as("src"), lit("g00000").as("dst"))
    val chain = spark.range(0, 63)
      .select(format_string("h%05d", col("id")).as("src"),
        format_string("h%05d", col("id") + 1).as("dst"))
    val (labels, _, sizes) = graft.kg.AliasResolution.connectedComponentsDiag(
      star.union(chain), localFinishEdges = 0L)
    assert(sizes.nonEmpty)
    assert(sizes.head < 200,
      s"star vertices must park at the seed contraction; active size ${sizes.head}")
    assert(sizes == sizes.sorted.reverse, s"active frame grew: $sizes")
    // parked labels still resolve to the true component minima
    val comps = labels.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(comps.size == 10065)
    assert(comps("g09999") == "g00000" && comps("g00000") == "g00000")
    assert(comps("h00063") == "h00000" && comps("h00031") == "h00000")
  }

  test("alias components merge aliases of the same entity") {
    import spark.implicits._
    val edges = Seq(
      ("google llc", "entity:google"), ("youtube", "entity:google"),
      ("meta", "entity:facebook"), ("instagram", "entity:facebook"))
      .toDF("src", "dst")
    val comps = graft.kg.AliasResolution.connectedComponents(edges)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(comps("youtube") == comps("google llc"))
    assert(comps("meta") == comps("instagram"))
    assert(comps("meta") != comps("youtube"))
  }

  test("structured streaming: incremental KG extraction over arriving pages") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-pages").toString
    val pages = KgPipeline.pages(spark, 15)
    pages.write.mode("overwrite").parquet(dir)
    val batchTriples = KgPipeline.triplesFromPages(pages).count()
    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .parquet(dir)
      .as[graft.kg.Model.WebPage]
    val q = KgPipeline.triplesFromPages(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("kg_stream").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM kg_stream").collect()(0).getLong(0) == batchTriples)
    } finally q.stop()
  }

  test("salted repartition spreads pages evenly") {
    import spark.implicits._
    val pages = KgPipeline.pages(spark, 400)
    val parts = KgPipeline.saltedRepartition(pages, 8)
      .mapPartitions(it => Iterator(it.size)).collect()
    assert(parts.length == 8)
    assert(parts.min > 20, s"skewed partitions: ${parts.toSeq}")
  }

  test("checksum dedup drops exact copies") {
    import spark.implicits._
    val ps = KgPipeline.pages(spark, 30)
    val dup = ps.map(p => p.copy(url = p.url + "#dup"))
    assert(KgPipeline.dedupPages(ps.union(dup)).count() == 30)
  }

  test("stateful streaming: per-user event counting via mapGroupsWithState") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val dir = Files.createTempDirectory("graft-stateful")
    Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
      .selectExpr("user_id", "event_id").as[(Long, Long)]
    val counted = stream.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[(Long, Long)], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + it.size
          state.update(n)
          (user, n)
      }
    val q = counted.toDF("user_id", "n").writeStream
      .outputMode(OutputMode.Update).format("memory").queryName("sessions").start()
    try {
      q.processAllAvailable()
      val total = spark.sql("SELECT sum(n) FROM sessions").collect()(0).getLong(0)
      val batch = spark.read.parquet(s"$sf/events.parquet").count()
      assert(total == batch)
    } finally q.stop()
  }

  test("structured streaming: windowed counts over the events table (§2.9 capability)") {
    val sf = "/root/testdata/sf0.001"
    // streaming file source needs a directory
    val dir = Files.createTempDirectory("graft-stream")
    Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
      .withColumn("ts", col("ts").cast("timestamp")) // parquet NTZ → event-time LTZ
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("ev_windows").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT sum(n) FROM ev_windows").collect()(0).getLong(0)
      val batch = spark.read.parquet(s"$sf/events.parquet").count()
      assert(streamed == batch)
    } finally q.stop()
  }

  test("semantic augmentation stage preserves kernel triples and adds only party collects") {
    import spark.implicits._
    // the open holdout batch 25 is the compound vocabulary × frame probe: the
    // scorer's candidate generator is dictionary-bounded there, so the
    // pinned contract is superset + nothing-spurious (every added triple,
    // if any, is a party COLLECT). The strict "adds recall" obligation
    // moves to the learned mention NER once it lands (retarget with each
    // batch closure).
    val pages = spark.createDataset(graft.kg.Holdout.pages25)
    val kernel = graft.kg.KgPipeline.triplesFromPages(pages).cache()
    val aug = graft.kg.KgPipeline.augmentWithScorer(pages, kernel)
    val kSet = kernel.collect().map(t => (t.url, t.subj, t.obj)).toSet
    val aSet = aug.collect().map(t => (t.url, t.subj, t.obj)).toSet
    assert(kSet.subsetOf(aSet), "augmentation must preserve kernel triples")
    aug.collect().filterNot(t => kSet.contains((t.url, t.subj, t.obj)))
      .foreach { t =>
        assert(t.pred == "COLLECT" && (t.subj == "we" || t.subj == "third party"), t.toString)
      }
  }

  test("augmentation operating point: score column + calibrated precision floor") {
    import spark.implicits._
    // the scored view carries the MLP margin as a column (the auditable
    // production artifact), and the whole augmented tuple set at the
    // calibrated ScorerThreshold holds the pinned precision floor against
    // the open batch 25's FROZEN labels (rows in COVERAGE.md: kernel ∪
    // scorer P 0.938 there; Calibrate picks t=0.4 at closed-batch
    // P 0.990 / R 0.974)
    val pages = spark.createDataset(graft.kg.Holdout.pages25)
    val scored = graft.kg.KgPipeline.scoredTuples(pages)
    assert(scored.columns.toSeq == Seq("url", "party", "datatype", "score"))
    val accepted = scored
      .filter(col("score") >= graft.kg.KgPipeline.ScorerThreshold)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .filter(graft.kg.Holdout.isRealTuple).toSet
    val union = graft.kg.Holdout.predicted25.toSet ++ accepted
    val want = graft.kg.Holdout.truth25.toSet
    val p = (union & want).size.toDouble / math.max(1, union.size)
    info(f"augmented-path precision on frozen b25 labels: $p%.3f")
    assert(p >= 0.85, s"calibrated precision floor: $p")
  }
}
