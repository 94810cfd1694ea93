package graft.operators

import graft.SparkTestBase

class SimilaritySpec extends SparkTestBase {

  test("brute-force top-k: 10 neighbors per query, ranks 1..10") {
    val rows = Similarity.sim_topk(spark, sf001).collect()
    assert(rows.length == 50)
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 5)
    byQ.values.foreach { rs =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to 10))
    }
  }

  test("LSH top-k candidates achieve reasonable recall vs brute force") {
    val exact = Similarity.sim_topk(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = Similarity.sim_lsh_topk(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & lsh).size.toDouble / exact.size
    // near-orthogonal random vectors are LSH's worst case; the point is
    // the candidate-pruning plan shape, asserted here with a loose bar
    assert(recall >= 0.4, s"recall=$recall")
    info(s"LSH recall vs brute force: $recall")
    // tuning knob: 32 narrower bands must not lower recall
    try {
      spark.conf.set("spark.graft.sim.lshBands", "32")
      val lsh32 = Similarity.sim_lsh_topk(spark, sf001).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
      val recall32 = (exact & lsh32).size.toDouble / exact.size
      info(s"LSH recall at 32 bands: $recall32")
      assert(recall32 >= recall, s"$recall32 < $recall")
    } finally spark.conf.unset("spark.graft.sim.lshBands")
  }

  test("IVF top-k: valid shape and recall reported vs brute force") {
    val rows = Similarity.sim_ivf_topk(spark, sf001).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 5)
    byQ.values.foreach { rs =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length))
      assert(rs.length <= 10)
    }
    val exact = Similarity.sim_topk(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    info(s"IVF recall vs brute force: $recall")
    assert(recall >= 0.2, s"recall=$recall") // mass-guarded ~25% probe
  }

  test("recall keys pass every query at the declared floors; a collapsed ANN fails them") {
    import org.apache.spark.sql.functions._
    // the driver-checkable contract: all 5 query ids survive the floor
    val lsh = Similarity.sim_lsh_recall(spark, sf001).collect()
      .map(_.getLong(0)).toSeq
    assert(lsh == Seq(0L, 1L, 2L, 3L, 4L), s"lsh recall gate: $lsh")
    val ivf = Similarity.sim_ivf_recall(spark, sf001).collect()
      .map(_.getLong(0)).toSeq
    assert(ivf == Seq(0L, 1L, 2L, 3L, 4L), s"ivf recall gate: $ivf")
    // negative control: an ANN that returns nothing must yield hits=0
    // for EVERY query (left join keeps the query set), so the gate
    // would emit zero rows → a red driver row, not a silent pass
    val empty = Similarity.sim_topk(spark, sf001).filter(lit(false))
    val audit = Similarity.annOverlap(spark, sf001, empty).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(audit == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L),
      s"collapsed-ANN audit: $audit")
  }

  test("IVF index: probe scan prunes to its probed bucket directories") {
    import org.apache.spark.sql.functions._
    // build (memoized) index, then read it back with a probe-style
    // filter on the partition column
    val idx = Similarity.ivfIndexPath(spark, sf001, 16)
    val all = spark.read.parquet(idx)
    val nBuckets = all.select("bucket").distinct().count()
    assert(nBuckets > 2, s"quantizer degenerate: $nBuckets buckets")
    val probed = all.filter(col("bucket").isin(0, 1))
    // plan proof: the filter lands in PartitionFilters (scan-level
    // directory pruning), not a post-scan Filter over all data
    val scan = probed.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("PartitionFilters") && scan.contains("bucket"), scan)
    // runtime proof: every file actually read lives under a probed
    // bucket directory
    val files = probed.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty)
    assert(files.forall(f => f.contains("bucket=0") || f.contains("bucket=1")),
      files.mkString("\n"))
    // and the index holds the whole corpus exactly once
    assert(all.count() ==
      spark.read.parquet(s"$sf001/embeddings.parquet").count())
  }

  test("IVF probe planner is distributed: a 1e5-row query TABLE runs " +
      "with no driver materialization of the query frame") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    import org.apache.spark.sql.functions._
    // 500 corpus vectors × 200 replicas = 100 000 queries with distinct
    // ids, declared lazily over the parquet scan — the frame itself is
    // ~28 MB of vectors and must NEVER be collected to the driver. The
    // r16 implementation collected it in the probe planner; this test
    // is the regression gate for the distributed rewrite.
    val reps = 200
    val e = graft.Tables.load(spark, sf001, "embeddings")
    val queries = e.select(col("vec_id"), col("embedding"))
      .crossJoin(spark.range(reps).select(col("id").as("rep")))
      .select((col("vec_id") * reps + col("rep") + 2000000000L).as("q_id"),
        col("embedding").as("q_emb"))
    val maxTaskResult = new java.util.concurrent.atomic.AtomicLong
    val totalResult = new java.util.concurrent.atomic.AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) {
          val r = t.taskMetrics.resultSize
          totalResult.addAndGet(r)
          maxTaskResult.getAndAccumulate(r, math.max(_, _))
        }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // table-scale strategy: salted shuffle join, zero broadcasts —
      // a broadcast exchange would collect its build side driver-side
      spark.conf.set("spark.graft.sim.ivf.shuffleJoin", "true")
      val df = Similarity.ivfRank(spark, sf001, queries)
      // plan shape: the probe side derives from the query TABLE's scan
      // (no pre-materialized local/RDD relation, the old signature)
      val plan = df.queryExecution.optimizedPlan
      val materialized = plan.collect {
        case l: org.apache.spark.sql.execution.LogicalRDD => l
        case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation
            if l.data.length > 1000 => l
      }
      assert(materialized.isEmpty, s"query frame was materialized: $plan")
      // every query finds its full top-10 (probed mass ≥ 1/3 of 500)
      assert(df.count() === reps * 500L * 10)
      // listener events drain asynchronously
      Thread.sleep(3000)
      // the 28 MB query frame never rode a task result to the driver:
      // the largest single task result stays metadata-sized, and the
      // whole pipeline's result traffic is far below the frame size
      assert(maxTaskResult.get() < (1L << 20),
        s"a task shipped ${maxTaskResult.get()} bytes to the driver")
      assert(totalResult.get() < (16L << 20),
        s"total driver result traffic ${totalResult.get()} bytes")
    } finally {
      spark.conf.unset("spark.graft.sim.ivf.shuffleJoin")
      spark.sparkContext.removeSparkListener(listener)
    }
  }

  test("IVF auto-routes: a 1e5-row query table takes the salted shuffle " +
      "join with the conf UNSET; a small batch keeps the broadcast plan") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    import org.apache.spark.sql.functions._
    assert(spark.conf.getOption("spark.graft.sim.ivf.shuffleJoin").isEmpty)
    // same 1e5-row lazily-declared query table as the listener gate
    val reps = 200
    val e = graft.Tables.load(spark, sf001, "embeddings")
    val queries = e.select(col("vec_id"), col("embedding"))
      .crossJoin(spark.range(reps).select(col("id").as("rep")))
      .select((col("vec_id") * reps + col("rep") + 2000000000L).as("q_id"),
        col("embedding").as("q_emb"))
    val maxTaskResult = new java.util.concurrent.atomic.AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          maxTaskResult.getAndAccumulate(t.taskMetrics.resultSize,
            math.max(_, _))
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val df = Similarity.ivfRank(spark, sf001, queries)
      assert(df.count() === reps * 500L * 10)
      Thread.sleep(3000)
      // the router chose the shuffle path: a broadcast of the 28 MB
      // query frame would ship it to the driver as task results
      assert(maxTaskResult.get() < (1L << 20),
        s"auto-router broadcast the query frame: a task shipped " +
          s"${maxTaskResult.get()} bytes to the driver")
    } finally spark.sparkContext.removeSparkListener(listener)

    // the declared keys' shape (small batch) keeps the broadcast plan
    val small = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val sdf = Similarity.ivfRank(spark, sf001, small)
    val plan = sdf.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(sdf.count() > 0)
  }

  test("selectProbes: min-mass guard expands past tiny cells, ties probe together") {
    // nearest two cells are nearly empty (the r15 10x-canary failure
    // shape): a 2-cell probe covers 5% of the corpus and the guard
    // must keep walking to the 25% mass floor
    val skewed = Map(0 -> 0L, 1 -> 5L, 2 -> 45L, 3 -> 50L)
    assert(Similarity.selectProbes(
      Seq((0, 0.1), (1, 0.2), (2, 0.3), (3, 0.4)), skewed, 2, 0.25) ==
      Seq(0, 1, 2))
    // balanced index: degenerates to a fixed probe count at the floor
    val balanced = (0 until 16).map(i => i -> 10L).toMap
    assert(Similarity.selectProbes(
      (0 until 16).map(i => (i, 0.1 * (i + 1))), balanced, 2, 0.25) ==
      Seq(0, 1, 2, 3))
    // an exact distance tie at the cutoff never splits: both tied
    // cells are probed
    assert(Similarity.selectProbes(
      Seq((7, 0.1), (3, 0.2), (5, 0.2), (9, 0.9)),
      Map(7 -> 50L, 3 -> 30L, 5 -> 10L, 9 -> 10L), 1, 0.6) ==
      Seq(7, 3, 5))
    // degenerate index (one cell holds everything): the guard probes
    // through to the heavy cell instead of stopping on empties
    assert(Similarity.selectProbes(
      Seq((0, 0.1), (1, 0.2), (2, 0.3)),
      Map(0 -> 0L, 1 -> 0L, 2 -> 100L), 2, 0.25) == Seq(0, 1, 2))
  }

  test("IVF recall gate holds on a 10x-replicated corpus (r15 canary regression)") {
    import org.apache.spark.sql.functions._
    // mirror CanaryGen's embedding replication exactly: ids shift by
    // replica*100M, vectors rotate by `replica` positions (an isometry
    // — within-replica cosines preserved, cross-replica ~0). The r15
    // failure mode was the quantizer REFIT over this corpus handing
    // one query near-empty nearest cells; the mass guard must hold the
    // recall floor for every query on the rebuilt index.
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
    val dim = e.selectExpr("size(embedding)").head.getInt(0)
    val reps = (0 until 10).map { r =>
      val k = r % dim
      e.withColumn("vec_id", col("vec_id") + lit(r * 100000000L))
        .withColumn("embedding", expr(
          s"concat(slice(embedding, $k + 1, size(embedding) - $k), " +
            s"slice(embedding, 1, $k))"))
    }.reduce(_ unionByName _)
    val dir = java.nio.file.Files.createTempDirectory("ivf-reps").toString
    reps.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val ivf = Similarity.sim_ivf_recall(spark, dir).collect()
      .map(_.getLong(0)).toSeq
    assert(ivf == Seq(0L, 1L, 2L, 3L, 4L), s"ivf recall gate at 10x: $ivf")
    // and the diagnostic audit emits one row per query with its hits
    val diag = Similarity.diagnostics("sim_ivf_recall_diag")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(diag.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L, 4L), diag.toSeq)
    assert(diag.forall(_._2 >= 1), s"per-query hits: ${diag.toSeq}")
  }

  test("int8 quantization is exact; its top-k tracks the float baseline") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // exact quantized values at scale = max|x| = 1.0: 63.5 rounds
    // half-away-from-zero to 64 (the tie case both engines must agree on)
    val q = Seq((1L, Array(0.5f, -1.0f, 0.25f, 0.0f)))
      .toDF("vec_id", "embedding")
      .select(Similarity.quantizeInt8(col("embedding")).as("q"))
      .collect()(0).getSeq[Int](0)
    assert(q.toSeq == Seq(64, -127, 32, 0), q)
    val rows = Similarity.sim_topk_int8(spark, sf001).collect()
    assert(rows.length == 50)
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to 10))
    }
    // int8 on a unit-norm corpus preserves cosine order to quantization
    // error. Random near-orthogonal vectors are the worst case — the
    // true neighbors are nearly tied, so ±1/127 quantization noise
    // swaps borderline ranks (measured 0.74 here); the floor catches a
    // BROKEN quantization (overlap → ~k/N ≈ 0.02), not rank jitter.
    val exact = Similarity.sim_topk(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val i8 = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val overlap = (exact & i8).size.toDouble / exact.size
    info(s"int8 top-k overlap with float top-k: $overlap")
    assert(overlap >= 0.6, s"overlap=$overlap")
  }

  test("cosine_sim expression: self-similarity is 1") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions
    val e = spark.read.parquet(s"$sf001/embeddings.parquet").limit(5)
    val sims = e.select(
      VectorFunctions.cosine_sim(col("embedding"), col("embedding")).as("s"))
      .collect().map(_.getDouble(0))
    assert(sims.forall(s => math.abs(s - 1.0) < 1e-9))
  }

  test("planted gates: both ANN paths retrieve every planted duplicate") {
    import org.apache.spark.sql.functions._
    // engine-side mirror of the driver oracle: the full planted set
    val expected = spark.read.parquet(s"$sf001/embeddings.parquet")
      .filter(col("vec_id") % 97 === 3 &&
        array_max(transform(col("embedding"), x => abs(x))) > 0f)
      .select((col("vec_id") + 1000000000L).as("q_id"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(expected.nonEmpty)
    val lsh = Similarity.sim_lsh_planted(spark, sf001)
      .collect().map(_.getLong(0)).toSeq
    val ivf = Similarity.sim_ivf_planted(spark, sf001)
      .collect().map(_.getLong(0)).toSeq
    assert(lsh == expected, s"lsh=$lsh expected=$expected")
    assert(ivf == expected, s"ivf=$ivf expected=$expected")
    // the custom ApproxCosineJoin node must find every planted self-pair
    val approx = Similarity.sim_approx_planted(spark, sf001)
      .collect().map(_.getLong(0) + 1000000000L).toSeq
    assert(approx == expected, s"approx=$approx expected=$expected")
  }

  test("embed_outliers: a planted anti-centroid vector is the rank-1 outlier") {
    import spark.implicits._
    // label 0: nine vectors near +e1, one (id 99) pointing the opposite
    // way — it must surface as the worst cosine-to-centroid. label 1 is
    // a second cluster to prove the grouping is per-label.
    val near = (0L until 9L).map(i =>
      (i, Array(1f, 0.01f * i, 0f, 0f), 0))
    val anti = Seq((99L, Array(-1f, 0f, 0f, 0f), 0))
    val other = (100L until 105L).map(i =>
      (i, Array(0f, 0f, 1f, 0.01f * (i - 100)), 1))
    val dir = java.nio.file.Files.createTempDirectory("outliers").toString
    (near ++ anti ++ other).toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val out = Similarity.embed_outliers(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val lab0 = out.filter(_._1 == 0)
    assert(lab0.head == ((0, 1, 99L, lab0.head._4)), s"got ${lab0.toSeq}")
    assert(lab0.head._4 < 0, "anti-centroid cosine should be negative")
    // 5 per label, ranks 1..5, label 1 untouched by label 0's outlier
    assert(out.count(_._1 == 0) == 5 && out.count(_._1 == 1) == 5)
    assert(out.filter(_._1 == 1).map(_._2).toSeq == Seq(1, 2, 3, 4, 5))
    assert(!out.filter(_._1 == 1).exists(_._3 == 99L))
  }
}
