package graft.operators

import graft.SparkTestBase

/** Smoke + invariant tests for the declared relational surface.
  * Deep value checks run against the DuckDB oracle via Verify/selfcheck;
  * here we assert structural invariants that hold at any scale factor.
  */
class RelationalSpec extends SparkTestBase {

  test("every declared query runs on sf0.001") {
    Relational.queries.foreach { case (name, q) =>
      val df = q(spark, sf0001)
      val n = df.count()
      withClue(s"$name: ") { assert(n >= 0) }
    }
  }

  test("oracle keys are a subset of query keys") {
    val extra = Relational.oracles.keySet -- Relational.queries.keySet
    assert(extra.isEmpty, s"oracles without queries: $extra")
  }

  test("q03 count equals table size") {
    val expected =
      spark.read.parquet(s"$sf0001/lineitem.parquet").count()
    val got = Relational.q03_count(spark, sf0001).collect().head.getLong(0)
    assert(got == expected)
  }

  test("q06 group-by partitions the q03 total") {
    val total = Relational.q03_count(spark, sf0001).collect().head.getLong(0)
    val byGroup = Relational.q06_groupby(spark, sf0001)
      .agg(org.apache.spark.sql.functions.sum("cnt")).collect().head.getLong(0)
    assert(byGroup == total)
  }

  test("q08 anti is non-empty and complements customers with recent orders") {
    import org.apache.spark.sql.functions._
    val cust = spark.read.parquet(s"$sf0001/customer.parquet").count()
    val semi = Relational.q08_semi(spark, sf0001).count()
    // every TESTDATA customer has some order — which is exactly why the
    // anti side must use a filtered subset to be non-vacuous
    assert(semi == cust)
    val anti = Relational.q08_anti(spark, sf0001).count()
    assert(anti > 0, "anti-join must return rows, not a vacuous empty set")
    val withRecent = spark.read.parquet(s"$sf0001/orders.parquet")
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp_ntz"))
      .select("o_custkey").distinct().count()
    assert(anti == cust - withRecent)
  }

  test("q11 union/intersect/except obey inclusion-exclusion") {
    val u = Relational.q11_union(spark, sf0001).count()
    val i = Relational.q11_intersect(spark, sf0001).count()
    val e = Relational.q11_except(spark, sf0001).count()
    // |A∪B| = |A\B| + |B\A| + |A∩B|; and |A| = |A\B| + |A∩B|
    assert(e + i <= u && u >= e)
  }

  test("q10 top-k is sorted descending") {
    val prices = Relational.q10_topk(spark, sf0001)
      .collect().map(_.getDouble(1))
    assert(prices.sameElements(prices.sortBy(-(_: Double))))
  }

  test("q19 approx distinct within 5% of exact") {
    val r = Relational.q19_approx(spark, sf0001).collect().head
    assert(r.getDouble(2) < 0.05, s"rel_err=${r.getDouble(2)}")
  }

  test("q19 gate emits the FULL group list (every HLL estimate in band)") {
    import org.apache.spark.sql.functions.{countDistinct, year}
    val got = Relational.q19_approx_gate(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = graft.Tables.load(spark, sf0001, "orders")
      .select(year(org.apache.spark.sql.functions.col("o_orderdate"))
        .cast("long").as("y"), org.apache.spark.sql.functions.col("o_orderpriority").as("p"))
      .distinct().collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(got.toSeq == want.toSeq,
      s"groups out of the 8% band: ${want.toSet -- got.toSet}")
    assert(got.nonEmpty)
  }

  test("q31 bloom prefilter equals the plain semi join and actually prunes") {
    import org.apache.spark.sql.functions.{broadcast, col}
    val got = Relational.q31_bloom(spark, sf0001).collect().map(_.getLong(0))
    val orders = graft.Tables.load(spark, sf0001, "orders")
    val keys = graft.Tables.load(spark, sf0001, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val want = orders.join(broadcast(keys),
        orders("o_custkey") === keys("c_custkey"), "leftsemi")
      .select(col("o_orderkey")).collect().map(_.getLong(0)).sorted
    assert(got.toSeq == want.toSeq)
    assert(got.nonEmpty && got.length < orders.count(),
      "prefilter output must be a strict, non-empty subset")
  }

  test("entry flagship returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("q23 as-of semantics: latest at-or-before, per user, left-joined") {
    val probes = Relational.q23_asof(spark, sf0001).collect()
    // every probe ('view') row survives — left semantics
    val views = graft.Tables.load(spark, sf0001, "events")
      .filter(org.apache.spark.sql.functions.col("event_type") === "view")
    assert(probes.length == views.count())
    // each matched purchase is truly at-or-before its view, same user
    val ev = graft.Tables.load(spark, sf0001, "events")
      .select("event_id", "user_id", "ts").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getTimestamp(2))).toMap
    val purchases = graft.Tables.load(spark, sf0001, "events")
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .select("user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)))
    probes.filterNot(_.isNullAt(1)).foreach { r =>
      val (user, viewTs) = ev(r.getLong(0))
      val asofTs = r.getTimestamp(1)
      assert(!asofTs.after(viewTs), s"match after probe: $r")
      // it is the LATEST eligible purchase for that user
      val best = purchases.filter(p => p._1 == user && !p._2.after(viewTs))
        .map(_._2).max((a: java.sql.Timestamp, b: java.sql.Timestamp) =>
          a.compareTo(b))
      assert(asofTs == best, s"not the latest match: $r vs $best")
    }
    // and probes with no eligible purchase are NULL, not dropped
    val nullRows = probes.filter(_.isNullAt(1))
    nullRows.foreach { r =>
      val (user, viewTs) = ev(r.getLong(0))
      assert(!purchases.exists(p => p._1 == user && !p._2.after(viewTs)), r)
    }
  }

  test("q28 sessionize: gap >= 30 min splits, < 30 min merges, per user") {
    import spark.implicits._
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    // user 1: events at 0, 29, 59 min (gaps 29, 30) → sessions {0,29}, {59}
    // user 2: one event → one singleton session
    val dir = java.nio.file.Files.createTempDirectory("sess").toString
    Seq(
      (10L, ts(0), 1L, "view", 0.0, "{}"),
      (11L, ts(29), 1L, "view", 0.0, "{}"),
      (12L, ts(59), 1L, "view", 0.0, "{}"),
      (20L, ts(5), 2L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Relational.q28_sessionize(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)), out.toSeq)
  }

  test("q34 tile round trip: truncation, empty doc, id self-identification") {
    // the shipped corpora never exercise the >636-byte truncation or
    // the empty-doc all-zero line, and the driver oracle can only agree
    // with what it sees — pin those semantics on a synthetic corpus,
    // including a doc_id above 2^31 (the canary replica-shift range)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q34t").toString
    val big = 5000000000L // > 2^32: all four base-32768 id pixels in play
    Seq((0L, ""), (7L, "AB"), (big, "x" * 700 /* > 636: truncated */))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Relational.q34_fits_tilecomp(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.map(_._1).toSeq == Seq(0L, 7L, big), out.map(_._1).toSeq)
    val byId = out.toMap
    assert(byId(0L) == Seq.fill(636)("0").mkString(","), "empty doc")
    assert(byId(7L) == (Seq("65", "66") ++ Seq.fill(634)("0")).mkString(","))
    assert(byId(big) == Seq.fill(636)("120").mkString(","), "truncated doc")
  }

  test("q35 cutout: band selection exact, pruning real, canary ids pinned to replica 0") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the declared band is [100,299]: every surviving line is the
    // doc_id-sorted corpus's 100th..299th doc, payload pixels exact
    val out = Relational.q35_fits_cutout(spark, sf001).collect()
    assert(out.length == 200, out.length)
    assert(out.map(_.getLong(0)).toSeq == (100L to 299L), "line band")
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    out.foreach { r =>
      val (wantId, wantText) = docs(r.getLong(0).toInt)
      assert(r.getLong(1) == wantId, s"id pixels at line ${r.getLong(0)}")
      val px = r.getString(2).split(',').map(_.toInt)
      val bytes = wantText.getBytes("UTF-8")
      assert(px.length == 636)
      px.zipWithIndex.foreach { case (p, j) =>
        val want = if (j < bytes.length) bytes(j) & 0xff else 0
        assert(p == want, s"pixel $j of line ${r.getLong(0)}")
      }
    }
    // pruning is real: the cutout's scan plans fewer partitions than
    // the full image under small partition sizing (exact [lo,hi] byte
    // clamp for plain images — the operator this key puts on the
    // driver-checked surface)
    val key = "spark.sql.files.maxPartitionBytes"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, (640 * 2 * 50).toString) // 50 lines/partition
    try {
      val img = spark.read.format("fits").option("hdu", 0)
        .load(Relational.fitsScratch(spark, sf001, "q35"))
      val full = img.rdd.getNumPartitions
      val cut = img.filter(col("ImgIndex").between(100L, 299L))
      val cutParts = cut.rdd.getNumPartitions
      assert(cutParts < full, s"cutout $cutParts !< full $full")
      assert(cut.queryExecution.executedPlan.toString
        .contains("lines=[100,299]"))
    } finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
    // canary semantics: on a replicated corpus only replica-0 ids feed
    // the reference image, so line->doc binding is scale-independent
    val dir = java.nio.file.Files.createTempDirectory("q35c").toString
    val canaryish = (0L until 150L).map(i => (i, s"doc $i")) ++
      (0L until 150L).map(i => (100000000L + i, s"replica doc $i"))
    canaryish.toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val c = Relational.q35_fits_cutout(spark, dir).collect()
    // 150 replica-0 docs -> lines 0..149; the band keeps [100,149]
    assert(c.map(_.getLong(1)).toSeq == (100L to 149L), "replica-0 only")
  }
}
