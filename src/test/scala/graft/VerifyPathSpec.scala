package graft


/** Drives `graft.Verify.runOne` — the exact per-query path the driver's
  * correctness harness takes (SparkEntry.queries lookup → parquet dump)
  * — on an engine-side fixture where the right answer is known and
  * NON-empty. The driver's own `dedup_embed` oracle is vacuous (0==0)
  * at the graded SFs because the synthetic corpora contain no
  * cos ≥ 0.95 pair; this closes that gap end-to-end, not only at the
  * operator-call level (DedupSpec). */
class VerifyPathSpec extends SparkTestBase {

  test("dedup_embed through the Verify harness recovers planted pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def unit(): Array[Float] = {
      val v = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val decoys = (0 until 200).map(i => (i.toLong, unit()))
    val planted = (0 until 5).flatMap { i =>
      val a = unit()
      val b0 = a.map(x => x + 0.02 * rnd.nextGaussian())
      val n = math.sqrt(b0.map(x => x * x).sum)
      Seq((1000L + i, a), (2000L + i, b0.map(x => (x / n).toFloat)))
    }
    val fixture = java.nio.file.Files.createTempDirectory("verify-embed")
      .toString
    (decoys ++ planted).toDF("vec_id", "embedding")
      .write.parquet(s"$fixture/embeddings.parquet")
    val out = java.nio.file.Files.createTempDirectory("verify-out").toString

    // the same call Verify.main makes for this key, fixture-substituted
    assert(Verify.runOne(spark, "dedup_embed", fixture, out).isEmpty,
      "Verify.runOne reported a failure")

    // read the dumped artifact exactly as the driver's comparator does
    val dumped = spark.read.parquet(s"$out/dedup_embed")
    val got = dumped.select("a_vid", "b_vid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (0 until 5).map(i => (1000L + i, 2000L + i)).toSet
    assert(got == want, s"planted-pair recovery via Verify path: $got")
    // the schema the driver hashes (column names, sorted)
    assert(dumped.columns.sorted.toSeq == Seq("a_vid", "b_vid"))
  }

  test("approxKeys is exactly the declared-without-oracle set") {
    // the contract Verify enforces fail-loud per run: every key with no
    // oracle is approximate BY DESIGN (and declared so), and no approx
    // key secretly has an oracle or names an unknown query
    assert(SparkEntry.approxKeys.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.approxKeys ==
      SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet,
      s"drift: ${(SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet)
        .diff(SparkEntry.approxKeys).toSeq.sorted}")
  }

  test("a failing query surfaces through runOne instead of throwing") {
    val out = java.nio.file.Files.createTempDirectory("verify-bad").toString
    // nonexistent sf dir → the query fails; runOne reports name + error
    // message (the message feeds the errors.json manifest), not throws
    val failed = Verify.runOne(spark, "dedup_exact", "/nonexistent-sf", out)
    assert(failed.map(_._1) == Some("dedup_exact"))
    assert(failed.exists(_._2.nonEmpty), "error message should be captured")
  }
}
