package graft.util

import org.apache.spark.sql.functions.col

import graft.{SparkTestBase, Tables}

/** Spread decisions off file-source metadata (r18 advice: the old
  * `df.rdd.getNumPartitions` probe forced a full physical plan per
  * call, and on a plan containing exchanges would eagerly execute
  * them under AQE at composition time). The decisions must match the
  * old probe's on every real call-site shape: tiny single-file scans
  * spread, big/multi-file scans don't, non-scan frames are left alone.
  */
class ParSpec extends SparkTestBase {

  test("tiny single-file scan spreads to defaultParallelism") {
    val docs = Tables.load(spark, sf0001, "documents")
    val est = Par.estimatedScanPartitions(docs)
    assert(est.exists(_ * 2 < spark.sparkContext.defaultParallelism), est)
    val spreadPlan = Par.spread(docs, col("doc_id"))
      .queryExecution.optimizedPlan.toString
    assert(spreadPlan.contains("RepartitionByExpression"), spreadPlan)
    // projection over the scan (the mediaDocs shape) spreads too
    val proj = docs.select(col("doc_id"), col("text"))
    assert(Par.estimatedScanPartitions(proj) == est)
  }

  test("a scan estimated at >= half the cores is returned unchanged") {
    // synthesize the decision boundary without a huge fixture: shrink
    // maxPartitionBytes so the same file estimates many splits
    val key = "spark.sql.files.maxPartitionBytes"
    val old = spark.conf.get(key)
    spark.conf.set(key, (16 * 1024).toString)
    try {
      val docs = Tables.load(spark, sf0001, "documents")
      val est = Par.estimatedScanPartitions(docs)
      assert(est.exists(_ * 2 >= spark.sparkContext.defaultParallelism), est)
      assert(Par.spread(docs, col("doc_id")) eq docs)
    } finally spark.conf.set(key, old)
  }

  test("non-file-source frames are never spread and never planned") {
    import spark.implicits._
    val mem = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    assert(Par.estimatedScanPartitions(mem).isEmpty)
    assert(Par.spread(mem, col("id")) eq mem)
    // a frame with an exchange in it must come back untouched — the
    // old probe would have executed that shuffle eagerly under AQE
    val agg = Tables.load(spark, sf0001, "documents")
      .groupBy(col("lang")).count()
    assert(Par.spread(agg, col("lang")) eq agg)
  }
}
