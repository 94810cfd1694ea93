package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DedupSpec extends SparkTestBase {

  test("exact dedup keeps every distinct text once") {
    val total = spark.read.parquet(s"$sf001/documents.parquet").count()
    val d = Dedup.dedup_exact(spark, sf001)
    assert(d.agg(sum("cnt")).collect().head.getLong(0) == total)
  }

  test("ngram exact Jaccard finds the planted near-dup pairs") {
    val pairs = Dedup.dedup_ngram(spark, sf001).collect()
    assert(pairs.length == 25, s"got ${pairs.length}")
    assert(pairs.forall(_.getDouble(2) >= 0.5))
  }

  test("minhash+LSH+verify reproduces the exact-Jaccard result") {
    val exact = Dedup.dedup_ngram(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val mh = Dedup.dedup_minhash(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(mh == exact)
  }

  test("simhash candidates + verify recover most planted pairs, no FPs") {
    val exact = Dedup.dedup_ngram(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = Dedup.dedup_simhash(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // verify step guarantees precision 1.0; recall is probabilistic
    assert(sh.subsetOf(exact))
    assert(sh.size >= (exact.size * 0.8).toInt,
      s"recall ${sh.size}/${exact.size}")
  }

  test("embedding near-dup at 0.95 is empty on this corpus (true negative)") {
    assert(Dedup.dedup_embed(spark, sf001).count() == 0L)
  }

  test("minhash signature agreement approximates Jaccard") {
    import graft.functions.VectorFunctions
    val sh = Dedup.shingleHashes(spark.read.parquet(s"$sf001/documents.parquet"))
    val mh = sh.groupBy(col("doc_id"))
      .agg(VectorFunctions.minhash_agg(col("h"), 64).as("mh"))
      .filter(col("doc_id").isin(285L, 301L, 0L))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def agree(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).count { case (x, y) => x == y } / 64.0
    // planted pair 285-301 has J≈0.989; doc 0 is unrelated
    assert(agree(mh(285L), mh(301L)) > 0.85)
    assert(agree(mh(285L), mh(0L)) < 0.3)
  }
}
