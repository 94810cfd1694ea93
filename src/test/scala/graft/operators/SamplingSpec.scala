package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

class SamplingSpec extends SparkTestBase {

  test("stratified sample equals the window-ranked brute force") {
    val got = Sampling.pipeline_sample(spark, sf001).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("doc_id") * 48271L % 2147483647L, col("doc_id"))
    val want = Tables.load(spark, sf001, "documents")
      .select(col("lang"), col("doc_id"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 20)
      .orderBy(col("lang"), col("rnk"))
      .collect()
      .map(r => (r.getString(0), r.getInt(2), r.getLong(1)))
    assert(got.length == want.length && got.nonEmpty)
    assert(got.sameElements(want))
  }

  test("sample is invariant under repartitioning (deterministic draw)") {
    import spark.implicits._
    // 'xx' has only 7 docs — fewer than k: the stratum must surface ALL
    // of them with contiguous ranks, not pad or truncate the short heap
    val docs = (0 until 997).map(i =>
      (i.toLong * 13 + 5, s"text $i",
        if (i < 7) "xx" else if (i % 3 == 0) "en" else "de",
        "src", 6L))
    val dir = java.nio.file.Files.createTempDirectory("sample-det").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(7).write.parquet(s"$dir/documents.parquet")
    val a = Sampling.pipeline_sample(spark, dir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val b = Sampling.pipeline_sample(spark, dir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(a.sameElements(b))
    // every stratum contributes exactly min(k, stratum size) rows
    val perLang = a.groupBy(_._1)
    assert(perLang("en").length == 20 && perLang("de").length == 20)
    assert(perLang("xx").length == 7, "under-k stratum keeps all its docs")
    assert(perLang("xx").map(_._2).sorted.sameElements(1 to 7),
      "under-k stratum ranks are contiguous from 1")
  }

  test("draw is exact past the naive Long-overflow bound (doc_id > 1.9e14)") {
    import spark.implicits._
    // naive doc_id * 48271 wraps a signed Long above ~1.9e14; the
    // decomposed (doc_id % M) * 48271 % M must equal the BigInt truth
    // for ids in a realistic 100 TB id space
    val ids = Seq(0L, 190000000000000L, Long.MaxValue / 48271L + 17L,
      Long.MaxValue - 1, 998877665544332211L)
    val docs = ids.map(i => (i, "t", "en", "src", 1L))
    val dir = java.nio.file.Files.createTempDirectory("sample-ovf").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Sampling.pipeline_sample(spark, dir)
      .collect().map(r => r.getLong(2)).toSet
    assert(got == ids.toSet, "every row sampled (k > n)")
    // the ORDER the heap produced must match exact modular arithmetic
    val gotOrder = Sampling.pipeline_sample(spark, dir)
      .collect().map(r => r.getLong(2)).toSeq
    val wantOrder = ids.sortBy(i =>
      ((BigInt(i) * 48271) mod BigInt(2147483647)).toLong -> i)
    assert(gotOrder == wantOrder, s"draw order: $gotOrder vs $wantOrder")
  }

  test("mix: per-stratum keep rates honored, zh kept whole, draw deterministic") {
    val d = Tables.load(spark, sf001, "documents")
    val totals = d.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Sampling.pipeline_mix(spark, sf001)
    val keptBy = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // rate 1.0 keeps every row; thresholds are exact, not approximate
    assert(keptBy("zh") == totals("zh"))
    // Bernoulli(0.5 / 0.25) on a uniform residue: generous 3-sigma bands
    def inBand(lang: String, rate: Double): Unit = {
      val n = totals(lang).toDouble
      val sd = math.sqrt(n * rate * (1 - rate))
      assert(math.abs(keptBy(lang) - n * rate) <= 3 * sd + 1,
        s"$lang kept=${keptBy(lang)} of $n at rate $rate")
    }
    inBand("en", 0.5); inBand("de", 0.25); inBand("fr", 0.25)
    // deterministic: a second run returns the identical id set
    val a = kept.collect().map(_.getLong(0))
    val b = Sampling.pipeline_mix(spark, sf001).collect().map(_.getLong(0))
    assert(a.sameElements(b))
    // no shuffle: per-row filter only (dump sort aside)
    kept.collect()
    val plan = kept.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate") && !plan.contains("Window"), plan)
  }

  test("no Window funnel: the plan aggregates, it does not rank globally") {
    val plan = Sampling.pipeline_sample(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window funnel in plan:\n$plan")
    assert(plan.contains("topk_agg"))
  }
}
