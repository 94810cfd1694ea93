package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions

/** Deterministic corpus sampling (north-star pipeline extension): the
  * train/val-split and per-stratum-downsampling primitive every
  * training-data pipeline needs.
  *
  * Exact stratified sample: the k smallest documents per stratum under
  * a deterministic per-row score — reproducible across runs, engines
  * and partitionings (no RNG state, no sample() nondeterminism), and
  * exactly DuckDB-oracle-checkable for the same reason.
  *
  * Score: Park–Miller residue h = (doc_id · 48271) mod (2³¹ − 1) — a
  * full-period multiplicative scramble that is pure integer SQL on both
  * engines and uncorrelated with doc_id order, so "k smallest h" is a
  * uniform without-replacement draw per stratum. Both engines compute
  * it as ((doc_id mod M) · 48271) mod M — identical by modular
  * arithmetic, and the inner reduction bounds the product at
  * (M−1)·48271 < 2⁵⁷, so the expression is exact for EVERY non-negative
  * BIGINT doc_id (the naive doc_id·48271 silently wraps in Spark's
  * non-ANSI Long arithmetic above doc_id ≈ 1.9·10¹⁴ while DuckDB errors
  * loudly — the engines would diverge exactly where a 100 TB corpus
  * id space lives).
  *
  * Scale shape: TopKAgg keeps a k-heap per (task, stratum) map-side, so
  * the only shuffle carries tasks × strata × k rows — no Window funnel
  * (`row_number() OVER (PARTITION BY lang)` would pull every row of a
  * 100 TB corpus through |strata| reducers), no global sort. Ordering
  * ties break on doc_id asc, identical to the oracle's ORDER BY.
  */
object Sampling {

  type Q = (SparkSession, String) => DataFrame

  private val K = 20
  // Park–Miller modulus/multiplier (public-domain MINSTD constants)
  private val Mult = 48271L
  private val Mod = 2147483647L

  /** k=20 docs per language, smallest Park–Miller residue first. */
  val pipeline_sample: Q = (s, dir) => {
    val d = Tables.load(s, dir, "documents")
      .select(col("lang"), col("doc_id"),
        (col("doc_id") % Mod * Mult % Mod).as("h"))
    // TopKAgg ranks by (score DESC, id ASC); negate the residue so the
    // heap keeps the k SMALLEST h. h < 2³¹ is exact in a Double.
    d.groupBy(col("lang"))
      .agg(VectorFunctions.topk_agg(-col("h").cast("double"), col("doc_id"), K)
        .as("tk"))
      .select(col("lang"), posexplode(col("tk")))
      .select(col("lang"), (col("pos") + 1).as("rnk"),
        col("col.neighbor_id").as("doc_id"))
      .orderBy(col("lang"), col("rnk"))
  }

  /** Domain-mixture resampling — the data-recipe step that reweights
    * corpus domains before training (e.g. keep all zh, half of en, a
    * quarter of everything else): a deterministic per-stratum Bernoulli
    * draw, keep iff residue h < floor(rate · M). Rates come from
    * `spark.graft.mix.rates` ("en:0.5,zh:1.0,default:0.25"); the
    * declared defaults match the oracle's hardcoded thresholds the same
    * way pipeline_sample hardcodes k.
    *
    * Scale shape: pure per-row filter over integer arithmetic — no
    * shuffle, no RNG state, reproducible across engines, runs and
    * partitionings; thresholds are precomputed Longs so the comparison
    * is exact (no float boundary drift between engines). */
  val pipeline_mix: Q = (s, dir) => {
    val spec = s.conf.getOption("spark.graft.mix.rates")
      .getOrElse("en:0.5,zh:1.0,default:0.25")
    val rates = spec.split(",").map(_.split(":"))
      .map(a => a(0).trim -> a(1).trim.toDouble).toMap
    require(rates.values.forall(r => r >= 0 && r <= 1), s"rates in [0,1]: $spec")
    val defaultThr = (rates.getOrElse("default", 1.0) * Mod).toLong
    // TWO Park–Miller steps, not one: pipeline_sample only needs a
    // relative ORDER scramble, but a Bernoulli threshold needs h
    // spread over the full [0, M) range — one step maps small ids to
    // h = id·48271, which sits below every realistic threshold (an
    // sf0.01 corpus kept 100% of rows at rate 0.25). The second step
    // wraps the product past M; each is exact in a Long.
    val h = col("doc_id") % Mod * Mult % Mod * Mult % Mod
    val thr = (rates - "default").toSeq.sortBy(_._1)
      .foldLeft(lit(defaultThr)) { case (acc, (l, r)) =>
        when(col("lang") === l, lit((r * Mod).toLong)).otherwise(acc)
      }
    Tables.load(s, dir, "documents")
      .filter(h < thr)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, Q] = Map(
    "pipeline_sample" -> pipeline_sample,
    "pipeline_mix" -> pipeline_mix)

  val oracles: Map[String, String] = Map(
    "pipeline_sample" ->
      s"""SELECT lang, CAST(rn AS INT) AS rnk, doc_id FROM (
         |  SELECT lang, doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY lang
         |      ORDER BY ((doc_id % $Mod) * $Mult) % $Mod, doc_id) AS rn
         |  FROM documents)
         |WHERE rn <= $K
         |ORDER BY lang, rnk""".stripMargin,
    // thresholds = floor(rate * M) for the declared default rates
    // (en 0.5, zh 1.0, default 0.25), precomputed so both engines
    // compare integers
    "pipeline_mix" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE ((((doc_id % $Mod) * $Mult) % $Mod) * $Mult) % $Mod <
         |  CASE lang WHEN 'en' THEN 1073741823
         |            WHEN 'zh' THEN 2147483647
         |            ELSE 536870911 END
         |ORDER BY doc_id""".stripMargin,
  )
}
