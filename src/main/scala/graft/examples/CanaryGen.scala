package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Scale-canary corpus generator: replicates a TESTDATA scale-factor
  * dir N× into `out`, keeping every within-replica relationship intact
  * while making replicas mutually unrelated — so each declared query's
  * cost and output scale ~linearly and a canary run can assert
  * "no query > N× its base time" without re-deriving oracles.
  *
  *   - Join keys shift by `replica × 100M` consistently across tables
  *     (orders.o_custkey moves with customer.c_custkey, etc.), so join
  *     selectivity per replica is exactly the base corpus's.
  *   - `documents.text` goes through a per-replica letter bijection
  *     (translate with a rotated alphabet subset): word-level n-gram
  *     structure inside a replica is EXACTLY preserved (bijections
  *     preserve equality), while cross-replica shingle overlap drops
  *     to ~zero — without this, every doc would be a near-dup of its 9
  *     siblings and dedup outputs would grow quadratically, not N×.
  *   - `embeddings.embedding` rotates by `replica` positions: norms and
  *     within-replica cosines are exactly preserved, cross-replica
  *     cosine of high-dim Gaussians ≈ 0 (same reasoning as above for
  *     the cos ≥ 0.95 near-dup threshold).
  *   - `region`/`nation` are dimensions and copy through unchanged.
  *   - Sky positions are NOT mutated, so replicas overlay the same sky
  *     and cross-match output grows ~quadratically in reps (99× rows at
  *     10×). That is the answer, not a plan defect — canary_check's
  *     output-growth allowance covers it, but its ratio_max² cap means
  *     crossmatch saturates the gate near reps ≈ ratio_max²/(pairs per
  *     position); past that, give replicas disjoint declination bands.
  *   - `events.ts` is copied in its source layout (read with a bare
  *     spark.read, no unit normalization) so the canary dir
  *     round-trips through the unit-adaptive Tables.loadEvents exactly
  *     like the originals — nanos-long sources replicate as longs, µs
  *     TIMESTAMP sources as TimestampNTZ (Spark writes MICROS back).
  *
  * Usage: runMain graft.examples.CanaryGen <srcSfDir> <outDir> [reps]
  */
object CanaryGen {
  private val Off = 100000000L // key offset per replica

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val reps = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.sessionDefaults(SparkSession.builder())
      .master(s"local[$cpus]")
      .appName("graft-canary-gen")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, src, out, reps)
    spark.stop()
  }

  def generate(spark: SparkSession, src: String, out: String,
      reps: Int): Unit = {
    def raw(t: String): DataFrame =
      spark.read.parquet(s"$src/$t.parquet")
    // Write each replicated table as ~one part file per replica
    // (capped at 64), mirroring how an N×-bigger corpus actually
    // arrives — N batches of files — instead of inheriting the base
    // corpus's partition count (usually ONE file). A single-file 100×
    // table caps every map-only key's scan stage at one task no matter
    // the cores (parquet only splits files ABOVE maxPartitionBytes, so
    // small-but-CPU-hot tables like documents/embeddings never split),
    // and the canary then measures file-layout serialization instead
    // of the plan's scaling — r15 found the 83 MB single-file
    // documents table putting a 640 MB FITS encode on one task.
    def save(t: String, df: DataFrame, parts: Int = math.min(64, reps)): Unit =
      df.repartition(parts)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")

    // replica axis as a tiny broadcast cross join; key shifts keep the
    // per-replica join graph identical to the base corpus's
    val repDf = broadcast(
      spark.range(reps).select(col("id").cast("long").as("rep")))
    def replicated(t: String, keyCols: Seq[String],
        mutate: DataFrame => DataFrame = identity): DataFrame = {
      val r = raw(t).crossJoin(repDf)
      val shifted = keyCols.foldLeft(r)((d, k) =>
        d.withColumn(k, col(k) + col("rep") * Off))
      mutate(shifted).drop("rep")
    }

    // dimensions copy through unreplicated — one part, any scale
    save("region", raw("region"), parts = 1)
    save("nation", raw("nation"), parts = 1)
    save("customer", replicated("customer", Seq("c_custkey")))
    save("supplier", replicated("supplier", Seq("s_suppkey")))
    save("part", replicated("part", Seq("p_partkey")))
    save("orders", replicated("orders", Seq("o_orderkey", "o_custkey")))
    save("lineitem", replicated("lineitem",
      Seq("l_orderkey", "l_partkey", "l_suppkey")))
    save("events", replicated("events", Seq("event_id", "user_id")))

    // per-replica letter bijection: two composed translates over
    // DISJOINT subsets (11 × 10 rotations = 110 distinct bijections).
    // Rotation is modular, so a single 9-letter set with 10 replicas
    // would make replica 9 the identity again — 5000 surprise
    // exact-duplicate pairs across replicas. rep 0 is the identity
    // for both, so the base corpus is replica 0 verbatim.
    val l1 = "aeiosrtnlcp" // 11 rotations
    val l2 = "bdfghkmuvw" // 10 rotations, disjoint from l1
    require(reps <= l1.length * l2.length,
      s"letter rotations support <= ${l1.length * l2.length} replicas")
    def rot(s: String, k: Int): String = s.drop(k) + s.take(k)
    val mapExpr = (0 until reps).map { k =>
      val t1 = rot(l1, k % l1.length)
      val t2 = rot(l2, (k / l1.length) % l2.length)
      s"WHEN rep = $k THEN translate(translate(text, '$l1', '$t1'), '$l2', '$t2')"
    }.mkString("CASE ", " ", " ELSE text END")
    save("documents", replicated("documents", Seq("doc_id"),
      _.withColumn("text", expr(mapExpr))))

    // rotate the vector by `rep % dim` positions, negating once the
    // rotations wrap (dim × 2 distinct isometries): exact within-replica
    // geometry, ~orthogonal across replicas (iid-Gaussian autocorrelation
    // at nonzero lag ≈ 0; negation flips cosine sign, still < 0.95)
    val dim = raw("embeddings").selectExpr("size(embedding)").head.getInt(0)
    require(reps <= 2 * dim, s"embedding isometries support <= ${2 * dim}")
    save("embeddings", replicated("embeddings", Seq("vec_id"),
      _.withColumn("embedding", expr(
        s"concat(slice(embedding, cast(rep % $dim + 1 AS INT), size(embedding) - cast(rep % $dim AS INT)), " +
          s"slice(embedding, 1, cast(rep % $dim AS INT)))"))
        .withColumn("embedding", expr(
          s"IF(rep >= $dim, transform(embedding, x -> -x), embedding)"))))
  }
}
