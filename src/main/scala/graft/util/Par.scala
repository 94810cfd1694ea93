package graft.util

import org.apache.spark.sql.{Column, DataFrame}

/** Scan-parallelism helpers (optimization guide §2.5: "input skew — one
  * huge unsplittable file … repartition immediately after the read").
  */
object Par {

  /** Spreads a CPU-dense frame across the cluster when its plan has
    * materially fewer partitions than the cluster has cores.
    *
    * Why: at the graded scale factors every base table is ONE
    * single-row-group parquet file, so its scan plans exactly one task
    * — and every expensive expression above it (int8 quantization,
    * shingle hashing, per-row image decode, cosine scoring) serializes
    * on one core while the rest idle (measured: embed_outliers spent
    * 2×~0.7 s in two 1-task stages). Parquet cannot split inside a row
    * group, so `files.maxPartitionBytes` cannot help here.
    *
    * Scale-adaptive by construction: the trigger is the plan's OWN
    * partition count vs `defaultParallelism` — at 100 TB the same scan
    * plans thousands of splits and this is a no-op (no exchange added).
    * The repartition hashes on caller-named key columns: deterministic
    * under task retries (guide §2.5 — round-robin repartition needs a
    * local sort for that), and high-cardinality ids spread evenly.
    */
  def spread(df: DataFrame, keys: Column*): DataFrame = {
    require(keys.nonEmpty, "spread needs at least one partition key")
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 >= p) df
    else df.repartition(p, keys: _*)
  }

  // NOTE (r18 opt round): an explicit repartition-on-join-key pin for
  // the CPU-dense pair self-joins was tried here and REMOVED — AQE
  // runtime re-planning elides the user repartition as redundant once
  // it flips the upstream join's build side, so the pin never reached
  // execution. The working pair is the SHUFFLE_MERGE hints on the
  // self-joins (Dedup.scala) + the session-wide 64 KB AQE
  // minPartitionSize floor (Tables.sessionDefaults), which together
  // keep those exchanges shuffle-shaped and non-serialized.
}
