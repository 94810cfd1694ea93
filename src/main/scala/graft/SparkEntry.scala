package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full declared operator surface (SURVEY §2): the
  * relational layer the reference delegates to Spark (Q01–Q21), plus the
  * large-scale pipeline extensions (dedup, similarity, text analysis).
  * Each key with an `oracleSql` entry is hash-checked against DuckDB by
  * the driver at sf0.01; keys without one get a rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Multi-way join + broadcast + exact decimal aggregation (SURVEY B7).
    */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q07_join(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++ operators.TextOps.queries ++
      operators.Dedup.queries ++ operators.Similarity.queries ++
      operators.Multimodal.queries ++ operators.Streaming.queries ++
      operators.CrossMatch.queries ++ operators.Sampling.queries

  /** Queries whose cost is partially backed by a session-lifetime memo
    * (localCheckpoint-pinned intermediates shared across queries).
    * Declared HERE, next to the query registry, so the bench derives
    * its between-reps eviction set from operator metadata instead of a
    * hardcoded name list that silently drifts on a rename — Bench
    * asserts this is a subset of `queries.keySet`. */
  def memoBackedQueries: Set[String] =
    operators.Dedup.memoBacked ++ operators.TextOps.memoBacked

  /** The memo-backed keys that additionally ride the survivor-labeling
    * (CC) memo; the bench only pays that build when one is in the run. */
  def ccBackedQueries: Set[String] =
    operators.Dedup.ccBacked ++ operators.TextOps.ccBacked

  /** Undeclared diagnostic dumps: run and materialized by Verify next
    * to the declared dumps (as `<base-key>_diag`), never hash-checked —
    * they exist so a red declared row carries its own diagnosis in the
    * artifact (r15: a canary recall breach reported only "missing=1").
    * Key convention: `<declared-key>_diag`; Verify uses the prefix to
    * scope subset runs. */
  def diagnostics: Map[String, (SparkSession, String) => DataFrame] =
    operators.Similarity.diagnostics

  /** Declared keys that are approximate/non-SQL BY DESIGN (r16 verdict
    * ask #3): a rows-only check is their CONTRACT — each is paired with
    * an exact, hash-oracled twin (planted/recall/threshold gates) that
    * turns red if the underlying operator breaks. Verify writes this
    * set as `approx_keys.json` next to `oracle_sql.json`, so artifact
    * readers can report "rows-only-by-design" instead of an error.
    * Invariant (spec-gated): approxKeys ⊆ queries.keySet and disjoint
    * from oracleSql.keySet. */
  def approxKeys: Set[String] =
    operators.Relational.approxKeys ++ operators.TextOps.approxKeys ++
      operators.Similarity.approxKeys

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracles ++ operators.TextOps.oracles ++
      operators.Dedup.oracles ++ operators.Similarity.oracles ++
      operators.Multimodal.oracles ++ operators.Streaming.oracles ++
      operators.CrossMatch.oracles ++ operators.Sampling.oracles
}
