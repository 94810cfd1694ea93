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

  /** Session conf required to read TIMESTAMP(NANOS) parquet (`events`).
    * Set it at session construction (see [[withNanosAsLong]]) — setting
    * it as a side effect of one read would silently change how every
    * later parquet read in the session interprets nanos columns. */
  val NanosAsLongKey = "spark.sql.legacy.parquet.nanosAsLong"

  /** Builder helper: every session that loads `events` needs this. */
  def withNanosAsLong(b: SparkSession.Builder): SparkSession.Builder =
    b.config(NanosAsLongKey, "true")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read it as a raw long (session conf set at
    * construction) and convert to micro-precision TimestampType (floor
    * division — matches DuckDB's ns→µs truncation). Everything
    * downstream sees a normal timestamp.
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    require(spark.conf.get(NanosAsLongKey, "false") == "true",
      s"reading the events table requires $NanosAsLongKey=true at " +
        "session construction (Tables.withNanosAsLong)")
    import org.apache.spark.sql.functions._
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Registers every table as a temp view so both the DataFrame API and
    * `spark.sql` queries can reference them by bare name. Idempotent.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
