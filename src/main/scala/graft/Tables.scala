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

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read it as a raw long (legacy conf) and convert to
    * micro-precision TimestampType (floor division — matches DuckDB's
    * ns→µs truncation). Everything downstream sees a normal timestamp.
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
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
