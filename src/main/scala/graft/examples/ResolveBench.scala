package graft.examples

import org.apache.spark.sql.SparkSession
import graft.Tables

/** Dev probe: cost of re-resolving base tables per query (r18 verdict
  * ask #9) — times N repeated spark.read.parquet + analysis rounds vs
  * reusing one resolved DataFrame.
  * Usage: runMain graft.examples.ResolveBench <sfDir> [reps]
  */
object ResolveBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 20
    val spark = Tables.sessionDefaults(SparkSession.builder())
      .master("local[8]").appName("resolve-bench")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm session
    spark.read.parquet(s"$dir/region.parquet").count()
    for (t <- Seq("lineitem", "orders", "events", "documents")) {
      val t0 = System.nanoTime()
      (1 to reps).foreach { _ =>
        val df = spark.read.parquet(s"$dir/$t.parquet")
        df.queryExecution.analyzed // force analysis
      }
      val dt = (System.nanoTime() - t0) / 1e6 / reps
      val t1 = System.nanoTime()
      val cached = spark.read.parquet(s"$dir/$t.parquet")
      (1 to reps).foreach { _ =>
        cached.select("*").queryExecution.analyzed
      }
      val dt2 = (System.nanoTime() - t1) / 1e6 / reps
      println(f"[resolve] $t%-10s fresh=${dt}%.1f ms/call reuse=${dt2}%.1f ms/call")
    }
    spark.stop()
  }
}
