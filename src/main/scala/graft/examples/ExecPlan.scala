package graft.examples

import org.apache.spark.sql.SparkSession

import graft.{SparkEntry, Tables}

/** Executes one declared query and prints the AQE FINAL plan — the
  * static plan (PlanDump) hides runtime join-strategy conversions.
  * Dev tool for the optimization rounds.
  * Usage: runMain graft.examples.ExecPlan <sfDir> <key>
  */
object ExecPlan {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.sessionDefaults(SparkSession.builder())
      .master(s"local[$cpus]")
      .appName("graft-execplan")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(args(1))(spark, args(0))
    df.collect()
    println("=== FINAL EXECUTED PLAN ===")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
