package graft.examples

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

import graft.{SparkEntry, Tables}

/** Dumps `.explain("formatted")` for declared queries to files — the
  * optimization-round evidence artifact (plans/r18/<key>_{before,after}
  * .txt). Batch keys dump the plan WITHOUT executing; streaming keys
  * (stream_*) execute as a side effect of building their result table,
  * so they are skipped unless explicitly named (their "plan" is the
  * memory-sink scan, which carries no optimization signal anyway).
  *
  * Usage: runMain graft.examples.PlanDump <sfDir> <outDir> <suffix> [keys]
  *   keys: comma-separated; default = all non-streaming declared keys.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val only: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(',').map(_.trim).toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.sessionDefaults(SparkSession.builder())
      .master(s"local[$cpus]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val keys = SparkEntry.queries.keys.toSeq.sorted
      .filter(k => only.forall(_.contains(k)))
      .filter(k => only.isDefined || !k.startsWith("stream_"))
    keys.foreach { k =>
      try {
        val df = SparkEntry.queries(k)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          ExplainMode.fromString("formatted"))
        Files.write(Paths.get(outDir, s"${k}_$suffix.txt"),
          plan.getBytes(StandardCharsets.UTF_8))
        println(s"[plandump] $k -> $outDir/${k}_$suffix.txt")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $k FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
