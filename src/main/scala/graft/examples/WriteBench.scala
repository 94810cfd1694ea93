package graft.examples

import org.apache.spark.sql.SparkSession

/** Isolated FITS writer throughput probe — the same corpus and write
  * as Bench's varlen probe, without 68 queries of ambient JIT/GC noise
  * in front of it. Prints per-rep seconds and MB/s so writer changes
  * can be judged against a stable number.
  *
  * Usage: runMain graft.examples.WriteBench [reps]
  */
object WriteBench {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 5
    val spark = SparkSession.builder()
      .appName("graft-write-bench").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, length, sum}
    val dir = "target/fits-write-bench"
    val docs = spark.range(2000000).map { i =>
      val r = new scala.util.Random(i)
      val words = if (i % 997 == 0) 800 else 20 + (i % 40).toInt
      (i, Seq.fill(words)(s"w${r.nextInt(5000)}").mkString(" "))
    }.toDF("id", "text").coalesce(4)
    docs.persist()
    docs.count()
    val bytes = docs.agg(sum(length(col("text")))).collect().head.getLong(0)
    val mb = bytes.toDouble / (1 << 20)
    println(f"[writebench] corpus: $mb%.1f MB text, 2M rows, 4 tasks")
    val times = (1 to reps).map { r =>
      val t0 = System.nanoTime()
      docs.write.format("fits").mode("overwrite").save(dir)
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[writebench] rep $r: $s%.3f s  ${mb / s}%.1f MB/s")
      s
    }
    docs.unpersist()
    println(f"[writebench] best: ${mb / times.min}%.1f MB/s  " +
      f"median: ${mb / times.sorted.apply(times.length / 2)}%.1f MB/s")
    spark.stop()
  }
}
