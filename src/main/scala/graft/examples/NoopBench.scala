package graft.examples
import org.apache.spark.sql.SparkSession
object NoopBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-noop-bench").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, length, sum}
    val docs = spark.range(500000).map { i =>
      val r = new scala.util.Random(i)
      val words = if (i % 997 == 0) 800 else 20 + (i % 40).toInt
      (i, Seq.fill(words)(s"w${r.nextInt(5000)}").mkString(" "))
    }.toDF("id", "text").coalesce(4)
    docs.persist(); docs.count()
    val bytes = docs.agg(sum(length(col("text")))).collect().head.getLong(0)
    val mb = bytes.toDouble / (1 << 20)
    (1 to 6).foreach { r =>
      val t0 = System.nanoTime()
      docs.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[noopbench] rep $r: $s%.3f s  ${mb / s}%.1f MB/s")
    }
    spark.stop()
  }
}
