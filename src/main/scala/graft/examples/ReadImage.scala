package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Demo entry point (reference parity: ReadImage.scala:34-47): reads an
  * image HDU, prints schema and per-line stats.
  *
  * Usage: runMain graft.examples.ReadImage <file.fits> [hdu]
  */
object ReadImage {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ReadImage <file.fits> [hduIndex]")
    val file = args(0)
    val hdu = if (args.length > 1) args(1).toInt else 1
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-read-image")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val df = spark.read.format("fits").option("hdu", hdu).load(file)
      df.printSchema()
      df.select(col("ImgIndex"), size(col("Image")).as("line_px"))
        .show(5, truncate = false)
      println(s"image lines: ${df.count()}")
    } finally spark.stop()
  }
}
