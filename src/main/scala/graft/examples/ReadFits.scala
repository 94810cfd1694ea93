package graft.examples

import org.apache.spark.sql.SparkSession

/** Demo entry point (reference parity: ReadFits.scala:34-53): prints the
  * schema, first rows and count of each requested HDU of a FITS file.
  *
  * Usage: runMain graft.examples.ReadFits <file.fits> [hdu ...]
  */
object ReadFits {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ReadFits <file.fits> [hduIndex ...]")
    val file = args(0)
    val hdus = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-read-fits")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try hdus.foreach { h =>
      println(s"=== HDU $h of $file")
      val df = spark.read.format("fits").option("hdu", h).load(file)
      df.printSchema()
      df.show(5, truncate = false)
      println(s"rows: ${df.count()}")
    } finally spark.stop()
  }
}
