package graft.examples

import org.apache.spark.sql.SparkSession

/** fpack-style utility entry point: rewrite an image HDU as a
  * tile-compressed (ZIMAGE) file, or decompress one back to a plain
  * image — the full compression surface (codec, 2-D tiles, lossy float
  * quantization with optional subtractive dither, HCOMPRESS scale)
  * driven from one command line. The reference ships no counterpart
  * (its reader handles plain HDUs only); this mirrors the public
  * fpack/funpack workflow on top of the connector's writer options.
  *
  * Usage:
  *   runMain graft.examples.PackImage <in> <outDir> [codec] [WxH] [q] [dither] [hscale] [smooth]
  *     codec  RICE_1 | GZIP_1 | GZIP_2 | HCOMPRESS_1 | NOCOMPRESS | NONE
  *            (NONE = unpack: write a plain image)
  *     WxH    2-D tile size (default: codec default)
  *     q      float quantization sigma divisor (lossy; integers: omit)
  *     dither 1 | 2 (with q): subtractive dither variant
  *     hscale HCOMPRESS digitization scale (lossy; 0 = lossless)
  *     smooth 1 (with hscale > 1): record SMOOTH=1 — readers apply the
  *            smoothed reconstruction (fpack's -s)
  */
object PackImage {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: PackImage <in.fits> <outDir> [codec] [WxH] [q] [dither] [hscale]")
    val (in, outDir) = (args(0), args(1))
    val codec = if (args.length > 2) args(2).toUpperCase else "RICE_1"
    // reuse a live session (PackImageSpec drives main() in-process);
    // only a session WE create gets stopped on exit
    val preexisting = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession).isDefined
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-pack-image")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // hdu 0 = plain image primary; a ZIMAGE file has an EMPTY primary
      // and its compressed image at hdu 1 — pick whichever decodes
      def loadHdu(i: Int) =
        try Some(spark.read.format("fits").option("hdu", i).load(in))
          .filter(_.columns.contains("Image"))
        catch { case _: Exception => None }
      val df = loadHdu(0).orElse(loadHdu(1)).getOrElse(
        throw new IllegalArgumentException(
          s"$in holds no decodable image HDU"))
      var w = df.coalesce(1).write.format("fits").option("image", true)
      if (codec != "NONE") w = w.option("compress", codec)
      if (args.length > 3 && args(3).nonEmpty) w = w.option("compressTile", args(3))
      if (args.length > 4 && args(4).toDouble > 0) w = w.option("quantize", args(4))
      if (args.length > 5 && args(5).toInt > 0) w = w.option("dither", args(5))
      if (args.length > 6 && args(6).toInt > 0) w = w.option("hcompScale", args(6))
      if (args.length > 7 && args(7).toInt > 0) w = w.option("hcompSmooth", true)
      w.mode("append").save(outDir)
      val outBytes = new java.io.File(outDir).listFiles()
        .filter(_.getName.endsWith(".fits")).map(_.length()).sum
      println(s"packed ${df.count()} lines -> $outDir " +
        s"($codec, $outBytes bytes)")
    } finally if (!preexisting) spark.stop()
  }
}
