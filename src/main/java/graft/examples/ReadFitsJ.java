package graft.examples;

import org.apache.spark.sql.Dataset;
import org.apache.spark.sql.Row;
import org.apache.spark.sql.SparkSession;

/**
 * Java demo entry point (reference parity: ReadFitsJ.java:37-51) — the
 * connector is plain DataSource V2, so the Java API needs nothing extra.
 *
 * Usage: runMain graft.examples.ReadFitsJ &lt;file.fits&gt; [hdu]
 */
public final class ReadFitsJ {
  public static void main(String[] args) {
    if (args.length < 1) {
      throw new IllegalArgumentException("usage: ReadFitsJ <file.fits> [hdu]");
    }
    String file = args[0];
    int hdu = args.length > 1 ? Integer.parseInt(args[1]) : 1;
    SparkSession spark = SparkSession.builder()
        .master(System.getenv().getOrDefault("SPARK_MASTER", "local[4]"))
        .appName("graft-read-fits-java")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate();
    spark.sparkContext().setLogLevel("WARN");
    try {
      Dataset<Row> df = spark.read().format("fits")
          .option("hdu", hdu).load(file);
      df.printSchema();
      df.show(5, false);
      System.out.println("rows: " + df.count());
    } finally {
      spark.stop();
    }
  }
}
