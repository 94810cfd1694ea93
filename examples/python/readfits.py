#!/usr/bin/env python3
"""Read FITS files from PySpark with the graft `fits` data source.

The connector is plain Spark DataSource V2, so Python needs no binding
beyond the jar on the classpath — `format("fits")` works from any
language Spark supports. (Parity with the reference's most-used entry
point, examples/python/readfits.py:73-76 of astrolabsoftware/spark-fits.)

Usage:
    sbt package
    spark-submit \
      --jars target/scala-2.13/sparkfitsspark_2.13-0.1.0.jar \
      examples/python/readfits.py /path/to/file_or_dir_or_glob.fits

Schema warts to know about (both pinned by compat tests):
  * TFORM `B` (unsigned 8-bit) maps to SIGNED ByteType — behavior
    compatibility with the reference (its FitsHdu.scala:214-217);
    values >127 wrap negative. Recover the unsigned value in Python
    with `F.col("b").cast("int") % 256` if you need it.
  * BITPIX=8 image HDUs decode as ByteType pixels (the reference puts
    them in a Boolean slot; we diverge to the sane type — documented).
"""
import argparse

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main():
    parser = argparse.ArgumentParser(
        description="Distribute the data of one or many FITS files.")
    parser.add_argument("inputpath",
                        help="file, directory, glob, or comma-list of FITS paths")
    parser.add_argument("--hdu", default="1",
                        help="HDU index to read (1 = first extension), "
                             "or an EXTNAME like 'EVENTS'")
    parser.add_argument("--write-out", default=None,
                        help="optional dir: write the first 100 rows back "
                             "out as FITS part files and read them again")
    args = parser.parse_args()

    spark = SparkSession.builder.appName("graft-readfits").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    # Bintable HDU -> ordinary DataFrame; schema inferred from the header.
    df = (spark.read.format("fits")
          .option("hdu", args.hdu)
          .load(args.inputpath))
    df.printSchema()
    df.show(5)

    # Column pruning and filters push into the scan (check .explain()):
    # only the selected columns' bytes are decoded.
    first = df.schema.fieldNames()[0]
    print("rows:", df.count())
    df.select(first).limit(5).show()

    # The `columns` option is the reference-compatible pruning alias:
    (spark.read.format("fits")
     .option("hdu", args.hdu)
     .option("columns", first)
     .load(args.inputpath)
     .show(5))

    # Image HDUs come back as one row per image line: (Image, ImgIndex).
    # (Uncomment for a file whose HDU 2 is an image.)
    # img = spark.read.format("fits").option("hdu", 2).load(args.inputpath)
    # img.select(F.size("Image").alias("row_px")).show(3)

    # Writing works too (beyond the reference): one part file per
    # partition, append/overwrite modes, read back via the dir union.
    # Ragged array columns become heap-backed var-length (1PT) columns
    # automatically, and a string column dominated by padding stores as
    # var-length 1PA — so a document corpus round-trips compactly.
    # An (Image, ImgIndex) frame writes back as a real IMAGE HDU with
    # .option("image", True). ASCII TABLE extensions (hdu type TABLE)
    # and variable-length P/Q bintable columns read transparently.
    if args.write_out:
        df.limit(100).write.format("fits").mode("overwrite").save(args.write_out)
        (spark.read.format("fits").option("hdu", 1)
         .load(args.write_out).show(3))

    spark.stop()


if __name__ == "__main__":
    main()
