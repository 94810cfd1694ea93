#!/usr/bin/env python3
"""Row provenance and archive-extent queries from PySpark.

Demonstrates the graft FITS source's hidden metadata columns
(`_file_path`, `_hdu`, `_row_index`) and the metadata-answered
aggregates — both are plain DataSource V2 features, so no Python
bindings are needed beyond the jar.

Usage:
    sbt package
    spark-submit \
      --jars target/scala-2.13/sparkfitsspark_2.13-0.1.0.jar \
      examples/python/provenance.py /path/to/dir_or_glob.fits [--hdu 1]
"""
import argparse

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("path")
    parser.add_argument("--hdu", default="1")
    args = parser.parse_args()

    spark = SparkSession.builder.appName("fits-provenance").getOrCreate()
    df = spark.read.format("fits").option("hdu", args.hdu).load(args.path)

    # Archive extent without reading any data bytes: COUNT(*) and
    # MIN/MAX of the row index are answered from the FITS headers alone
    # (the plan shows a "metadata-only aggregate" scan).
    df.select(F.count(F.lit(1)).alias("rows"),
              F.max("_row_index").alias("max_row_index")).show()

    # Per-file row counts — the provenance join key at archive scale.
    # A result row's (_file_path, _row_index) identifies its source
    # exactly; rows N..M of any file can be re-read with a pushed
    # range: df.filter(F.col("_row_index").between(lo, hi)).
    (df.groupBy("_file_path", "_hdu")
       .agg(F.count(F.lit(1)).alias("rows"),
            F.max("_row_index").alias("last_index"))
       .orderBy("_file_path")
       .show(20, truncate=False))

    spark.stop()


if __name__ == "__main__":
    main()
