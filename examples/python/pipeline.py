#!/usr/bin/env python3
"""An LLM training-data pipeline from PySpark, on the graft engine.

Everything here is the plain DataFrame/SQL API plus graft's native
Catalyst expressions — no Python UDFs anywhere, so the whole pipeline
stays inside whole-stage codegen and scales exactly like the Scala
surface (the expressions are the same JVM code paths the driver-graded
query keys use).

Usage:
    sbt package
    spark-submit \
      --jars target/scala-2.13/sparkfitsspark_2.13-0.1.0.jar \
      --conf spark.sql.extensions=graft.plans.GraftExtensions \
      examples/python/pipeline.py /root/testdata/sf0.001

The `spark.sql.extensions` conf registers the SQL function surface
(lang_id, simhash64, word_shingle_hashes, minhash_agg, cosine_sim, ...)
and the ApproxCosineJoin planner strategy — one conf, full parity with
Scala. A SQL-only deployment (spark-sql, Thrift server) works the same
way.
"""
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(sf_dir):
    spark = (SparkSession.builder.appName("graft-pipeline")
             .config("spark.sql.shuffle.partitions", "32")
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # ---- 1. language ID + quality scoring (one codegen'd pass) ------
    scored = docs.select(
        "doc_id", "text",
        F.expr("lang_id(text)").alias("lang"),
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"),
    ).withColumn(
        "quality_ok",
        (F.col("n_tokens") >= 5) & (F.length("text") >= 30))
    scored.groupBy("lang").count().orderBy("lang").show()

    # ---- 2. exact dedup (hash-groupBy, min doc_id survives) ---------
    survivors = (scored
                 .withColumn("h", F.xxhash64("text"))
                 .groupBy("h").agg(F.min("doc_id").alias("doc_id")))
    print("exact-dedup survivors:", survivors.count(), "/", docs.count())

    # ---- 3. near-dup candidates via shingle MinHash bands -----------
    # word_shingle_hashes = native one-pass 3-word shingle hasher;
    # minhash_agg = native MinHash sketch aggregate (128 hashes).
    # Banding the signature turns near-dup detection into an equi-join:
    # no all-pairs anywhere, the same shape the Scala operator uses.
    sigs = (scored.select("doc_id",
                          F.explode(F.expr("word_shingle_hashes(text, 3)"))
                           .alias("sh"))
            .groupBy("doc_id")
            .agg(F.expr("minhash_agg(sh, 128)").alias("sig")))
    bands = sigs.select(
        "doc_id",
        F.posexplode(F.expr(
            "transform(sequence(0, 15), b -> "
            "xxhash64(slice(sig, b * 8 + 1, 8), b))")).alias("band", "bv"))
    cands = (bands.alias("a").join(bands.alias("b"), ["band", "bv"])
             .where(F.col("a.doc_id") < F.col("b.doc_id"))
             .select(F.col("a.doc_id").alias("a_id"),
                     F.col("b.doc_id").alias("b_id"))
             .distinct())
    print("minhash band candidate pairs:", cands.count())

    # ---- 4. simhash fingerprints (64-bit, hamming-joinable) ---------
    scored.select("doc_id", F.expr("simhash64(text)").alias("sh64")) \
        .show(5)

    # ---- 5. embedding similarity: brute-force cosine top-k ----------
    # Queries broadcast; the corpus never shuffles. cosine_sim is the
    # native codegen'd expression (NaN for zero-norm by contract), and
    # topk_agg is the k-heap TypedImperativeAggregate — a partial
    # (map-side) top-k per task, NOT a row_number() window funnel that
    # would drag every scored row through |queries| reducer tasks.
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = embs.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q"))
    topk = (embs.crossJoin(F.broadcast(queries))
            .where(F.col("vec_id") != F.col("q_id"))
            .select("q_id", F.col("vec_id").alias("neighbor_id"),
                    F.expr("cosine_sim(embedding, q)").alias("cos"))
            .where(~F.isnan("cos"))
            .groupBy("q_id")
            .agg(F.expr("topk_agg(cos, neighbor_id, 5)").alias("tk"))
            .select("q_id", F.posexplode("tk"))
            .select("q_id", (F.col("pos") + 1).alias("rnk"),
                    F.col("col.neighbor_id").alias("neighbor_id"),
                    F.col("col.sim").alias("cos")))
    topk.orderBy("q_id", "rnk").show()

    # ---- 6. round-trip the cleaned corpus through FITS --------------
    # (the engine's own columnar source/sink; strings become var-length
    # heap columns automatically when padding would dominate)
    out = "/tmp/graft-pipeline-fits"
    (scored.where("quality_ok")
     .select("doc_id", "lang", "n_tokens", "text")
     .write.format("fits").mode("overwrite").save(out))
    back = spark.read.format("fits").option("hdu", 1).load(out)
    print("FITS round-trip rows:", back.count())
    back.select("doc_id", "lang", "n_tokens").show(3)

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
