package graft.sources.fits

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Multi-HDU load (r17 verdict ask #7): `hdu` accepts a comma list of
  * indices/EXTNAMEs or `all`, and the scan plans per-HDU partitions
  * whose union is exact, with the provenance `_hdu` column telling the
  * extensions apart. Real MEF archives store N same-schema bintables
  * per file; the reference forces one load() per HDU
  * (FitsSourceRelation.scala:114-120). */
class FitsMultiHduSpec extends SparkTestBase {
  import FitsWriteSupport.{card, headerBlock, pad, quoted}

  /** Hand-built MEF: empty primary + one 1-column (`id` = 1K) bintable
    * per entry of `hduRows`, each with EXTNAME SCI<n> and rows
    * base..base+n-1. An optional different-schema HDU (2 columns)
    * appends at the end. */
  private def writeMef(dir: String, hduRows: Seq[(Long, Int)],
      mismatched: Boolean = false): String = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(headerBlock(Seq(card("SIMPLE", "T"), card("BITPIX", "8"),
      card("NAXIS", "0"), pad("END", 80))))
    hduRows.zipWithIndex.foreach { case ((base, n), k) =>
      out.write(headerBlock(Seq(
        card("XTENSION", quoted("BINTABLE")), card("BITPIX", "8"),
        card("NAXIS", "2"), card("NAXIS1", "8"),
        card("NAXIS2", n.toString), card("PCOUNT", "0"),
        card("GCOUNT", "1"), card("TFIELDS", "1"),
        card("EXTNAME", quoted(s"SCI${k + 1}")),
        card("TTYPE1", quoted("id")), card("TFORM1", quoted("1K")),
        pad("END", 80))))
      val data = new java.io.ByteArrayOutputStream()
      val dd = new java.io.DataOutputStream(data)
      (0 until n).foreach(i => dd.writeLong(base + i))
      out.write(data.toByteArray ++
        new Array[Byte]((2880 - data.size() % 2880) % 2880))
    }
    if (mismatched) {
      out.write(headerBlock(Seq(
        card("XTENSION", quoted("BINTABLE")), card("BITPIX", "8"),
        card("NAXIS", "2"), card("NAXIS1", "16"),
        card("NAXIS2", "1"), card("PCOUNT", "0"),
        card("GCOUNT", "1"), card("TFIELDS", "2"),
        card("EXTNAME", quoted("ODD")),
        card("TTYPE1", quoted("a")), card("TFORM1", quoted("1K")),
        card("TTYPE2", quoted("b")), card("TFORM2", quoted("1K")),
        pad("END", 80))))
      out.write(new Array[Byte](2880)) // 16 data bytes, zero-padded
    }
    val f = new java.io.File(dir, "mef.fits")
    f.getParentFile.mkdirs()
    val fo = new java.io.FileOutputStream(f)
    try fo.write(out.toByteArray) finally fo.close()
    f.getParentFile.toString
  }

  test("comma-list of indices unions the HDUs; _hdu distinguishes; " +
      "per-HDU partitions planned") {
    val dir = Files.createTempDirectory("fits-mef").toString + "/idx"
    writeMef(dir, Seq((0L, 10), (100L, 20), (200L, 5)))
    val df = spark.read.format("fits").option("hdu", "1,2,3").load(dir)
    assert(df.count() == 35)
    val rows = df.select(col("id"), col("_hdu")).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(rows.count(_._2 == 1) == 10)
    assert(rows.count(_._2 == 2) == 20)
    assert(rows.count(_._2 == 3) == 5)
    assert(rows.filter(_._2 == 2).map(_._1).sorted.toSeq ==
      (100L until 120L))
    // the planner emitted at least one partition per HDU
    assert(df.rdd.getNumPartitions >= 3)
    // a subset list reads exactly its HDUs
    val sub = spark.read.format("fits").option("hdu", "1,3").load(dir)
    assert(sub.count() == 15)
  }

  test("'all' skips the empty primary and unions every readable HDU") {
    val dir = Files.createTempDirectory("fits-mef").toString + "/all"
    writeMef(dir, Seq((0L, 10), (100L, 20), (200L, 5)))
    val df = spark.read.format("fits").option("hdu", "all").load(dir)
    assert(df.count() == 35)
    assert(df.select(col("_hdu")).distinct().collect()
      .map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3))
    // COUNT(*) answers from headers across every HDU
    assert(df.agg(count(lit(1))).head.getLong(0) == 35)
  }

  test("EXTNAME list resolves per name; single-HDU behavior unchanged") {
    val dir = Files.createTempDirectory("fits-mef").toString + "/name"
    writeMef(dir, Seq((0L, 10), (100L, 20), (200L, 5)))
    val df = spark.read.format("fits").option("hdu", "SCI1,SCI3").load(dir)
    assert(df.select(col("id")).collect().map(_.getLong(0)).sorted.toSeq ==
      ((0L until 10L) ++ (200L until 205L)))
    val one = spark.read.format("fits").option("hdu", "SCI2").load(dir)
    assert(one.count() == 20)
  }

  test("schema-compat: PERMISSIVE skips a mismatched HDU under 'all', " +
      "FAILFAST refuses it") {
    val dir = Files.createTempDirectory("fits-mef").toString + "/mix"
    writeMef(dir, Seq((0L, 10), (100L, 20)), mismatched = true)
    val ok = spark.read.format("fits").option("hdu", "all").load(dir)
    assert(ok.count() == 30) // ODD (2-column) skipped with a warning
    val e = intercept[Exception] {
      spark.read.format("fits").option("hdu", "all")
        .option("mode", "FAILFAST").load(dir).count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("schema")), e)
  }

  test("an unresolved token in a list surfaces through the mode — " +
      "FAILFAST throws even when other tokens resolve") {
    val dir = Files.createTempDirectory("fits-mef").toString + "/miss"
    writeMef(dir, Seq((0L, 10), (100L, 20)))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    // index out of range alongside a valid one
    val e1 = intercept[Exception] {
      spark.read.format("fits").option("hdu", "1,9")
        .option("mode", "FAILFAST").load(dir).count()
    }
    assert(msgs(e1).exists(_.contains("no HDU 9")), e1)
    // typo'd EXTNAME alongside a valid one
    val e2 = intercept[Exception] {
      spark.read.format("fits").option("hdu", "SCI1,TYPO")
        .option("mode", "FAILFAST").load(dir).count()
    }
    assert(msgs(e2).exists(_.contains("TYPO")), e2)
    // FAILFAST covers the COUNT(*) metadata-aggregate path too
    val e3 = intercept[Exception] {
      spark.read.format("fits").option("hdu", "1,9")
        .option("mode", "FAILFAST").load(dir)
        .agg(count(lit(1))).collect()
    }
    assert(msgs(e3).exists(_.contains("no HDU 9")), e3)
    // PERMISSIVE: warn + the resolvable HDUs' rows
    val ok = spark.read.format("fits").option("hdu", "1,9").load(dir)
    assert(ok.count() == 10)
  }

  test("multi-HDU across multiple files: file-major, HDU-minor union") {
    val d1 = Files.createTempDirectory("fits-mef").toString + "/m1"
    val d2 = Files.createTempDirectory("fits-mef").toString + "/m2"
    writeMef(d1, Seq((0L, 4), (100L, 4)))
    writeMef(d2, Seq((200L, 4), (300L, 4)))
    // both files through one comma-path read
    val df = spark.read.format("fits").option("hdu", "all")
      .load(s"$d1,$d2")
    assert(df.count() == 16)
    assert(df.select(col("id")).collect().map(_.getLong(0)).sorted.toSeq ==
      ((0L until 4L) ++ (100L until 104L) ++ (200L until 204L) ++
        (300L until 304L)))
  }
}
