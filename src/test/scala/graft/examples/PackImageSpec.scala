package graft.examples

import java.nio.file.Files

import graft.SparkTestBase

/** The fpack-style CLI drives the whole compression surface end to
  * end: plain → HCOMPRESS pack → unpack returns the original pixels.
  * (Codec-level round-trips live in FitsCompressedSpec; this gates the
  * EXAMPLE's wiring — option plumbing, hdu selection, pack→unpack
  * composition.) */
class PackImageSpec extends SparkTestBase {

  test("pack then unpack round-trips an int16 image through the CLI") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val width = 32
    val src = (0 until 48).map(r =>
      (r.toLong, (0 until width).map(c =>
        ((r * 13 + c * 3) % 5000).toShort).toArray))
      .toDF("ImgIndex", "Image")
    val base = Files.createTempDirectory("fits-pack").toString
    val plain = s"$base/plain"
    src.coalesce(1).write.format("fits").option("image", true)
      .mode("append").save(plain)
    val plainFile = new java.io.File(plain).listFiles()
      .filter(_.getName.endsWith(".fits")).head.toString

    val packed = s"$base/packed"
    PackImage.main(Array(plainFile, packed, "HCOMPRESS_1", "16x8"))
    val packedFile = new java.io.File(packed).listFiles()
      .filter(_.getName.endsWith(".fits")).head.toString
    // the packed file is a ZIMAGE bintable with 2-D tiles
    val hdr = new String(java.util.Arrays.copyOfRange(
      Files.readAllBytes(java.nio.file.Paths.get(packedFile)),
      2880, 2880 * 2), "US-ASCII")
    assert(hdr.contains("HCOMPRESS_1") && hdr.contains("ZIMAGE"), hdr)

    val unpacked = s"$base/unpacked"
    PackImage.main(Array(packedFile, unpacked, "NONE"))
    val back = spark.read.format("fits").option("hdu", 0).load(unpacked)
      .orderBy("ImgIndex").select(col("Image")).as[Array[Short]].collect()
    val want = src.orderBy("ImgIndex").select(col("Image"))
      .as[Array[Short]].collect()
    assert(back.map(_.toSeq).toSeq == want.map(_.toSeq).toSeq)
  }

  test("lossy smooth pack (fpack -s): SMOOTH=1 recorded, unpack within bound") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val (width, scale) = (24, 8)
    val src = (0 until 32).map(r =>
      (r.toLong, (0 until width).map(c =>
        (200 + r * 5 + c * 4).toShort).toArray))
      .toDF("ImgIndex", "Image")
    val base = Files.createTempDirectory("fits-packs").toString
    src.coalesce(1).write.format("fits").option("image", true)
      .mode("append").save(s"$base/plain")
    val plainFile = new java.io.File(s"$base/plain").listFiles()
      .filter(_.getName.endsWith(".fits")).head.toString
    PackImage.main(Array(plainFile, s"$base/packed", "HCOMPRESS_1", "",
      "0", "0", scale.toString, "1"))
    val packedFile = new java.io.File(s"$base/packed").listFiles()
      .filter(_.getName.endsWith(".fits")).head.toString
    val cards = new String(java.util.Arrays.copyOfRange(
      Files.readAllBytes(java.nio.file.Paths.get(packedFile)),
      2880, 2880 * 2), "US-ASCII").grouped(80).map(_.trim).toSeq
    assert(cards.exists(c => c.startsWith("ZVAL4") && c.contains("1")), cards)
    PackImage.main(Array(packedFile, s"$base/unpacked", "NONE"))
    val back = spark.read.format("fits").option("hdu", 0)
      .load(s"$base/unpacked")
      .orderBy("ImgIndex").select(col("Image")).as[Array[Short]].collect()
    val want = src.orderBy("ImgIndex").select(col("Image"))
      .as[Array[Short]].collect()
    val maxErr = back.zip(want).flatMap { case (b, w) =>
      b.zip(w).map { case (a, x) => math.abs(a - x) } }.max
    assert(maxErr > 0 && maxErr <= 2 * scale, s"maxErr $maxErr")
  }
}
