package graft.sources.fits

import java.io.{DataOutputStream, FileOutputStream}
import java.nio.file.Files

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Property-based round-trip: generate a random bintable FITS file from
  * the spec (in-test writer — astropy is unavailable offline, SURVEY
  * §5), read it back through the connector under adversarial partition
  * sizes, and compare every value.
  */
class FitsRoundTripSpec extends SparkTestBase {

  // ------------------------------------------------------ tiny FITS writer

  private def pad(s: String, n: Int): String =
    if (s.length >= n) s.take(n) else s + " " * (n - s.length)

  private def card(key: String, value: String): String =
    pad(pad(key, 8) + "= " + pad(value, 20), 80)

  private def writeBintable(rows: Seq[(Long, Int, Short, Double, Float, String, Boolean)],
      path: String): Unit = {
    val rowBytes = 8 + 4 + 2 + 8 + 4 + 10 + 1
    val cards = Seq(
      card("XTENSION", "'BINTABLE'"),
      card("BITPIX", "8"),
      card("NAXIS", "2"),
      card("NAXIS1", rowBytes.toString),
      card("NAXIS2", rows.length.toString),
      card("PCOUNT", "0"), card("GCOUNT", "1"),
      card("TFIELDS", "7"),
      card("TTYPE1", "'id      '"), card("TFORM1", "'K       '"),
      card("TTYPE2", "'i32     '"), card("TFORM2", "'J       '"),
      card("TTYPE3", "'i16     '"), card("TFORM3", "'I       '"),
      card("TTYPE4", "'d64     '"), card("TFORM4", "'D       '"),
      card("TTYPE5", "'f32     '"), card("TFORM5", "'E       '"),
      card("TTYPE6", "'name    '"), card("TFORM6", "'10A     '"),
      card("TTYPE7", "'flag    '"), card("TFORM7", "'L       '"),
      pad("END", 80))
    val out = new DataOutputStream(new FileOutputStream(path))
    try {
      // primary: minimal empty HDU
      val primary = Seq(card("SIMPLE", "T"), card("BITPIX", "8"),
        card("NAXIS", "0"), pad("END", 80))
      writeHeader(out, primary)
      writeHeader(out, cards)
      rows.foreach { case (id, i32, i16, d64, f32, name, flag) =>
        out.writeLong(id); out.writeInt(i32); out.writeShort(i16)
        out.writeDouble(d64); out.writeFloat(f32)
        out.write(pad(name, 10).getBytes("US-ASCII"))
        out.writeByte(if (flag) 'T' else 'F')
      }
      val dataLen = rowBytes.toLong * rows.length
      val padLen = ((dataLen + 2879) / 2880 * 2880 - dataLen).toInt
      out.write(new Array[Byte](padLen))
    } finally out.close()
  }

  private def writeHeader(out: DataOutputStream, cards: Seq[String]): Unit = {
    val text = cards.mkString
    out.write(text.getBytes("US-ASCII"))
    val rem = text.length % 2880
    if (rem != 0) out.write(" " * (2880 - rem) getBytes "US-ASCII")
  }

  // ---------------------------------------------------------- properties

  private val rowGen = for {
    id <- Gen.choose(Long.MinValue, Long.MaxValue)
    i32 <- Gen.choose(Int.MinValue, Int.MaxValue)
    i16 <- Gen.choose(Short.MinValue, Short.MaxValue)
    d64 <- Gen.choose(-1e12, 1e12)
    f32 <- Gen.choose(-1e6f, 1e6f)
    name <- Gen.alphaNumStr.map(_.take(10))
    flag <- Gen.oneOf(true, false)
  } yield (id, i32, i16.toShort, d64, f32, name, flag)

  test("random bintables round-trip exactly under adversarial splits") {
    // no scalatest-scalacheck bridge offline: sample deterministically
    val samples = Seq(1L, 2L, 3L).map { seed =>
      Gen.listOfN(257, rowGen)(Gen.Parameters.default, Seed(seed))
        .getOrElse(fail(s"generator exhausted for seed $seed"))
    }
    samples.foreach { rows =>
      val f = Files.createTempFile("graft-prop", ".fits").toString
      try {
        writeBintable(rows, f)
        // partition size not aligned to the 37-byte rows: forces the
        // planner's row alignment to do real work
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1001")
        val got = spark.read.format("fits").option("hdu", 1).load(f)
          .collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getShort(2),
            r.getDouble(3), r.getFloat(4), r.getString(5), r.getBoolean(6)))
          .toList
        val expected = rows.map { case (id, i32, i16, d64, f32, name, flag) =>
          (id, i32, i16, d64, f32, pad(name, 10).trim, flag)
        }
        assert(got == expected)
      } finally {
        spark.conf.unset("spark.sql.files.maxPartitionBytes")
        Files.deleteIfExists(java.nio.file.Paths.get(f))
      }
    }
  }

  test("counts and distincts agree for many partition sizes (issue #93 class)") {
    val rows = (0 until 1000).map(i =>
      (i.toLong, i, (i % 7).toShort, i * 1.5, i * 0.5f, s"row$i", i % 2 == 0))
    val f = Files.createTempFile("graft-sizes", ".fits").toString
    try {
      writeBintable(rows, f)
      Seq(37L, 38L, 999L, 2880L, 37000L).foreach { mpb =>
        spark.conf.set("spark.sql.files.maxPartitionBytes", mpb.toString)
        val df = spark.read.format("fits").option("hdu", 1).load(f)
        assert(df.count() == 1000L, s"mpb=$mpb")
        assert(df.distinct().count() == 1000L, s"mpb=$mpb")
      }
    } finally {
      spark.conf.unset("spark.sql.files.maxPartitionBytes")
      Files.deleteIfExists(java.nio.file.Paths.get(f))
    }
  }
}
