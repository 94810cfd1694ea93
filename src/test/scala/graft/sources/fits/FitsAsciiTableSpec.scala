package graft.sources.fits

import java.io.{DataOutputStream, FileOutputStream}
import java.nio.file.Files

import graft.SparkTestBase

/** ASCII TABLE extension decode (beyond reference — it surfaces TABLE
  * HDUs as empty DataFrames, FitsHdu.scala:242-267): fixed-width text
  * rows, columns at 1-based TBCOLn, Fortran-style field grammars. */
class FitsAsciiTableSpec extends SparkTestBase {

  import FitsWriteSupport.{card, headerBlock, pad, quoted}

  /** Hand-built two-HDU file: empty primary + one ASCII TABLE. */
  private def writeAsciiTable(rows: Seq[String], rowBytes: Int): String = {
    require(rows.forall(_.length == rowBytes))
    val dir = Files.createTempDirectory("fits-ascii")
    val f = dir.resolve("t.fits").toFile
    val out = new DataOutputStream(new FileOutputStream(f))
    out.write(headerBlock(Seq(card("SIMPLE", "T"), card("BITPIX", "8"),
      card("NAXIS", "0"), pad("END", 80))))
    out.write(headerBlock(Seq(
      card("XTENSION", quoted("TABLE")), card("BITPIX", "8"),
      card("NAXIS", "2"), card("NAXIS1", rowBytes.toString),
      card("NAXIS2", rows.length.toString), card("PCOUNT", "0"),
      card("GCOUNT", "1"), card("TFIELDS", "4"),
      card("TTYPE1", quoted("name")), card("TBCOL1", "1"),
      card("TFORM1", quoted("A8")),
      card("TTYPE2", quoted("id")), card("TBCOL2", "10"),
      card("TFORM2", quoted("I6")),
      card("TTYPE3", quoted("flux")), card("TBCOL3", "17"),
      card("TFORM3", quoted("F8.2")),
      card("TTYPE4", quoted("mag")), card("TBCOL4", "26"),
      card("TFORM4", quoted("E10.3")),
      pad("END", 80))))
    val data = rows.mkString.getBytes("US-ASCII")
    out.write(data)
    out.write(new Array[Byte]((2880 - data.length % 2880) % 2880))
    out.close()
    f.toString
  }

  //                name(8)   id(6)     flux(8)    mag(10)
  // offsets (0b):  0         9         16         25        pad → 36
  private def row(name: String, id: String, flux: String, mag: String): String = {
    val s = pad(name, 8) + " " + id.reverse.padTo(6, ' ').reverse + " " +
      flux.reverse.padTo(8, ' ').reverse + " " +
      mag.reverse.padTo(10, ' ').reverse + " "
    assert(s.length == 36, s.length)
    s
  }

  private lazy val path = writeAsciiTable(Seq(
    row("alpha", "42", "123.45", "1.25E+02"),
    row("beta", "", "12345", "1.25D+02"), // blank id; implied decimal; D exp
    row("gamma", "-17", "-1.50", ""), // negative; blank real
    row("", "7", "", "-250E-1")), // blank string; blank F; implied d on exp
    rowBytes = 36)

  test("ASCII TABLE: schema inference maps Fortran field grammars") {
    val df = spark.read.format("fits").option("hdu", 1).load(path)
    assert(df.schema.map(f => (f.name, f.dataType.typeName)) ==
      Seq("name" -> "string", "id" -> "long",
        "flux" -> "double", "mag" -> "double"))
  }

  test("ASCII TABLE: values, nulls, implied decimal point, D exponent") {
    val df = spark.read.format("fits").option("hdu", 1).load(path)
    val got = df.collect().map(r => (r.getString(0),
      if (r.isNullAt(1)) null else r.getLong(1),
      if (r.isNullAt(2)) null else r.getDouble(2),
      if (r.isNullAt(3)) null else r.getDouble(3))).toSeq
    assert(got == Seq(
      ("alpha", 42L, 123.45, 125.0),
      ("beta", null, 123.45, 125.0), // "12345" with F8.2 ⇒ 123.45
      ("gamma", -17L, -1.5, null),
      ("", 7L, null, -0.025))) // "-250E-1", d=3 ⇒ -0.250×10⁻¹ = -0.025
  }

  test("ASCII TABLE: relational surface runs over it (filter/agg/prune)") {
    val df = spark.read.format("fits").option("hdu", 1).load(path)
    import org.apache.spark.sql.functions._
    val agg = df.filter(col("id").isNotNull)
      .agg(sum("id").as("s"), count("*").as("n")).head
    assert(agg.getLong(0) == 42L - 17L + 7L && agg.getLong(1) == 3L)
    // pruned single-column read still decodes at the right offset
    val fluxSum = df.select("flux").collect()
      .filterNot(_.isNullAt(0)).map(_.getDouble(0)).sum
    assert(fluxSum == 123.45 + 123.45 - 1.5)
  }
}
