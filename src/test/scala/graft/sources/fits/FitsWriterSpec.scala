package graft.sources.fits

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** FITS batch write (beyond reference): part-file-per-partition layout
  * that reads straight back through this source's multi-file union. */
class FitsWriterSpec extends SparkTestBase {

  import spark.implicits._

  private def roundTrip(dir: String) =
    spark.read.format("fits").option("hdu", 1).load(dir)

  test("write/read round-trip preserves every supported type") {
    val dir = Files.createTempDirectory("fits-write").toString + "/t1"
    val df = (0 until 500).map { i =>
      (i.toLong, i, (i % 100).toShort, i.toByte, i % 3 == 0,
        i * 1.5f, i * 2.5, s"name-$i")
    }.toDF("k", "j", "i16", "b", "flag", "e", "d", "s")
    df.write.format("fits").mode("append").save(dir)

    val back = roundTrip(dir)
    assert(back.schema.map(f => (f.name, f.dataType.typeName)).toSeq ==
      Seq("k" -> "long", "j" -> "integer", "i16" -> "short", "b" -> "byte",
        "flag" -> "boolean", "e" -> "float", "d" -> "double", "s" -> "string"))
    assert(back.count() == 500)
    val got = back.collect().map(r => (r.getLong(0), r.getInt(1), r.getShort(2),
      r.getByte(3), r.getBoolean(4), r.getFloat(5), r.getDouble(6),
      r.getString(7))).toSet
    val want = df.collect().map(r => (r.getLong(0), r.getInt(1), r.getShort(2),
      r.getByte(3), r.getBoolean(4), r.getFloat(5), r.getDouble(6),
      r.getString(7))).toSet
    assert(got == want)
  }

  test("multi-partition write yields one part file each; union reads whole") {
    val dir = Files.createTempDirectory("fits-write").toString + "/t2"
    spark.range(0, 1000).select(col("id"), (col("id") * 2).as("v"))
      .repartition(4)
      .write.format("fits").mode("append").save(dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".fits"))
    assert(files.length == 4)
    val back = roundTrip(dir)
    assert(back.count() == 1000)
    assert(back.agg(sum("v")).head.getLong(0) == (0L until 1000L).map(_ * 2).sum)
  }

  test("append adds files; overwrite replaces them") {
    val dir = Files.createTempDirectory("fits-write").toString + "/t3"
    Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
      .coalesce(1).write.format("fits").mode("append").save(dir)
    Seq((3L, "c")).toDF("id", "tag")
      .coalesce(1).write.format("fits").mode("append").save(dir)
    assert(roundTrip(dir).count() == 3)
    Seq((9L, "z")).toDF("id", "tag")
      .coalesce(1).write.format("fits").mode("overwrite").save(dir)
    val rows = roundTrip(dir).collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((9L, "z")))
  }

  test("nulls round-trip: integers via TNULL, booleans via undefined-L") {
    val dir = Files.createTempDirectory("fits-write").toString + "/t4"
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(null, null, null), Row(5L, "x", true), Row(7L, "y", false)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType, nullable = true),
        org.apache.spark.sql.types.StructField("s",
          org.apache.spark.sql.types.StringType, nullable = true),
        org.apache.spark.sql.types.StructField("f",
          org.apache.spark.sql.types.BooleanType, nullable = true))))
    df.coalesce(1).write.format("fits").mode("append").save(dir)
    val got = roundTrip(dir).collect()
      .map(r => (if (r.isNullAt(0)) null else r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getBoolean(2))).toSet
    // integer + boolean nulls survive; string null reads as "" (FITS
    // strings have no null representation)
    assert(got == Set((null, "", null), (5L, "x", true), (7L, "y", false)))

    // null + legitimate MinValue in one column is unencodable → clear error
    val bad = spark.createDataFrame(
      java.util.Arrays.asList(Row(null), Row(Long.MinValue)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType, nullable = true))))
    val eAmb = intercept[Exception] {
      bad.coalesce(1).write.format("fits").mode("append")
        .save(Files.createTempDirectory("fits-write").toString + "/amb")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(eAmb).exists(_.contains("ambiguous")), eAmb)

    val badType = Seq((1L, Array("a", "b"))).toDF("id", "tags")
    val e = intercept[Exception] {
      badType.write.format("fits").mode("append")
        .save(Files.createTempDirectory("fits-write").toString + "/t5")
    }
    assert(msgs(e).exists(m =>
      m.contains("arrays of fixed-width scalars only")), e)
  }

  test("embeddings round-trip to FITS vectors; similarity runs on FITS storage") {
    val dir = Files.createTempDirectory("fits-write").toString + "/emb"
    val src = spark.read.parquet(s"$sf001/embeddings.parquet").limit(200)
    src.write.format("fits").mode("append").save(dir)

    val back = roundTrip(dir)
    assert(back.schema("embedding").dataType.simpleString == "array<float>")
    assert(back.count() == 200)
    // exact element-level round-trip
    val a = src.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val b = back.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(a == b)
    // the similarity surface runs unchanged over FITS-backed vectors
    import graft.functions.VectorFunctions
    val q = back.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"))
    val top = back.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"),
        VectorFunctions.cosine_sim(col("q_emb"), col("embedding")).as("sim"))
      .orderBy(col("sim").desc).limit(3).collect()
    assert(top.length == 3 && top.forall(r => !r.getDouble(1).isNaN))
  }

  test("reported statistics let Catalyst auto-broadcast a small FITS dim") {
    val dir = Files.createTempDirectory("fits-write").toString + "/dim"
    (0L until 100L).map(i => (i, s"dim-$i")).toDF("id", "label")
      .coalesce(1).write.format("fits").mode("append").save(dir)
    val dim = roundTrip(dir)
    val fact = spark.range(0, 50000).toDF("id")
    // no broadcast() hint anywhere: the decision must come from the
    // scan's SupportsReportStatistics (without it, a DSv2 relation
    // defaults to "huge" and plans a shuffle join)
    val plan = fact.join(dim, "id").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("scan statistics honor a pushed limit and per-file row widths") {
    val dir = Files.createTempDirectory("fits-write").toString + "/stats"
    (0L until 100L).map(i => (i, i * 2.0)).toDF("id", "v")
      .coalesce(1).write.format("fits").mode("append").save(dir)
    val res = FitsResolution(Map("path" -> dir, "hdu" -> "1"))
    val schema = res.inferredSchema
    def sized(limit: Option[Long]) = {
      val st = new FitsScan(res, schema, schema, limit).estimateStatistics()
      (st.numRows().getAsLong, st.sizeInBytes().getAsLong)
    }
    val (fullRows, fullBytes) = sized(None)
    assert(fullRows == 100 && fullBytes == 100L * (8 + 8))
    val (limRows, limBytes) = sized(Some(7L))
    assert(limRows == 7 && limBytes == 7L * (8 + 8))
    // a limit beyond the table caps at the table
    assert(sized(Some(1000L))._1 == 100)
  }

  test("property round-trip: random values through every type survive exactly") {
    val rnd = new scala.util.Random(99)
    def randStr(): String = {
      val n = rnd.nextInt(20)
      (0 until n).map(_ => (33 + rnd.nextInt(94)).toChar).mkString
        .replace("'", "x") // FITS header quoting is not in play for data, keep printable
    }
    for (trial <- 0 until 3) {
      val dir = Files.createTempDirectory("fits-write").toString + s"/prop$trial"
      val n = 1 + rnd.nextInt(300)
      val rows = (0 until n).map { _ =>
        (rnd.nextLong(), rnd.nextInt(), rnd.nextInt().toShort,
          rnd.nextInt().toByte, rnd.nextBoolean(),
          // bounded: NaN would break tuple-set equality, not the writer
          rnd.nextFloat() * 2e6f - 1e6f,
          rnd.nextDouble(), randStr().trim,
          // random per-row length: partitions land on the fixed-vector
          // path or the ragged var-length path by chance — both must
          // round-trip exactly
          Array.fill(rnd.nextInt(9))(rnd.nextDouble()))
      }
      val df = rows.toDF("k", "j", "i16", "b8", "flag", "e", "d", "s", "v")
        .repartition(3)
      df.write.format("fits").mode("append").save(dir)
      val back = roundTrip(dir)
      def canon(r: Row) = (r.getLong(0), r.getInt(1), r.getShort(2),
        r.getByte(3), r.getBoolean(4), r.getFloat(5), r.getDouble(6),
        r.getString(7), r.getSeq[Double](8).toList)
      val got = back.collect().map(canon).toSet
      val want = df.collect().map(canon).toSet
      assert(got == want, s"trial $trial, n=$n")
    }
  }

  test("empty partitions write empty-but-valid files; the union still reads") {
    val dir = Files.createTempDirectory("fits-write").toString + "/empties"
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
      .repartition(5) // most partitions hold zero rows
      .write.format("fits").mode("append").save(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".fits"))
    assert(files.length == 5)
    val back = roundTrip(dir)
    assert(back.count() == 2)
    assert(back.agg(sum("v")).head.getDouble(0) == 30.0)
  }

  test("failed commit leaves no visible or in-flight file behind") {
    val dir = Files.createTempDirectory("fits-write").toString + "/abort"
    // a >66-char column name passes type validation but overflows its
    // 80-byte TTYPE card INSIDE commit(), after the staging file exists —
    // exactly the mid-commit crash the temp-name+rename protocol covers
    val longName = "c" * 100
    intercept[Exception] {
      Seq(1L).toDF(longName).coalesce(1)
        .write.format("fits").mode("append").save(dir)
    }
    val left = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
    assert(left.isEmpty, s"leftover files after aborted write: ${left.mkString(", ")}")
  }

  test("fixed-format mandatory cards; embedded quotes escape and round-trip") {
    val dir = Files.createTempDirectory("fits-write").toString + "/cards"
    Seq((1L, "x")).toDF("id", "na'me").coalesce(1)
      .write.format("fits").mode("append").save(dir)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".fits")).head
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    val hdr0 = new String(bytes, 0, 2880, "US-ASCII")
    // FITS 4.0 §4.2.1 fixed format: non-string value right-justified,
    // ending at byte 30 (0-indexed char 29)
    val simple = hdr0.grouped(80).find(_.startsWith("SIMPLE")).get
    assert(simple.substring(8, 30) == "= " + " " * 19 + "T", s"[$simple]")
    val hdr1 = new String(bytes, 2880, 2880, "US-ASCII")
    val nax2 = hdr1.grouped(80).find(_.startsWith("NAXIS2")).get
    assert(nax2.charAt(29) == '1' && nax2.substring(10, 29).trim.isEmpty,
      s"[$nax2]")
    // string values keep their opening quote at byte 11; ' escapes as ''
    assert(hdr1.contains("na''me"))
    assert(roundTrip(dir).schema.fieldNames.toSeq == Seq("id", "na'me"))
  }

  test("ragged arrays auto-write as var-length P columns and round-trip") {
    val dir = Files.createTempDirectory("fits-write").toString + "/ragged"
    val rows = Seq(
      (1L, Array(1f, 2f), Array(10.0, 20.0)),
      (2L, Array(3f, 4f, 5f), Array(10.0, 20.0)), // v ragged, w fixed
      (3L, Array.empty[Float], Array(30.0, 40.0)))
    // one partition: raggedness is detected per part-file
    rows.toDF("id", "v", "w").coalesce(1)
      .write.format("fits").mode("append").save(dir)
    // header: ragged column declares 1PE(max); fixed one stays 2D
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".fits")).head
    val hdr1 = new String(
      java.nio.file.Files.readAllBytes(f.toPath), 2880, 2880, "US-ASCII")
    assert(hdr1.contains("1PE("), hdr1.grouped(80).filter(_.startsWith("TFORM")).mkString("|"))
    assert(hdr1.grouped(80).exists(c => c.startsWith("TFORM3") && c.contains("2D")))
    val back = roundTrip(dir)
    assert(back.schema("v").dataType.simpleString == "array<float>")
    val got = back.collect().map(r => (r.getLong(0),
      r.getSeq[Float](1).toList, r.getSeq[Double](2).toList)).toSet
    assert(got == rows.map(t => (t._1, t._2.toList, t._3.toList)).toSet)
  }

  test("skewed-width string columns adaptively store as var-length PA") {
    val dir = Files.createTempDirectory("fits-write").toString + "/docs"
    // one 5 KB document among short ones: fixed nA would pad every row
    val docs = (0 until 200).map { i =>
      (i.toLong, if (i == 7) "x" * 5000 else s"short doc $i")
    }
    docs.toDF("doc_id", "text").coalesce(1)
      .write.format("fits").mode("append").save(dir)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".fits")).head
    val hdr1 = new String(
      java.nio.file.Files.readAllBytes(f.toPath), 2880, 2880, "US-ASCII")
    assert(hdr1.contains("1PA("), hdr1.grouped(80)
      .filter(_.startsWith("TFORM")).mkString("|"))
    // padding saved: file is ~KBs, not 200 x 5000 B
    assert(f.length < 100 * 1024, f.length)
    val back = roundTrip(dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back == docs.toSet)

    // narrow / dense string columns keep the fixed nA form
    val dir2 = Files.createTempDirectory("fits-write").toString + "/dense"
    docs.map { case (i, _) => (i, s"tag-$i") }.toDF("doc_id", "text")
      .coalesce(1).write.format("fits").mode("append").save(dir2)
    val f2 = new java.io.File(dir2).listFiles()
      .filter(_.getName.endsWith(".fits")).head
    val hdr2 = new String(
      java.nio.file.Files.readAllBytes(f2.toPath), 2880, 2880, "US-ASCII")
    assert(!hdr2.contains("1PA("))
  }

  test("document pipeline runs identically on FITS-backed storage") {
    val dir = Files.createTempDirectory("fits-write").toString + "/corpus"
    val src = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text")
    src.write.format("fits").mode("append").save(dir)
    val back = roundTrip(dir)
    // text round-trips modulo the FITS trim convention (strings are
    // space-padded on disk, so leading/trailing whitespace is not
    // representable — same as the reference's nA decode)
    val a = src.collect().map(r => (r.getLong(0), r.getString(1).trim)).toSet
    val b = back.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b)
    // the text operators produce identical results over either storage
    def tokens(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("n"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(tokens(back) == tokens(src))
  }

  test("image mode writes an IMAGE primary HDU that round-trips at hdu 0") {
    val dir = Files.createTempDirectory("fits-write").toString + "/img"
    // a 31-line x 16-pixel int16 image, lines tagged with their index
    val lines = (0 until 31).map(y =>
      (y.toLong, (0 until 16).map(x => (y * 100 + x).toShort).toArray))
    lines.toDF("ImgIndex", "Image").coalesce(1)
      .sortWithinPartitions("ImgIndex")
      .write.format("fits").option("image", true).mode("append").save(dir)
    val back = spark.read.format("fits").option("hdu", 0).load(dir)
    assert(back.schema.map(f => (f.name, f.dataType.simpleString)) ==
      Seq("Image" -> "array<smallint>", "ImgIndex" -> "bigint"))
    val got = back.collect()
      .map(r => r.getLong(1) -> r.getSeq[Short](0).toList).toMap
    assert(got.size == 31)
    lines.foreach { case (y, px) => assert(got(y) == px.toList, s"line $y") }
    // BITPIX recorded correctly for the element type
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".fits")).head
    val hdr = new String(
      java.nio.file.Files.readAllBytes(f.toPath), 0, 2880, "US-ASCII")
    val bp = hdr.grouped(80).find(_.startsWith("BITPIX")).get
    assert(bp.substring(10, 30).trim == "16", s"[$bp]")

    // float image: BITPIX -32 and exact pixel round-trip
    val dir2 = Files.createTempDirectory("fits-write").toString + "/imgf"
    val fl = (0 until 8).map(y =>
      (y.toLong, Array.tabulate(4)(x => y * 1.5f + x)))
    fl.toDF("ImgIndex", "Image").coalesce(1)
      .sortWithinPartitions("ImgIndex")
      .write.format("fits").option("image", true).mode("append").save(dir2)
    val back2 = spark.read.format("fits").option("hdu", 0).load(dir2)
    assert(back2.schema("Image").dataType.simpleString == "array<float>")
    val got2 = back2.collect()
      .map(r => r.getLong(1) -> r.getSeq[Float](0).toList).toMap
    fl.foreach { case (y, px) => assert(got2(y) == px.toList) }

    // contract violations fail clearly
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val ragged = Seq((0L, Array(1f, 2f)), (1L, Array(1f))).toDF("ImgIndex", "Image")
    val e1 = intercept[Exception] {
      ragged.coalesce(1).write.format("fits").option("image", true)
        .mode("append")
        .save(Files.createTempDirectory("fits-write").toString + "/bad1")
    }
    assert(messages(e1).exists(_.contains("rectangular")), e1)
    val e2 = intercept[Exception] {
      Seq((1L, "x")).toDF("a", "b").write.format("fits")
        .option("image", true).mode("append")
        .save(Files.createTempDirectory("fits-write").toString + "/bad2")
    }
    assert(messages(e2).exists(_.contains("exactly one array column")), e2)
  }

  test("kitchen sink: nulls + ragged arrays + var strings in one table") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("fits-write").toString + "/sink"
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = true),
      StructField("flag", BooleanType, nullable = true),
      StructField("vec", ArrayType(FloatType), nullable = true), // ragged
      StructField("ivec", ArrayType(IntegerType, containsNull = true),
        nullable = true), // fixed repeat, null elements
      StructField("doc", StringType, nullable = true))) // skewed → PA
    val rows = java.util.Arrays.asList(
      Row(1L, true, Array(1f, 2f), Array[Any](1, null), "short"),
      Row(null, null, Array.empty[Float], Array[Any](null, 4), "x" * 500),
      Row(3L, false, Array(9f, 8f, 7f), Array[Any](5, 6), ""))
    spark.createDataFrame(rows, schema).coalesce(1)
      .write.format("fits").mode("append").save(dir)

    val back = roundTrip(dir).orderBy("doc").collect()
      .map(r => (if (r.isNullAt(0)) null else r.getLong(0),
        if (r.isNullAt(1)) null else r.getBoolean(1),
        r.getSeq[Float](2).toList,
        r.getSeq[Any](3).toList,
        r.getString(4).length))
    assert(back.toSet == Set(
      (1L, true, List(1f, 2f), List(1, null), 5),
      (null, null, Nil, List(null, 4), 500),
      (3L, false, List(9f, 8f, 7f), List(5, 6), 0)))
    // on-disk shapes: ragged vec → 1PE, skewed doc → 1PA, id gains TNULL
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".fits")).head
    val hdr = new String(
      java.nio.file.Files.readAllBytes(f.toPath), 2880, 2880, "US-ASCII")
    assert(hdr.contains("1PE(") && hdr.contains("1PA(") &&
      hdr.grouped(80).exists(_.startsWith("TNULL1")) &&
      hdr.grouped(80).exists(_.startsWith("TNULL4")), // ivec elements
      hdr.grouped(80).filter(c => c.startsWith("TFORM") ||
        c.startsWith("TNULL")).mkString("|"))
  }

  test("null arrays still fail with a clear error") {
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, null)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType, nullable = true),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType), nullable = true))))
    val e = intercept[Exception] {
      df.coalesce(1).write.format("fits").mode("append")
        .save(Files.createTempDirectory("fits-write").toString + "/nullarr")
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("no null representation")), e)
  }
}
