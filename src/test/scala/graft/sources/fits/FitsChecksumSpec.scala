package graft.sources.fits

import java.nio.file.Files

import graft.SparkTestBase
import graft.sources.fits.core.FitsChecksum

/** CHECKSUM/DATASUM convention: writer emission verified by the
  * property every external verifier checks (whole-HDU ones'-complement
  * sum folds to -0), plus the distributed audit utility. */
class FitsChecksumSpec extends SparkTestBase {

  import spark.implicits._

  test("encode emits only allowed chars and adds exactly the complement") {
    val rnd = new scala.util.Random(11)
    val allowed = (('0' to '9') ++ ('A' to 'Z') ++ ('a' to 'z')).toSet
    for (_ <- 0 until 200) {
      val v = rnd.nextLong() & 0xFFFFFFFFL
      val s = FitsChecksum.encode(v)
      assert(s.length == 16 && s.forall(allowed), s"'$s' for $v")
      // replacing '0'*16 by the encoding must add exactly v to the
      // word sum, measured at the convention's byte lanes (value
      // chars start at byte 11 of the 4-aligned card)
      def lanes(chars: String): Long =
        chars.zipWithIndex.map { case (c, i) =>
          c.toLong << (8 * (3 - ((11 + i) % 4)))
        }.sum
      val delta = FitsChecksum.fold(
        lanes(s) + (0xFFFFFFFFL - FitsChecksum.fold(lanes("0" * 16))))
      // delta ≡ lanes(s) - lanes("0"*16) in ones'-complement
      assert(delta == FitsChecksum.fold(v) ||
        (v == 0 && delta == 0xFFFFFFFFL), s"delta=$delta v=$v")
    }
  }

  test("folded partials combine exactly where raw u64 sums would wrap") {
    // Simulate a multi-TB HDU's combine tree: many range partials, each
    // near the u64 range a 128 MB all-0xFF range produces (~2^57). The
    // ground truth is the sum mod (2^32−1) computed in BigInt; the
    // folded pairwise combine (what FitsChecksumReport's combiner does
    // post-fix) must match it, while the raw u64 accumulation provably
    // wraps — i.e. this test fails on the pre-fix code path.
    val m = (BigInt(1) << 32) - 1
    val rnd = new scala.util.Random(7)
    val partials = Seq.fill(4096)(0x0200000000000000L + rnd.nextLong(1L << 56))
    val truth = partials.map(BigInt(_)).sum.mod(m).toLong
    val rawWrapped = partials.sum // provokes the wraparound
    assert(rawWrapped < 0 || FitsChecksum.fold(rawWrapped) != truth,
      "test setup must actually wrap u64")
    val folded = partials.map(FitsChecksum.fold)
      .reduce((a, b) => FitsChecksum.fold(a + b))
    // fold yields values in [0, 2^32−1] with 2^32−1 ≡ 0 (ones'-compl.
    // negative zero), so compare mod m
    assert(folded % m.toLong == truth % m.toLong,
      s"folded=$folded truth=$truth")
  }

  /** Independent verifier: raw ones'-complement sum of each HDU. */
  private def rawHduSums(path: java.nio.file.Path): Seq[Long] = {
    val bytes = Files.readAllBytes(path)
    // split on END-card block boundaries via the source's own scanner
    val p = new org.apache.hadoop.fs.Path(path.toString)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    graft.sources.fits.core.FitsStructure.scan(fs, p).map { h =>
      val start = h.bounds.headerStart.toInt
      val stop = math.min(h.bounds.blockStop, bytes.length.toLong).toInt
      FitsChecksum.fold(FitsChecksum.wordSum(bytes, start, stop - start))
    }
  }

  test("image write with checksum: every HDU sums to -0; report verifies") {
    val dir = Files.createTempDirectory("fits-ck").toString + "/img"
    (0 until 50).map(r => (r.toLong, (0 until 32).map(c => r * 100 + c).toArray))
      .toDF("ImgIndex", "Image")
      .coalesce(1).write.format("fits")
      .option("image", true).option("checksum", true)
      .mode("append").save(dir)
    val part = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".fits")).head
    // the defining property, checked with an INDEPENDENT re-sum
    assert(rawHduSums(part.toPath).forall(FitsChecksum.verifies),
      "HDU sum must fold to 0xFFFFFFFF")
    val rep = FitsChecksumReport.report(spark, dir).collect()
    assert(rep.nonEmpty && rep.forall(r =>
      r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4)), rep.toSeq)
    // data still reads correctly
    val back = spark.read.format("fits").option("hdu", 0).load(dir)
    assert(back.count() == 50)
  }

  test("compressed image write with checksum verifies on both HDUs") {
    val dir = Files.createTempDirectory("fits-ck").toString + "/rice"
    (0 until 40).map(r => (0 until 16).map(c => (r * 7 + c).toShort).toArray)
      .toDF("Image")
      .coalesce(1).write.format("fits")
      .option("image", true).option("compress", "RICE_1")
      .option("checksum", true).mode("append").save(dir)
    val part = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".fits")).head
    val sums = rawHduSums(part.toPath)
    assert(sums.length == 2 && sums.forall(FitsChecksum.verifies), sums)
    val rep = FitsChecksumReport.report(spark, dir).collect()
    assert(rep.length == 2 && rep.forall(r =>
      r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4)), rep.toSeq)
  }

  test("report flags corruption and absent cards honestly") {
    val dir = Files.createTempDirectory("fits-ck").toString + "/bad"
    (0 until 20).map(r => (0 until 8).map(c => r + c).toArray).toDF("Image")
      .coalesce(1).write.format("fits")
      .option("image", true).option("checksum", true)
      .mode("append").save(dir)
    val part = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".fits")).head
    // flip one data byte
    val bytes = Files.readAllBytes(part.toPath)
    bytes(2880 + 100) = (bytes(2880 + 100) ^ 0x5a).toByte
    Files.write(part.toPath, bytes)
    // the corruption is out-of-band: drop Hadoop's local .crc sidecar
    // so OUR checksum layer (not Hadoop's) is what detects it
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".crc")).foreach(_.delete())
    val rep = FitsChecksumReport.report(spark, dir).collect()
    assert(rep.exists(r => !r.getBoolean(3) && !r.getBoolean(4)), rep.toSeq)

    // a file written without the option: cards absent, verdict null
    val dir2 = Files.createTempDirectory("fits-ck").toString + "/none"
    (0 until 5).map(r => (0 until 8).map(c => r + c).toArray).toDF("Image")
      .coalesce(1).write.format("fits").option("image", true)
      .mode("append").save(dir2)
    val rep2 = FitsChecksumReport.report(spark, dir2).collect()
    assert(rep2.forall(r => !r.getBoolean(2) && r.isNullAt(3) && r.isNullAt(4)))
  }

  test("table write with checksum: heap-bearing table verifies; reads back") {
    val dir = Files.createTempDirectory("fits-ck").toString + "/t"
    val long = "d" * 300 // forces a 1PA heap column alongside fixed ones
    val df = (0 until 120).map(i =>
      (i.toLong, if (i == 0) long else s"doc$i", (0 until i % 5).map(_.toDouble).toArray))
      .toDF("id", "text", "vec")
    df.coalesce(1).write.format("fits")
      .option("checksum", true).mode("append").save(dir)
    val part = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".fits")).head
    val sums = rawHduSums(part.toPath)
    assert(sums.length == 2 && sums.forall(FitsChecksum.verifies), sums)
    val rep = FitsChecksumReport.report(spark, dir).collect()
    assert(rep.length == 2 && rep.forall(r =>
      r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4)), rep.toSeq)
    val back = spark.read.format("fits").option("hdu", 1).load(dir)
    assert(back.count() == 120)
    assert(back.filter($"id" === 0L).head.getString(1) == long)
  }
}
