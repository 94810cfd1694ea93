package graft.functions

import scala.util.Random

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SimSignatureSpec extends SparkTestBase {

  private def arr(v: Array[Float]): ArrayData =
    ArrayData.toArrayData(v)

  test("words signature: 64-bit prefix matches the Long signature") {
    // dedup_embed's Hamming prefilter threshold is tuned on the 64-bit
    // prefix; widening geometry must only APPEND bits, never re-derive
    val rnd = new Random(3)
    (0 until 20).foreach { _ =>
      val v = Array.fill(48)(rnd.nextGaussian().toFloat)
      val long64 = VecAlgo.signSignature(arr(v), 64)
      for (nBits <- Seq(64, 80, 128, 192)) {
        val words = VecAlgo.signSignatureWords(arr(v), nBits)
        assert(words(0) == long64, s"prefix mismatch at nBits=$nBits")
        assert(words.length == (nBits + 63) / 64)
      }
    }
  }

  test("words signature bits beyond 64 use fresh hyperplanes") {
    val rnd = new Random(4)
    val v = arr(Array.fill(48)(rnd.nextGaussian().toFloat))
    val w = VecAlgo.signSignatureWords(v, 128)
    // word 1 is not a copy of word 0 (different hyperplane set)
    assert(w(1) != w(0))
  }

  test("sim_signature_words expression matches the kernel; codegen path") {
    import spark.implicits._
    val rnd = new Random(5)
    val vecs = (0 until 10).map(i =>
      (i.toLong, Array.fill(32)(rnd.nextGaussian().toFloat)))
    val df = vecs.toDF("id", "v")
      .select(col("id"), VectorFunctions.sim_signature_words(col("v"), 128).as("sw"),
        VectorFunctions.sim_signature(col("v"), 64).as("s64"))
    df.collect().foreach { r =>
      val words = r.getSeq[Long](1)
      assert(words.length == 2)
      assert(words.head == r.getLong(2), "SQL-side prefix compatibility")
    }
  }

  test("sim_signature_words is callable from SQL text") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq((1L, Array(1f, 2f, 3f))).toDF("id", "v").createOrReplaceTempView("sswv")
    val row = spark.sql(
      "SELECT sim_signature_words(v, 128) AS sw, sim_signature(v, 64) AS s64 " +
        "FROM sswv").collect().head
    assert(row.getSeq[Long](0).length == 2)
    assert(row.getSeq[Long](0).head == row.getLong(1))
  }

  test("near-identical vectors agree on almost all signature bits") {
    val rnd = new Random(6)
    val a = Array.fill(64)(rnd.nextGaussian().toFloat)
    val b = a.map(x => x + 0.001f * rnd.nextGaussian().toFloat)
    val wa = VecAlgo.signSignatureWords(arr(a), 192)
    val wb = VecAlgo.signSignatureWords(arr(b), 192)
    val hamming = wa.zip(wb)
      .map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
    assert(hamming <= 4, s"near-dup Hamming over 192 bits was $hamming")
  }
}
