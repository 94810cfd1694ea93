package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SkewJoinSpec extends SparkTestBase {

  test("salted join equals plain join on a pathologically skewed key") {
    import spark.implicits._
    // 90% of the fact rows share one key
    val fact = (0 until 20000).map { i =>
      (if (i % 10 == 0) i.toLong % 100 else 7L, i.toLong)
    }.toDF("k", "v")
    val dim = (0L until 100L).map(k => (k, s"dim$k")).toDF("k", "name")

    val plain = fact.join(dim, Seq("k"))
      .agg(count(lit(1)), sum("v")).collect().head
    val saltedJ = SkewJoin.salted(fact, dim, "k", salts = 16)
      .agg(count(lit(1)), sum("v")).collect().head
    assert(saltedJ.getLong(0) == plain.getLong(0))
    assert(saltedJ.getLong(1) == plain.getLong(1))
  }

  test("salting handles keys absent from the small side (inner semantics)") {
    import spark.implicits._
    val fact = Seq((1L, "a"), (2L, "b"), (99L, "c")).toDF("k", "v")
    val dim = Seq((1L, "x"), (2L, "y")).toDF("k", "name")
    val out = SkewJoin.salted(fact, dim, "k", salts = 4)
      .select("k", "v", "name").collect()
    assert(out.length == 2)
    assert(!out.exists(_.getLong(0) == 99L))
  }
}
