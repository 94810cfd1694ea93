package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Zones cross-match: exact equivalence to brute force (the zone/band
  * candidates lose no pair), RA wrap-around, and plan shape. */
class CrossMatchSpec extends SparkTestBase {

  import spark.implicits._

  private def randomCatalog(n: Int, seed: Long, prefix: String) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      (i.toLong, rnd.nextDouble() * 360.0, rnd.nextDouble() * 160.0 - 80.0)
    }.toDF(s"${prefix}_id", s"${prefix}_ra", s"${prefix}_dec")
  }

  private def bruteForce(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame, r: Double) =
    a.crossJoin(b)
      .withColumn("sep", CrossMatch.sepDeg(
        col("a_ra"), col("a_dec"), col("b_ra"), col("b_dec")))
      .filter(col("sep") <= r)
      .select(col("a_id"), col("b_id"))

  test("zoneMatch equals brute force on random catalogs (r = 1.5°)") {
    val a = randomCatalog(800, 1, "a")
    val b = randomCatalog(400, 2, "b")
    val got = CrossMatch.zoneMatch(a, b, "a_ra", "a_dec", "b_ra", "b_dec", 1.5)
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = bruteForce(a, b, 1.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty, "degenerate test: no matching pairs")
    assert(got == want)
  }

  test("RA wrap-around: pairs straddling 0°/360° match") {
    val a = Seq((1L, 359.95, 10.0), (2L, 0.02, -40.0), (3L, 180.0, 0.0))
      .toDF("a_id", "a_ra", "a_dec")
    val b = Seq((10L, 0.05, 10.0), (20L, 359.9, -40.0), (30L, 179.05, 0.0))
      .toDF("b_id", "b_ra", "b_dec")
    val got = CrossMatch.zoneMatch(a, b, "a_ra", "a_dec", "b_ra", "b_dec", 1.0)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // (1,10): Δra = 0.1° across the wrap at dec 10 → ~0.098° sep; match.
    // (2,20): Δra = 0.12° across the wrap at dec −40 → ~0.092°; match.
    // (3,30): 0.95° apart on the equator, no wrap; match.
    assert(got == Set((1L, 10L), (2L, 20L), (3L, 30L)))
  }

  test("duplicate-free: a pair is emitted exactly once despite 9× bands") {
    val a = Seq((1L, 10.0, 10.0)).toDF("a_id", "a_ra", "a_dec")
    val b = Seq((10L, 10.1, 10.1)).toDF("b_id", "b_ra", "b_dec")
    val rows = CrossMatch.zoneMatch(a, b, "a_ra", "a_dec", "b_ra", "b_dec", 1.0)
      .collect()
    assert(rows.length == 1)
  }

  test("plan: equi-join on (zone, band), no cartesian, no theta join") {
    val a = randomCatalog(50, 3, "a")
    val b = randomCatalog(50, 4, "b")
    val plan = CrossMatch.zoneMatch(a, b, "a_ra", "a_dec", "b_ra", "b_dec", 1.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
  }
}
