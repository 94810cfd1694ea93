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

  test("full sky: zoneMatch equals brute force with polar points (r = 2°)") {
    // uniform dec in [-90, 90] deliberately overweights the caps —
    // exactly where the old fixed-width banding (|dec| <= 81° envelope)
    // silently lost pairs
    def fullSky(n: Int, seed: Long, prefix: String) = {
      val rnd = new scala.util.Random(seed)
      (0 until n).map { i =>
        (i.toLong, rnd.nextDouble() * 360.0, rnd.nextDouble() * 180.0 - 90.0)
      }.toDF(s"${prefix}_id", s"${prefix}_ra", s"${prefix}_dec")
    }
    val a = fullSky(600, 11, "a")
    val b = fullSky(300, 12, "b")
    val got = CrossMatch.zoneMatch(a, b, "a_ra", "a_dec", "b_ra", "b_dec", 2.0)
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = bruteForce(a, b, 2.0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty, "degenerate test: no matching pairs")
    assert(got == want)
  }

  test("polar cap: RA-opposite near-pole pairs match (old cap missed them)") {
    // at dec 89.7° two points 180° apart in RA are only 0.6° apart on
    // the sphere; a fixed band grid puts them ~28 bands apart
    val a = Seq((1L, 0.0, 89.7), (2L, 90.0, -89.9), (3L, 45.0, 89.0))
      .toDF("a_id", "a_ra", "a_dec")
    val b = Seq((10L, 180.0, 89.7), (20L, 271.0, -89.85), (30L, 48.0, 89.05))
      .toDF("b_id", "b_ra", "b_dec")
    val got = CrossMatch.zoneMatch(a, b, "a_ra", "a_dec", "b_ra", "b_dec", 1.0)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // (1,10): both dec 89.7, Δra 180° → sep = 0.6°; match.
    // (2,20): Δra 181° at dec ≈ −89.9 → sep ≈ 0.25°; match.
    // (3,30): Δra 3° at dec 89 → sep ≈ 0.07°; match.
    // (1,30): Δra 48° but both within 1° of the pole → sep ≈ 0.78°; a
    // genuinely-matching pair the old 81°-cap grid could never emit.
    assert(got == Set((1L, 10L), (2L, 20L), (3L, 30L), (1L, 30L)))
    // exact poles themselves are well-defined (dec = ±90)
    val ap = Seq((5L, 123.0, 90.0)).toDF("a_id", "a_ra", "a_dec")
    val bp = Seq((50L, 300.0, 89.5)).toDF("b_id", "b_ra", "b_dec")
    val polar = CrossMatch.zoneMatch(ap, bp, "a_ra", "a_dec", "b_ra", "b_dec", 1.0)
      .collect()
    assert(polar.length == 1 && polar.head.getDouble(polar.head.length - 1) <= 1.0)
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
