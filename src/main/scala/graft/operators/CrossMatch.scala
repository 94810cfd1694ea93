package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Sky cross-match — THE spatial primitive of survey astronomy (the
  * reference's ecosystem pairs its FITS source with exactly this kind
  * of catalog matching): all pairs (a, b) within `radiusDeg` great-
  * circle degrees.
  *
  * Algorithm: the Zones method (Gray, Nieto-Santisteban & Szalay,
  * "The Zones Algorithm for Finding Points-Near-a-Point or
  * Cross-Matching Spatial Datasets", MSR-TR-2006-52) re-expressed as a
  * Spark equi-join:
  *
  *  - zone  = floor(dec / radius): any pair within the radius differs
  *    by at most one zone, so replicating ONE side to zone−1/zone/zone+1
  *    turns the dec constraint into an equi-key.
  *  - ra band = floor(ra / bandWidth_z) with a PER-ZONE band width, so
  *    the method covers the full sky including the poles. The width is
  *    the exact spherical Δra bound: from the haversine identity,
  *    sin(Δra/2) ≤ sin(sep/2)/√(cos d₁·cos d₂), so any pair within r
  *    whose declinations stay inside the zone's 3-zone neighborhood
  *    satisfies Δra ≤ 2·asin(sin(r/2)/cos(decMax_z)). (The planar bound
  *    r/cos(decMax) is SMALLER than this — it only worked under the old
  *    81° cap because floor(360/width) left incidental slack.) Bands
  *    are joined modulo nBands_z, handling the 0°/360° wrap with no
  *    special cases; zones whose neighborhood touches the pole
  *    (cos(decMax) ≤ sin(r/2)) collapse to a single band — the cap
  *    around a pole spans all RA, and polar zones hold few points
  *    (area ∝ cos dec), so the single-band key is not a skew risk.
  *  - candidates = equi-join on (zone, band) → exact haversine filter.
  *
  * Scale shape: ONE shuffle on a composite key of
  * ~(180/r)·(360/bandWidth) values (~9000 at r=1° — enough keys for
  * thousands of reducers), the small side replicated ≤9× (3 zones ×
  * ≤3 distinct bands), no theta-join, no cartesian anywhere. This is
  * the same shape the dedup family uses: banded equi-candidates +
  * exact verify.
  */
object CrossMatch {

  /** Great-circle separation in degrees (haversine — numerically stable
    * at small angles, which is where cross-match radii live). */
  def sepDeg(ra1: Column, dec1: Column, ra2: Column, dec2: Column): Column =
    degrees(lit(2) * asin(sqrt(
      pow(sin(radians(dec2 - dec1) / 2), 2) +
        cos(radians(dec1)) * cos(radians(dec2)) *
        pow(sin(radians(ra2 - ra1) / 2), 2))))

  /** All (a, b) pairs within `radiusDeg`. Column names must be disjoint
    * apart from the coordinate arguments; output carries both sides'
    * columns plus `sep` (degrees). */
  def zoneMatch(a: DataFrame, b: DataFrame, raA: String, decA: String,
      raB: String, decB: String, radiusDeg: Double): DataFrame = {
    require(radiusDeg > 0 && radiusDeg <= 10,
      s"cross-match radius $radiusDeg° outside the sane (0, 10°] range")
    val r = radiusDeg
    // the largest |dec| reachable by a pair whose join key lands in
    // zone z: one point lies in zones z−1..z+1 (the replication
    // neighborhood), i.e. dec ∈ [(z−1)·r, (z+2)·r)
    def decMaxOf(z: Column): Column =
      least(lit(90.0), greatest(abs((z - 1) * r), abs((z + 2) * r)))
    // per-zone band count from the exact spherical Δra bound; the
    // effective width 360/nBands ≥ w_z keeps the ±1-band guarantee
    // with no reliance on floor() slack
    def nBandsOf(z: Column): Column = {
      val s = sin(radians(lit(r)) / 2) / cos(radians(decMaxOf(z)))
      when(s >= 1, lit(1L)).otherwise(greatest(lit(1L),
        floor(lit(360.0) / degrees(lit(2) * asin(s))).cast("long")))
    }
    def zone(dec: Column): Column = floor(dec / r)
    def bandOf(ra: Column, z: Column): Column =
      pmod(floor(ra / (lit(360.0) / nBandsOf(z))), nBandsOf(z)).cast("long")
    val ak = a.withColumn("_zone", zone(col(decA)))
      .withColumn("_band", bandOf(col(raA), col("_zone")))
    // replicate the (smaller) b side to the 3-zone neighborhood, each
    // replica banded in ITS key zone's grid; array_distinct keeps the
    // small-band zones (nBands ≤ 2 near the poles) duplicate-free
    val bk = b
      .withColumn("_zone", explode(array(
        zone(col(decB)) - 1, zone(col(decB)), zone(col(decB)) + 1)))
      .withColumn("_band", explode(array_distinct(array(
        pmod(bandOf(col(raB), col("_zone")) - 1, nBandsOf(col("_zone"))),
        bandOf(col(raB), col("_zone")),
        pmod(bandOf(col(raB), col("_zone")) + 1, nBandsOf(col("_zone")))))))
    ak.join(bk, Seq("_zone", "_band"))
      .drop("_zone", "_band")
      .withColumn("sep", sepDeg(col(raA), col(decA), col(raB), col(decB)))
      .filter(col("sep") <= radiusDeg)
  }

  // ------------------------------------------------------ driver query

  /** Deterministic synthetic catalogs: coordinates derived from integer
    * keys with the SAME arithmetic on the Spark and DuckDB sides
    * (exact: integer multiply/mod, then one exact decimal divide). */
  private def catalogs(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val cust = Tables.load(s, dir, "customer")
      .select(col("c_custkey").as("a_id"),
        (col("c_custkey") * 137 % 3600 / 10.0).as("a_ra"),
        ((col("c_custkey") * 241 % 1600) / 10.0 - 80.0).as("a_dec"))
    val supp = Tables.load(s, dir, "supplier")
      .select(col("s_suppkey").as("b_id"),
        (col("s_suppkey") * 389 % 3600 / 10.0).as("b_ra"),
        ((col("s_suppkey") * 523 % 1600) / 10.0 - 80.0).as("b_dec"))
    (cust, supp)
  }

  type Q = (SparkSession, String) => DataFrame

  /** 1° cross-match of the two derived catalogs, oracled against
    * DuckDB's brute-force theta join — hash equality proves the zone
    * candidates lose no pair and the exact filter adds none. */
  val q26_crossmatch: Q = (s, dir) => {
    val (a, b) = catalogs(s, dir)
    zoneMatch(a, b, "a_ra", "a_dec", "b_ra", "b_dec", 1.0)
      .select(col("a_id"), col("b_id"), round(col("sep"), 6).as("sep"))
      .orderBy(col("a_id"), col("b_id"))
  }

  val queries: Map[String, Q] = Map("q26_crossmatch" -> q26_crossmatch)

  val oracles: Map[String, String] = Map(
    "q26_crossmatch" ->
      """WITH a AS (SELECT c_custkey AS a_id,
        |    (c_custkey * 137) % 3600 / 10.0 AS a_ra,
        |    ((c_custkey * 241) % 1600) / 10.0 - 80.0 AS a_dec
        |  FROM customer),
        |b AS (SELECT s_suppkey AS b_id,
        |    (s_suppkey * 389) % 3600 / 10.0 AS b_ra,
        |    ((s_suppkey * 523) % 1600) / 10.0 - 80.0 AS b_dec
        |  FROM supplier)
        |SELECT a_id, b_id,
        |  ROUND(DEGREES(2 * ASIN(SQRT(
        |    POW(SIN(RADIANS(b_dec - a_dec) / 2), 2) +
        |    COS(RADIANS(a_dec)) * COS(RADIANS(b_dec)) *
        |    POW(SIN(RADIANS(b_ra - a_ra) / 2), 2)))), 6) AS sep
        |FROM a, b
        |WHERE DEGREES(2 * ASIN(SQRT(
        |    POW(SIN(RADIANS(b_dec - a_dec) / 2), 2) +
        |    COS(RADIANS(a_dec)) * COS(RADIANS(b_dec)) *
        |    POW(SIN(RADIANS(b_ra - a_ra) / 2), 2)))) <= 1.0
        |ORDER BY a_id, b_id""".stripMargin)
}
