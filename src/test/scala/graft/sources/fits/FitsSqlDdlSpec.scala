package graft.sources.fits

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The pure-SQL entry path: catalog-managed FITS tables via
  * `CREATE TABLE ... USING fits`, read with plain SELECT (pushdowns
  * intact) and extended with INSERT INTO through the write builder —
  * the surface a SQL-only user (or a JDBC/Thrift client) touches. */
class FitsSqlDdlSpec extends SparkTestBase {
  import spark.implicits._

  private def scratch(tag: String): String =
    Files.createTempDirectory(s"fits-ddl-$tag").toString + "/t"

  test("CREATE TABLE USING fits + SELECT reads through the catalog") {
    val dir = scratch("read")
    spark.range(500).select($"id", ($"id" % 7).as("m"))
      .coalesce(2).write.format("fits").mode("overwrite").save(dir)
    spark.sql("DROP TABLE IF EXISTS fits_ddl_read")
    spark.sql(
      s"CREATE TABLE fits_ddl_read USING fits " +
        s"OPTIONS (hdu '1', path '$dir')")
    try {
      val n = spark.sql("SELECT count(*) FROM fits_ddl_read")
        .head.getLong(0)
      assert(n == 500)
      val s = spark.sql(
        "SELECT sum(id) AS s FROM fits_ddl_read WHERE m = 3")
        .head.getLong(0)
      assert(s == (0L until 500L).filter(_ % 7 == 3).sum)
      // metadata columns resolve through the catalog table too
      val files = spark.sql(
        "SELECT count(DISTINCT _file_path) FROM fits_ddl_read")
        .head.getLong(0)
      assert(files == 2)
    } finally spark.sql("DROP TABLE fits_ddl_read")
  }

  test("INSERT INTO a fits table appends part files") {
    val dir = scratch("insert")
    spark.range(100).select($"id", lit("a").as("tag"))
      .coalesce(1).write.format("fits").mode("overwrite").save(dir)
    spark.sql("DROP TABLE IF EXISTS fits_ddl_ins")
    spark.sql(
      s"CREATE TABLE fits_ddl_ins USING fits " +
        s"OPTIONS (hdu '1', path '$dir')")
    try {
      spark.sql(
        "INSERT INTO fits_ddl_ins SELECT id + 100 AS id, 'b' AS tag " +
          "FROM range(100)")
      val got = spark.sql(
        "SELECT tag, count(*) AS n, min(id) AS mn, max(id) AS mx " +
          "FROM fits_ddl_ins GROUP BY tag ORDER BY tag").collect()
      assert(got.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq ==
        Seq(("a", 100L, 0L, 99L), ("b", 100L, 100L, 199L)))
    } finally spark.sql("DROP TABLE fits_ddl_ins")
  }

  test("INSERT OVERWRITE replaces the table contents") {
    val dir = scratch("overwrite")
    spark.range(50).select($"id").coalesce(1)
      .write.format("fits").mode("overwrite").save(dir)
    spark.sql("DROP TABLE IF EXISTS fits_ddl_ow")
    spark.sql(
      s"CREATE TABLE fits_ddl_ow USING fits " +
        s"OPTIONS (hdu '1', path '$dir')")
    try {
      spark.sql(
        "INSERT OVERWRITE fits_ddl_ow SELECT id + 1000 AS id FROM range(20)")
      val got = spark.sql(
        "SELECT count(*) AS n, min(id) AS mn FROM fits_ddl_ow").head
      assert((got.getLong(0), got.getLong(1)) == (20L, 1000L))
    } finally spark.sql("DROP TABLE fits_ddl_ow")
  }
}
