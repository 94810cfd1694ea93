package graft

import org.apache.spark.sql.types.TimestampType

/** The resolved-table memo (r18 verdict ask #9): plan reuse per
  * (session, dir, name), so repeated Tables.load calls stop paying a
  * fresh file listing + footer read (~65-80 ms each, 200+ calls per
  * bench run). Nothing is computed or cached data-side.
  */
class TablesMemoSpec extends SparkTestBase {

  test("load returns the same resolved frame per (session, dir, name)") {
    val a = Tables.load(spark, sf0001, "lineitem")
    assert(Tables.load(spark, sf0001, "lineitem") eq a)
    // different dir → different entry (canary corpora must not collide)
    assert(!(Tables.load(spark, sf001, "lineitem") eq a))
  }

  test("events normalization survives the memo") {
    val e = Tables.load(spark, sf0001, "events")
    assert(e.schema("ts").dataType == TimestampType)
    assert(Tables.load(spark, sf0001, "events") eq e)
    // the raw probe frame is its own entry, pre-normalization
    val raw = Tables.eventsRaw(spark, sf0001)
    assert(Tables.eventsRaw(spark, sf0001) eq raw)
  }
}
