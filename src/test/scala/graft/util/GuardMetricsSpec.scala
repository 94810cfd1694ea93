package graft.util

import graft.SparkTestBase

/** Guard-drop observability: named accumulator shared per (context,
  * name), incremented from tasks, visible on the driver. */
class GuardMetricsSpec extends SparkTestBase {

  test("loggedAccumulator is one instance per name and counts task adds") {
    val sc = spark.sparkContext
    val a = GuardMetrics.loggedAccumulator(sc, "graft.test.guard")(v =>
      s"[graft] test guard dropped $v")
    val b = GuardMetrics.loggedAccumulator(sc, "graft.test.guard")(v =>
      s"[graft] test guard dropped $v")
    assert(a eq b) // same session+name → same accumulator, one listener
    val c = GuardMetrics.loggedAccumulator(sc, "graft.test.other")(v => "")
    assert(!(a eq c))
    spark.range(0, 100, 1, 4).rdd.foreach(_ => a.add(1L))
    assert(a.value == 100L)
    assert(a.name.contains("graft.test.guard")) // named → shows in the UI
  }
}
