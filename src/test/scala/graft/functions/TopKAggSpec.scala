package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** TopKBuffer (k-heap) + TopKAgg: the per-key top-k aggregate that
  * replaces the row_number window funnel in the similarity queries. */
class TopKAggSpec extends SparkTestBase {

  private def pairsOf(b: TopKBuffer): Seq[(Double, Long)] = b.sortedPairs.toSeq

  test("TopKBuffer keeps the k best under (score desc, id asc)") {
    val b = new TopKBuffer(3)
    Seq((0.1, 10L), (0.9, 20L), (0.5, 30L), (0.7, 40L), (0.2, 50L))
      .foreach { case (s, i) => b.insert(s, i) }
    assert(pairsOf(b) == Seq((0.9, 20L), (0.7, 40L), (0.5, 30L)))
  }

  test("TopKBuffer k=1 tracks the single best element") {
    val b = new TopKBuffer(1)
    Seq((0.3, 3L), (0.8, 8L), (0.5, 5L)).foreach { case (s, i) => b.insert(s, i) }
    assert(pairsOf(b) == Seq((0.8, 8L)))
  }

  test("TopKBuffer ties break on smaller id — insertion order irrelevant") {
    val elems = Seq((0.5, 7L), (0.5, 3L), (0.5, 9L), (0.5, 1L), (0.5, 5L))
    for (perm <- elems.permutations.take(24)) {
      val b = new TopKBuffer(3)
      perm.foreach { case (s, i) => b.insert(s, i) }
      assert(pairsOf(b) == Seq((0.5, 1L), (0.5, 3L), (0.5, 5L)),
        s"order ${perm.mkString(",")}")
    }
  }

  test("TopKBuffer merge of disjoint buffers equals insert-all") {
    val all = (1 to 20).map(i => (i / 20.0, i.toLong))
    val (l, r) = all.splitAt(10)
    val agg = TopKAgg(org.apache.spark.sql.graftx.Bridge.expression(lit(0.0)),
      org.apache.spark.sql.graftx.Bridge.expression(lit(0L)), 5)
    val bl = new TopKBuffer(5); l.foreach { case (s, i) => bl.insert(s, i) }
    val br = new TopKBuffer(5); r.foreach { case (s, i) => br.insert(s, i) }
    val merged = agg.merge(bl, br)
    val direct = new TopKBuffer(5); all.foreach { case (s, i) => direct.insert(s, i) }
    assert(pairsOf(merged) == pairsOf(direct))
    assert(pairsOf(merged).map(_._2) == Seq(20L, 19L, 18L, 17L, 16L))
  }

  test("TopKAgg serialize/deserialize round-trips, including partial buffers") {
    val agg = TopKAgg(org.apache.spark.sql.graftx.Bridge.expression(lit(0.0)),
      org.apache.spark.sql.graftx.Bridge.expression(lit(0L)), 5)
    val b = new TopKBuffer(5)
    Seq((0.9, 1L), (0.1, 2L), (0.4, 3L)).foreach { case (s, i) => b.insert(s, i) }
    assert(pairsOf(agg.deserialize(agg.serialize(b))) == pairsOf(b))
    val empty = new TopKBuffer(5)
    assert(pairsOf(agg.deserialize(agg.serialize(empty))).isEmpty)
  }

  test("topk_agg matches row_number window semantics on a grouped frame") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (1 to 500).map(i =>
      (i % 7L, rnd.nextDouble(), i.toLong)).toDF("q_id", "sim", "neighbor_id")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    val viaWindow = df.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .select(col("q_id"), col("rnk"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val viaAgg = df.groupBy(col("q_id"))
      .agg(VectorFunctions.topk_agg(col("sim"), col("neighbor_id"), 10).as("tk"))
      .select(col("q_id"), posexplode(col("tk")))
      .select(col("q_id"), (col("pos") + 1).as("rnk"),
        col("col.neighbor_id").as("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaAgg == viaWindow)
  }

  test("topk_agg drops NaN scores instead of wedging the heap") {
    import spark.implicits._
    val df = Seq(
      (1L, Double.NaN, 100L), (1L, 0.2, 2L), (1L, Double.NaN, 101L),
      (1L, 0.9, 9L), (1L, 0.5, 5L)).toDF("q_id", "sim", "neighbor_id")
    val got = df.groupBy(col("q_id"))
      .agg(VectorFunctions.topk_agg(col("sim"), col("neighbor_id"), 2).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.neighbor_id")).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(9L, 5L))
  }

  test("topk_agg coerces float scores / int ids at analysis time") {
    import spark.implicits._
    val df = Seq((1L, 0.5f, 3), (1L, 0.9f, 4)).toDF("q_id", "sim", "neighbor_id")
    val got = df.groupBy(col("q_id"))
      .agg(VectorFunctions.topk_agg(col("sim"), col("neighbor_id"), 1).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.neighbor_id")).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(4L))
  }

  test("custom functions are callable from SQL after register()") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq((1L, 0.9, 10L), (1L, 0.5, 5L), (1L, 0.7, 7L))
      .toDF("q", "sim", "id").createOrReplaceTempView("scored_sql_test")
    val top = spark.sql(
      "SELECT q, topk_agg(sim, id, 2) AS tk FROM scored_sql_test GROUP BY q")
      .selectExpr("explode(tk.neighbor_id) AS n")
      .collect().map(_.getLong(0)).toSeq
    assert(top == Seq(10L, 7L))
    val cos = spark.sql(
      "SELECT cosine_sim(array(1.0F,0.0F), array(1.0F,0.0F)) AS c")
      .head().getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)
    val ng = spark.sql(
      "SELECT size(word_ngram_hashes('a b c', 2)) AS n").head().getInt(0)
    assert(ng == 2)
  }

  test("sim_topk plan uses the partial-agg heap, not a window funnel") {
    val plan = graft.operators.Similarity.sim_topk(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window funnel still in plan:\n$plan")
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"no object aggregate in plan:\n$plan")
  }
}
