package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

import graft.SparkTestBase

/** Plan-shape regression tests: the properties that keep these queries
  * fast at 100 TB (scan pruning, filter pushdown, broadcast of small
  * dims, partial aggregation) must be visible in the physical plan —
  * not assumed.
  */
class PlanQualitySpec extends SparkTestBase {

  private def formatted(df: DataFrame): String = {
    df.collect() // let AQE finalize
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q02 filter pushes predicates into the parquet scan") {
    val plan = formatted(Relational.q02_filter(spark, sf0001))
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("GreaterThan(l_quantity,45"), plan)
  }

  test("q01 projection prunes the scan to 3 columns") {
    val plan = formatted(Relational.q01_project(spark, sf0001))
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") &&
      readSchema.contains("l_extendedprice") &&
      !readSchema.contains("l_shipdate"), readSchema)
  }

  test("q07 broadcasts the nation dimension") {
    val plan = formatted(Relational.q07_join(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q06 aggregation is partial (map-side) before the shuffle") {
    val plan = formatted(Relational.q06_groupby(spark, sf0001))
    assert(plan.contains("HashAggregate"), plan)
    // partial + final pair ⇒ at least two HashAggregate nodes
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan)
  }

  test("q10 top-k plans TakeOrderedAndProject, not a global sort") {
    val plan = formatted(Relational.q10_topk(spark, sf0001))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("pair generation is one aggregation + in-task explode — no " +
    "self-join of the postings/band table") {
    // r19 optimization round: the pair expansion is a per-key
    // aggregation into sorted doc lists plus a pipelined i<j explode
    // (guide §2.3/§2.4) — the postings table is shuffled ONCE. The r18
    // form self-joined it (planning the whole upstream pipeline twice,
    // once per aliased side) and needed a SHUFFLE_MERGE pin to keep AQE
    // from serializing the expansion on one task. This gate pins the
    // new shape in the EXECUTED (AQE-final) plan: the pair stream's
    // Generate is present, and no data-scale join machinery (sort-merge
    // / shuffled-hash) sneaks back in — the only joins left (per-doc
    // size/set attach) broadcast at this scale.
    Seq("dedup_ngram" -> Dedup.dedup_ngram,
      "dedup_simhash" -> Dedup.dedup_simhash,
      "dedup_minhash" -> Dedup.dedup_minhash).foreach { case (name, q) =>
      val df = q(spark, sf0001)
      df.collect() // let AQE finalize
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      withClue(s"$name: ") {
        assert(plan.contains("Generate"),
          s"pair stream lost its Generate:\n$plan")
        assert(!plan.contains("SortMergeJoin") &&
          !plan.contains("ShuffledHashJoin"),
          s"pair path re-grew a data-scale join:\n$plan")
      }
    }
  }

  test("sim_topk broadcasts the query set, never shuffles the corpus") {
    val plan = formatted(Similarity.sim_topk(spark, sf0001))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan)
  }

  test("every similarity ranking goes through the top-k heap, not a window funnel") {
    // row_number() OVER (PARTITION BY q_id) funnels the whole scored
    // set into |queries| reducer tasks — the TopKAgg partial aggregate
    // is the 100 TB-safe shape, and no sim query may regress to the funnel
    Seq("sim_topk" -> Similarity.sim_topk, "sim_lsh_topk" -> Similarity.sim_lsh_topk,
      "sim_ivf_topk" -> Similarity.sim_ivf_topk).foreach { case (name, q) =>
      val plan = q(spark, sf0001).queryExecution.executedPlan.toString
      withClue(s"$name: ") {
        assert(!plan.contains("Window"), plan)
        assert(plan.contains("ObjectHashAggregate") ||
          plan.contains("SortAggregate"), plan)
      }
    }
  }

  test("q27 bucketed join plans zero shuffle exchanges under the join") {
    // broadcast off: with it, exchange-freedom would be trivially true
    // and prove nothing about the bucketed layout
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val (lt, ot) = Relational.bucketedTables(spark, sf0001)
      val l = spark.table(lt)
      val o = spark.table(ot)
      val joined = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .select(l("l_orderkey"), o("o_orderpriority"))
      joined.collect() // let AQE finalize
      // AdaptiveSparkPlanExec is a leaf node — match the printed final
      // plan, not the tree (same convention as the other tests here)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("q29 funnel: both windows and the rollup share one user_id shuffle") {
    // the chained running-flag windows and the per-user aggregate all
    // partition on user_id — exactly one data-scale Exchange (hash on
    // user_id) plus the single-row final aggregate's exchange
    val df = Relational.q29_funnel(spark, sf0001)
    df.collect() // let AQE finalize
    // the adaptive plan string repeats the tree under "== Initial
    // Plan ==" — count only the final section
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.size == 2,
      s"expected exactly two exchanges:\n$plan")
    assert(exchanges.count(_.contains("hashpartitioning(user_id")) == 1,
      s"expected one user_id hash exchange:\n$plan")
    assert(exchanges.count(_.contains("SinglePartition")) == 1, plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("Join"), plan)
  }

  test("q30 retention: cohort window is sort-free whole-partition MIN") {
    // Window.partitionBy without orderBy must not plan a per-row
    // running sort beyond the partitioning requirement
    val plan = formatted(Relational.q30_retention(spark, sf0001))
    assert(plan.contains("Window"), plan)
    assert("HashAggregate".r.findAllIn(plan).length >= 2,
      s"cell counts must partial-aggregate:\n$plan")
  }

  test("q31 bloom prefilter: probe is map-side, verify join broadcasts") {
    val df = Relational.q31_bloom(spark, sf0001)
    df.collect() // let AQE finalize
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the sketch probe is a Filter over the fact scan (scalar subquery
    // bloom), and the exactness verify is a broadcast semi join — the
    // only Exchange is the deterministic output sort's range partition
    assert(plan.contains("BloomFilterMightContain") ||
      plan.contains("might_contain"), plan)
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftSemi"), plan)
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin"), plan)
    // permitted exchanges: the deterministic output sort's range
    // partition and the bloom aggregate's one-row SinglePartition
    // merge (inside the scalar subquery) — never a data-scale hash
    // exchange of the fact table
    val exchanges = plan.linesIterator
      .filter(l => l.contains("Exchange") && !l.contains("Broadcast")).toSeq
    assert(exchanges.forall(l =>
      l.contains("rangepartitioning") || l.contains("SinglePartition")),
      s"only the output sort and the sketch merge may shuffle:\n$plan")
  }

  test("mm codec pipelines are one shuffle-free pass (plus the output sort)") {
    // the decode/encode/feature work is mapPartitions over the scan —
    // the ONLY exchanges in the plan may be the deterministic orderBy's
    // range partition and, for the REAL-codec keys (PNG/JPEG), the
    // scale-adaptive Par.spread repartition that fans a single-task
    // tiny-SF scan out before the expensive decode (REPARTITION_BY_NUM
    // on doc_id; a no-op at production scan parallelism — r18
    // optimization round, measured: png 0.59→0.40 s at sf0.1)
    // only the REAL-codec key spreads; the plainDocs keys are
    // documented NOT to (the exchange costs more than the cheap
    // integer-byte map saves) — an accidental future spread there
    // must fail this gate, so the REPARTITION_BY_NUM allowance is
    // per-key, not loop-wide (r18 advice)
    Seq(("mm_features", Multimodal.mm_features, false),
      ("mm_png_features", Multimodal.mm_png_features, true),
      ("mm_wav_features", Multimodal.mm_wav_features, false)).foreach {
      case (name, q, maySpread) =>
        val df = q(spark, sf0001)
        df.collect() // let AQE finalize
        val plan = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head
        val exchanges = plan.linesIterator
          .filter(l => l.contains("Exchange") && !l.contains("Broadcast"))
          .toSeq
        withClue(s"$name: ") {
          assert(exchanges.forall(l =>
            l.contains("rangepartitioning") ||
              (maySpread && l.contains("REPARTITION_BY_NUM"))),
            s"only the output sort${if (maySpread) " and the spread" else ""} " +
              s"may shuffle:\n$plan")
          assert(!plan.contains("Join"), plan)
        }
    }
  }

  test("full-surface sweep: no cartesian, no unpartitioned window, " +
    "no undeclared nested-loop join, on any declared key") {
    // Every key in SparkEntry.queries — including ones no named test
    // above pins — is swept for the three plan shapes that cannot
    // survive a 100x scale-up:
    //   1. CartesianProduct (quadratic, always fatal);
    //   2. a Window whose partitionSpec is empty (the whole frame
    //      funnels through ONE task — all declared windows partition);
    //   3. BroadcastNestedLoopJoin outside the declared brute-force
    //      scorers (sim_topk / sim_topk_int8 broadcast a ~50-row query
    //      set against the corpus BY DESIGN, and the two recall audits
    //      embed sim_topk as their exact side; anywhere else a BNLJ
    //      means a join condition failed to plan as an equi/range join).
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    import org.apache.spark.sql.execution.window.WindowExec

    def sweep(p: SparkPlan): Seq[SparkPlan] =
      // children alone misses subquery plans (they hang off expressions
      // — e.g. q31_bloom's scalar-subquery sketch), so recurse into
      // p.subqueries too; AQE wraps its real plan as a leaf
      p +: (p.children ++ p.subqueries ++ (p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case _ => Nil
      })).flatMap(sweep)

    val bnljDeclared =
      // the sim_* keys broadcast the query side by design; q38 cross-
      // joins two SINGLE-ROW aggregates (metadata extent × scan count)
      Set("sim_topk", "sim_topk_int8", "sim_lsh_recall", "sim_ivf_recall",
        "q38_fits_extent")
    graft.SparkEntry.queries.foreach { case (name, q) =>
      val nodes = sweep(q(spark, sf0001).queryExecution.executedPlan)
      withClue(s"$name: ") {
        assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
          "plans a CartesianProduct")
        nodes.collect { case w: WindowExec => w }.foreach { w =>
          assert(w.partitionSpec.nonEmpty,
            s"unpartitioned Window (single-task funnel): $w")
        }
        if (!bnljDeclared(name))
          assert(!nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
            "plans an undeclared BroadcastNestedLoopJoin")
      }
    }
  }
}
