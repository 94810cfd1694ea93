package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.classic.Strategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, BindReferences, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.DoubleType

import graft.functions.VecAlgo

/** Approximate cosine similarity join as a first-class operator:
  * logical node + planner strategy + physical shuffle plan (the (c)
  * option in SURVEY §2's preference order — used here because no
  * composition of built-ins yields a *deduplicated* LSH band join
  * without a wide Distinct).
  *
  * Semantics: emit each (left, right) pair whose vectors share ≥1
  * sign-LSH band (64-bit signature, 8 bands × 8 bits) AND whose exact
  * cosine ≥ threshold, exactly once, with the cosine appended as `sim`.
  * Approximate by design (band recall < 1); the user opts in through
  * [[ApproxCosineJoin.join]] — no silent rewrite of exact plans.
  *
  * Scale: both sides shuffle once on the band key (cogroup); a pair
  * colliding in several bands is emitted only at its *minimal* matching
  * band — deduplication without global state or a wide Distinct.
  */
final case class ApproxCosineJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftVec: Expression,
    rightVec: Expression,
    threshold: Double,
    // constructor field so copy() keeps the exprId stable across
    // transformUp/withNewChildren — a fresh id would orphan upstream refs
    simAttr: AttributeReference =
      AttributeReference("sim", DoubleType, nullable = false)())
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output :+ simAttr
  // sim is generated here, not read from children
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(simAttr)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

object ApproxCosineJoinStrategy extends Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: ApproxCosineJoinNode =>
      ApproxCosineJoinExec(planLater(n.left), planLater(n.right),
        n.leftVec, n.rightVec, n.threshold, n.output) :: Nil
    case _ => Nil
  }
}

final case class ApproxCosineJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftVec: Expression,
    rightVec: Expression,
    threshold: Double,
    output: Seq[Attribute])
    extends BinaryExecNode {

  private val NBits = 64
  private val Bands = 8
  private val BitsPerBand = NBits / Bands

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  @inline private def bandVal(sig: Long, b: Int): Int =
    ((sig >>> (b * BitsPerBand)) & ((1 << BitsPerBand) - 1)).toInt

  /** (band index, band value) keys for one signature. */
  private def keysOf(sig: Long): Array[(Int, Int)] =
    Array.tabulate(Bands)(b => (b, bandVal(sig, b)))

  /** Minimal band index on which two signatures collide, or -1. */
  private def minMatchingBand(a: Long, b: Long): Int = {
    var i = 0
    while (i < Bands) {
      if (bandVal(a, i) == bandVal(b, i)) return i
      i += 1
    }
    -1
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val lSchema = left.schema
    val rSchema = right.schema
    val lBound = BindReferences.bindReference(leftVec, left.output)
    val rBound = BindReferences.bindReference(rightVec, right.output)
    val t = threshold

    def keyed(plan: SparkPlan, bound: Expression): RDD[((Int, Int), (InternalRow, Long, ArrayData))] =
      plan.execute().mapPartitions { it =>
        it.flatMap { row =>
          val v = bound.eval(row)
          if (v == null) Iterator.empty
          else {
            val arr = v.asInstanceOf[ArrayData]
            val sig = VecAlgo.signSignature(arr, NBits)
            val copied = row.copy()
            // copy the vector out of the reused row buffer too
            val vecCopy = arr.copy()
            keysOf(sig).iterator.map(k => (k, (copied, sig, vecCopy)))
          }
        }
      }

    var lk = keyed(left, lBound)
    var rk = keyed(right, rBound)
    // Hot-bucket guard: a band bucket of f rows on both sides is an f²
    // all-pairs loop AND an f-row in-memory cogroup buffer — one
    // degenerate band value (all-identical boilerplate vectors) owns
    // the whole job at scale. DEFAULT-ON at 1M — far above any
    // legitimate near-dup bucket and a no-op at test scale, so oracled
    // outputs stay exact while a degenerate corpus cannot own the job.
    // Two mechanisms by how the cap was set (mirroring the dedup
    // layer's candidatesFromBands): the DEFAULT cap is enforced inside
    // the cogroup with an O(1) size check per bucket — no extra job
    // (cogroup's spillable buffers bound memory; the f² LOOP is what
    // the check skips). An EXPLICITLY configured cap pre-filters hot
    // buckets before the shuffle with a logged drop count — you set a
    // knob, you get told what it did. `=0` disables both.
    val explicitCap = Option(
      conf.getConfString("spark.graft.lsh.maxBucket", null)).map(_.toLong)
    val cap: Long = explicitCap.getOrElse(1000000L)
    explicitCap.filter(_ > 0).foreach { c =>
        def hotKeys(rdd: RDD[((Int, Int), (InternalRow, Long, ArrayData))]) =
          rdd.map(kv => (kv._1, 1L)).reduceByKey(_ + _)
            .filter(_._2 > c).keys
        val hot = (hotKeys(lk) ++ hotKeys(rk)).distinct().collect().toSet
        if (hot.nonEmpty) {
          System.err.println(s"[graft] ApproxCosineJoinExec: maxBucket=$c " +
            s"dropped ${hot.size} hot band buckets")
          val hotB = lk.sparkContext.broadcast(hot)
          lk = lk.filter(kv => !hotB.value(kv._1))
          rk = rk.filter(kv => !hotB.value(kv._1))
        }
      }
    // default-path skips must be visible: named accumulator + job-end log
    val skippedBuckets = graft.util.GuardMetrics.loggedAccumulator(
      sparkContext, "graft.approxCosineJoin.guardSkippedBuckets") { v =>
      s"[graft] ApproxCosineJoinExec: hot-bucket guard skipped $v " +
        s"degenerate band buckets (over $cap rows on a side; set " +
        "spark.graft.lsh.maxBucket to pre-filter with audited drops)"
    }
    lk.cogroup(rk).flatMap {
      case ((band, _), (ls, rs)) =>
        if (ls.isEmpty || rs.isEmpty) Iterator.empty
        else if (cap > 0 && (ls.size > cap || rs.size > cap)) {
          skippedBuckets.add(1L)
          Iterator.empty // degenerate bucket: skip the f² loop entirely
        }
        else for {
          (lRow, lSig, lVec) <- ls.iterator
          (rRow, rSig, rVec) <- rs.iterator
          // emit only at the minimal matching band → exactly-once pairs
          if minMatchingBand(lSig, rSig) == band
          sim = VecAlgo.cosine(lVec, rVec)
          if sim >= t
        } yield {
          val values = new Array[Any](lSchema.length + rSchema.length + 1)
          var i = 0
          while (i < lSchema.length) {
            values(i) = lRow.get(i, lSchema(i).dataType); i += 1
          }
          var j = 0
          while (j < rSchema.length) {
            values(i + j) = rRow.get(j, rSchema(j).dataType); j += 1
          }
          values(values.length - 1) = sim
          new GenericInternalRow(values): InternalRow
        }
    }
  }
}

/** User-facing API + extension registration. */
object ApproxCosineJoin {

  /** `left ⋈_{cos(lv, rv) ≥ t}` approximate join (see class doc).
    * Vector columns are named so they resolve against each side's own
    * analyzed output — the node is born fully resolved. */
  def join(left: DataFrame, right: DataFrame,
      leftVecCol: String, rightVecCol: String,
      threshold: Double): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lPlan = org.apache.spark.sql.graftx.Bridge.logicalPlan(left)
    val rPlan = org.apache.spark.sql.graftx.Bridge.logicalPlan(right)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(throw new IllegalArgumentException(
        s"Column '$name' not found in ${p.output.map(_.name).mkString(", ")}"))
    val node = ApproxCosineJoinNode(lPlan, rPlan,
      attr(lPlan, leftVecCol), attr(rPlan, rightVecCol), threshold)
    org.apache.spark.sql.graftx.Bridge.ofRows(spark, node)
  }

  private def ensureStrategy(spark: SparkSession): Unit = {
    val es = spark.experimental.extraStrategies
    if (!es.contains(ApproxCosineJoinStrategy))
      spark.experimental.extraStrategies = es :+ ApproxCosineJoinStrategy
  }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` registration. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectPlannerStrategy(_ => ApproxCosineJoinStrategy)
}
