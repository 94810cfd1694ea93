package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types._

/** Cosine similarity of two ArrayType(FloatType) columns — a native
  * binary expression generating a static call (no UDF boxing in the
  * similarity-join hot path). */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecAlgo.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VecAlgo.cosine($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "cosine_sim"
}

/** Sign-LSH signature (random hyperplanes) of a float vector → Long. */
case class SimSignature(child: Expression, nBits: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    VecAlgo.signSignature(v.asInstanceOf[ArrayData], nBits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VecAlgo.signSignature($c, $nBits)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "sim_signature"
}

/** [[SimSignature]] for widths beyond 64 bits → ArrayType(LongType),
  * bit k in word k/64. Words(0) equals sim_signature(v, 64) — same
  * hyperplanes — so Hamming prefilters tuned on the 64-bit prefix stay
  * valid when band geometry widens. */
case class SimSignatureWords(child: Expression, nBits: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      VecAlgo.signSignatureWords(v.asInstanceOf[ArrayData], nBits))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => "new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VecAlgo.signSignatureWords($c, $nBits))")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "sim_signature_words"
}

/** MinHash sketch as a TypedImperativeAggregate (SURVEY §2 north-star:
  * custom sketch aggregates belong at this layer, not as UDAF wrappers).
  *
  * Input: a 64-bit element hash (e.g. xxhash64 of a shingle). Buffer:
  * one running minimum per hash function; h_i(x) = fmix64(x ⊕ seed_i).
  * Output: ArrayType(LongType) signature of length `numHashes`.
  * P[min_i(A) == min_i(B)] = Jaccard(A, B), so signature agreement
  * estimates Jaccard and banding the signature gives LSH candidates.
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => TextAlgo.fmix64(0x5851f42d4c957f2dL + i))

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        val h = TextAlgo.fmix64(x ^ seeds(i))
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (other(i) < buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * numHashes)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(offset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinHashAgg =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "minhash_agg"
}

/** Fixed-size top-k buffer: a binary min-heap whose root is the WORST
  * kept element under (score desc, id asc) ordering, so an incoming
  * element either beats the root (replace + sift down) or is dropped in
  * O(1). Memory is exactly k pairs regardless of input size. */
final class TopKBuffer(val k: Int) extends Serializable {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  // a is worse than b under (score desc, id asc); java.lang.Double
  // .compare gives a TOTAL order (-0.0 < 0.0, NaN greatest) so no
  // element can wedge the heap — NaN scores are additionally filtered
  // out before insert by TopKAgg.update (cosine of a zero vector)
  @inline private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean = {
    val c = java.lang.Double.compare(sa, sb)
    c < 0 || (c == 0 && ia > ib)
  }

  def insert(s: Double, id: Long): Unit = {
    if (size < k) {
      var i = size
      scores(i) = s; ids(i) = id; size += 1
      // sift up: parent must be worse-or-equal than child
      while (i > 0 && worse(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var w = i
        if (l < size && worse(scores(l), ids(l), scores(w), ids(w))) w = l
        if (r < size && worse(scores(r), ids(r), scores(w), ids(w))) w = r
        if (w == i) done = true else { swap(i, w); i = w }
      }
    }
  }

  @inline private def swap(i: Int, j: Int): Unit = {
    val ts = scores(i); scores(i) = scores(j); scores(j) = ts
    val ti = ids(i); ids(i) = ids(j); ids(j) = ti
  }

  /** (score, id) pairs best-first: score desc, id asc. */
  def sortedPairs: Array[(Double, Long)] =
    (0 until size).map(i => (scores(i), ids(i))).toArray
      .sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
}

/** Per-key top-k as a TypedImperativeAggregate (SURVEY north-star: the
  * scale-correct alternative to `row_number() OVER (PARTITION BY key)`
  * for top-k ranking).
  *
  * A window funnels the ENTIRE scored set into |keys| reducer
  * partitions — with 5 query vectors over a 100 TB corpus that is n×5
  * rows through 5 tasks. As an aggregate, the partial (map-side) phase
  * keeps a k-element heap per key per task, so the exchange carries
  * only tasks × keys × k buffered pairs and the final merge per key is
  * O(tasks × k log k). Output: struct(neighbor_id, sim) array, best
  * first under (sim desc, id asc).
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer]
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  // mis-typed inputs (FloatType score, IntegerType id) coerce at
  // analysis time instead of ClassCastException-ing in executors.
  // (return type inferred: AbstractDataType is private[sql] in Spark 4)
  override def inputTypes = Seq(DoubleType, LongType)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    // NaN (cosine of a zero vector) carries no ranking information and
    // under any non-total order can wedge the heap root — drop it here
    if (s != null && i != null && !java.lang.Double.isNaN(s.asInstanceOf[Double]))
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) { buf.insert(other.scores(i), other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sortedPairs.map { case (s, i) =>
      org.apache.spark.sql.catalyst.InternalRow(i, s)
    })

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { val s = bb.getDouble; val id = bb.getLong; buf.insert(s, id); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("neighbor_id", LongType, nullable = false),
    StructField("sim", DoubleType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(score, id)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
  override def withNewMutableAggBufferOffset(offset: Int): TopKAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKAgg =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "topk_agg"
}

object VectorFunctions {
  def cosine_sim(a: Column, b: Column): Column =
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))
  def sim_signature(v: Column, nBits: Int): Column =
    Bridge.column(SimSignature(Bridge.expression(v), nBits))
  def sim_signature_words(v: Column, nBits: Int): Column =
    Bridge.column(SimSignatureWords(Bridge.expression(v), nBits))
  def minhash_agg(hash: Column, numHashes: Int): Column =
    Bridge.column(
      MinHashAgg(Bridge.expression(hash), numHashes).toAggregateExpression())
  def topk_agg(score: Column, id: Column, k: Int): Column =
    Bridge.column(
      TopKAgg(Bridge.expression(score), Bridge.expression(id), k)
        .toAggregateExpression())
}
