package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** KMV / theta distinct-count sketch (the Apache DataSketches theta
  * family; Beyer et al. "On Synopses for Distinct-Value Estimation
  * Under Multiset Operations", SIGMOD'07): retain the k smallest
  * 64-bit hashes of the stream; theta is the sampling threshold (the
  * value evicted when the reservoir overflows), and the distinct
  * estimate is retained/theta.
  *
  * What this adds over `approx_count_distinct` (HLL) is SET ALGEBRA
  * on sketch VALUES: union, intersection and A-NOT-B compose from
  * retained-hash sets, so per-slice sketches persisted as binary
  * columns answer "how many distinct digests do sources A and B
  * share" without rescanning either slice — the overlap matrix a
  * 100 TB corpus-curation service maintains incrementally. HLL can
  * only union; intersections via inclusion-exclusion lose all error
  * control, which is why the theta family exists.
  *
  * Exactness contract: while fewer than k distincts have been seen,
  * theta stays 1.0 and every estimate (including intersections) is
  * EXACT — [[graft.ops.DedupOps.sourceOverlap]] runs in that regime,
  * so the DuckDB oracle hash-checks it; ApproxSpec covers the
  * estimating regime's error envelope. One documented exclusion: the
  * single hash value whose flip is Long.MaxValue can never be
  * retained (see [[ThetaState.updateHash]]), so "exact" carries a
  * 2⁻⁶⁴-per-distinct undercount probability.
  *
  * Internal ordering uses sign-flipped longs (h ^ Long.MinValue) so
  * signed comparisons realize unsigned hash order.
  */
final class ThetaState(var k: Int) {
  /** Retained flipped hashes, all strictly below [[theta]]. */
  val set: java.util.TreeSet[java.lang.Long] = new java.util.TreeSet()
  /** Exclusive retention bound in the flipped domain; MaxValue = exact
    * mode (nothing evicted yet).
    */
  var theta: Long = Long.MaxValue

  /** Retention is STRICTLY below theta, so the one hash that flips to
    * Long.MaxValue (input hash = -1) is unrepresentable even in exact
    * mode — the same boundary exclusion Apache DataSketches makes by
    * keeping hashes in [1, 2^63). The exactness contract above
    * therefore carries a 2⁻⁶⁴-per-distinct undercount; admitting the
    * value would need an inclusive bound, which breaks eviction
    * (pollLast would hand theta = MaxValue back) and every `f < theta`
    * set-op filter for an event xxhash64 never produces in practice.
    */
  def updateHash(hash: Long): Unit = {
    val f = hash ^ Long.MinValue
    if (f < theta) {
      set.add(f)
      if (set.size > k) theta = set.pollLast()
    }
  }

  def merge(other: ThetaState): Unit = {
    if (k <= 0) k = other.k else if (other.k > 0) k = math.min(k, other.k)
    if (other.theta < theta) theta = other.theta
    val it = other.set.iterator()
    while (it.hasNext) {
      val f = it.next()
      if (f < theta) set.add(f)
    }
    // re-trim: the tightened theta may exclude old entries, and the
    // merged reservoir may exceed k
    while (!set.isEmpty && set.last() >= theta) set.pollLast()
    while (set.size > k) theta = set.pollLast()
  }

  /** Sampling fraction theta represents in [0, 1]. */
  private def fraction: Double =
    (theta.toDouble - Long.MinValue.toDouble) / math.pow(2.0, 64)

  def estimate: Double =
    if (theta == Long.MaxValue) set.size.toDouble
    else set.size.toDouble / fraction

  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 + 4 + set.size * 8)
    bb.putInt(k)
    bb.putLong(theta)
    bb.putInt(set.size)
    val it = set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }
}

object ThetaState {
  val DefaultK: Int = 1 << 12

  def deserialize(bytes: Array[Byte]): ThetaState = {
    val bb = ByteBuffer.wrap(bytes)
    val st = new ThetaState(bb.getInt)
    st.theta = bb.getLong
    var n = bb.getInt
    while (n > 0) { st.set.add(bb.getLong); n -= 1 }
    st
  }

  /** Set operations produce a NEW sketch at the tightened theta =
    * min(thetaA, thetaB), k = min(kA, kB) — the standard theta-sketch
    * composition rules (each retained set is a uniform hash sample
    * below its theta, so the set op is valid only below both).
    */
  def union(a: ThetaState, b: ThetaState): ThetaState = {
    val out = new ThetaState(math.min(a.k, b.k))
    out.merge(a); out.merge(b)
    out
  }

  def intersect(a: ThetaState, b: ThetaState): ThetaState = {
    val out = new ThetaState(math.min(a.k, b.k))
    out.theta = math.min(a.theta, b.theta)
    val it = a.set.iterator()
    while (it.hasNext) {
      val f = it.next()
      if (f < out.theta && b.set.contains(f)) out.set.add(f)
    }
    out
  }

  def aNotB(a: ThetaState, b: ThetaState): ThetaState = {
    val out = new ThetaState(math.min(a.k, b.k))
    out.theta = math.min(a.theta, b.theta)
    val it = a.set.iterator()
    while (it.hasNext) {
      val f = it.next()
      if (f < out.theta && !b.set.contains(f)) out.set.add(f)
    }
    out
  }
}

/** Aggregate: build a theta sketch over any column — partials are
  * bounded at k retained hashes, so the exchange carries O(k) longs
  * per group regardless of group size.
  */
case class ThetaSketchAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ThetaState] with UnaryLike[Expression] {

  require(k >= 16, s"sketch parameter k must be >= 16, got $k")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): ThetaState = new ThetaState(k)

  override def update(buf: ThetaState, input: InternalRow): ThetaState = {
    val v = child.eval(input)
    if (v != null) buf.updateHash(XxHash64Function.hash(v, child.dataType, 42L))
    buf
  }

  override def merge(buf: ThetaState, other: ThetaState): ThetaState = {
    buf.merge(other); buf
  }

  override def eval(buf: ThetaState): Any = buf.serialize()

  override def serialize(buf: ThetaState): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): ThetaState =
    ThetaState.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(
      newChild: Expression): ThetaSketchAgg = copy(child = newChild)

  override def prettyName: String = "theta_sketch_agg"
}

/** Aggregate: union serialized theta sketches — the incremental
  * roll-up half (per-slice sketches merge into any coarser slice).
  */
case class ThetaUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ThetaState]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  // k = 0 sentinel: adopt the first input sketch's parameter
  override def createAggregationBuffer(): ThetaState = new ThetaState(0)

  override def update(buf: ThetaState, input: InternalRow): ThetaState = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(ThetaState.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: ThetaState, other: ThetaState): ThetaState = {
    buf.merge(other); buf
  }

  override def eval(buf: ThetaState): Any = buf.serialize()

  override def serialize(buf: ThetaState): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): ThetaState =
    ThetaState.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(
      newChild: Expression): ThetaUnionAgg = copy(child = newChild)

  override def prettyName: String = "theta_union_agg"
}

/** Scalar: combine two serialized sketches with a set operation
  * ("union" | "intersect" | "anotb"). Runs on post-aggregate rows
  * (one per slice pair), never in a scan hot path.
  */
case class ThetaSetOp(left: Expression, right: Expression, op: String)
  extends BinaryExpression with ImplicitCastInputTypes
  with CodegenFallback {

  require(Set("union", "intersect", "anotb")(op),
    s"theta_set_op: unknown op '$op'")

  override def inputTypes = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val sa = ThetaState.deserialize(a.asInstanceOf[Array[Byte]])
    val sb = ThetaState.deserialize(b.asInstanceOf[Array[Byte]])
    val out = op match {
      case "union" => ThetaState.union(sa, sb)
      case "intersect" => ThetaState.intersect(sa, sb)
      case "anotb" => ThetaState.aNotB(sa, sb)
    }
    out.serialize()
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaSetOp =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = s"theta_$op"
}

/** Scalar: distinct estimate from a serialized sketch. */
case class ThetaEstimate(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes
  with CodegenFallback {

  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(sketch: Any): Any =
    ThetaState.deserialize(sketch.asInstanceOf[Array[Byte]]).estimate

  override protected def withNewChildInternal(
      newChild: Expression): ThetaEstimate = copy(child = newChild)

  override def prettyName: String = "theta_estimate"
}

object ThetaSketch {
  /** Aggregate Column: theta sketch of any column. */
  def sketchAgg(c: Column, k: Int = ThetaState.DefaultK): Column =
    GraftSqlBridge.column(ThetaSketchAgg(
      GraftSqlBridge.expression(c), k).toAggregateExpression())

  /** Aggregate Column: union of serialized sketches. */
  def unionAgg(c: Column): Column =
    GraftSqlBridge.column(ThetaUnionAgg(
      GraftSqlBridge.expression(c)).toAggregateExpression())

  def union(a: Column, b: Column): Column =
    GraftSqlBridge.column(ThetaSetOp(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b), "union"))

  def intersect(a: Column, b: Column): Column =
    GraftSqlBridge.column(ThetaSetOp(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b),
      "intersect"))

  def aNotB(a: Column, b: Column): Column =
    GraftSqlBridge.column(ThetaSetOp(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b), "anotb"))

  def estimate(sketch: Column): Column =
    GraftSqlBridge.column(ThetaEstimate(GraftSqlBridge.expression(sketch)))
}
