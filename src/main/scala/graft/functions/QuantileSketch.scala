package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._

/** KLL-style mergeable quantile sketch (Karnin-Lall-Liberty, FOCS'16;
  * the Apache DataSketches KLL family): a stack of buffers where
  * level l holds items of weight 2^l. A full buffer sorts and
  * promotes every other item one level up, halving its footprint and
  * doubling item weight; rank error is O(1/k) per compaction level.
  *
  * The point of carrying this as an explicit sketch VALUE (vs
  * `approx_percentile`, whose digest never leaves the aggregate) is
  * the 100 TB roll-up path: per-slice sketches (per source, per day,
  * per ingest batch) persist as binary columns and UNION later —
  * quantiles over any slice combination without rescanning history,
  * the same maintainability contract the HLL sketch functions give
  * distinct counts.
  */
final class KllState(var k: Int) {
  /** levels(l) holds items of weight 2^l; level 0 is the raw intake. */
  val levels: ArrayBuffer[ArrayBuffer[Double]] =
    ArrayBuffer(ArrayBuffer.empty[Double])
  /** Compaction counter — drives the deterministic alternating offset
    * (KLL's random bit; alternation keeps the sketch reproducible).
    */
  var compactions: Long = 0L

  def update(v: Double): Unit = {
    levels(0) += v
    if (levels(0).length >= k) compress()
  }

  /** Compact every over-full buffer bottom-up; promotions cascade. */
  def compress(): Unit = {
    var l = 0
    while (l < levels.length) {
      if (levels(l).length >= k) compact(l)
      l += 1
    }
  }

  private def compact(l: Int): Unit = {
    if (l + 1 >= levels.length) levels += ArrayBuffer.empty[Double]
    val sorted = levels(l).sorted
    var i = (compactions & 1L).toInt
    compactions += 1
    while (i < sorted.length) { levels(l + 1) += sorted(i); i += 2 }
    levels(l).clear()
  }

  /** Union: concatenate level-wise, then compact — the estimate's
    * error bound is unchanged because compaction error is counted per
    * level, not per merge (the KLL guarantee that makes the roll-up
    * path sound).
    */
  def merge(other: KllState): Unit = {
    if (k <= 0) k = other.k else if (other.k > 0) k = math.min(k, other.k)
    while (levels.length < other.levels.length)
      levels += ArrayBuffer.empty[Double]
    var l = 0
    while (l < other.levels.length) { levels(l) ++= other.levels(l); l += 1 }
    compactions += other.compactions
    if (k > 0) compress()
  }

  /** Total weight = number of updates the sketch has absorbed. */
  def n: Long = {
    var t = 0L
    var l = 0
    while (l < levels.length) { t += levels(l).length.toLong << l; l += 1 }
    t
  }

  /** Value whose weighted rank first exceeds q*n; null-signal via NaN
    * is avoided — callers check n == 0 first.
    */
  def quantile(q: Double): Double = {
    val items = ArrayBuffer.empty[(Double, Long)]
    var l = 0
    while (l < levels.length) {
      levels(l).foreach(v => items += ((v, 1L << l)))
      l += 1
    }
    val sorted = items.sortBy(_._1)
    val target = math.min((q * n).toLong, n - 1)
    var cum = 0L
    var i = 0
    while (i < sorted.length) {
      cum += sorted(i)._2
      if (cum > target) return sorted(i)._1
      i += 1
    }
    sorted.last._1
  }

  def serialize(): Array[Byte] = {
    val total = levels.map(_.length).sum
    val bb = ByteBuffer.allocate(4 + 8 + 4 + levels.length * 4 + total * 8)
    bb.putInt(k)
    bb.putLong(compactions)
    bb.putInt(levels.length)
    levels.foreach { buf =>
      bb.putInt(buf.length)
      buf.foreach(bb.putDouble)
    }
    bb.array()
  }
}

object KllState {
  def deserialize(bytes: Array[Byte]): KllState = {
    val bb = ByteBuffer.wrap(bytes)
    val st = new KllState(bb.getInt)
    st.compactions = bb.getLong
    val nLevels = bb.getInt
    var l = 0
    while (l < nLevels) {
      if (l >= st.levels.length) st.levels += ArrayBuffer.empty[Double]
      var m = bb.getInt
      while (m > 0) { st.levels(l) += bb.getDouble; m -= 1 }
      l += 1
    }
    st
  }
}

/** Aggregate: build a KLL quantile sketch over a double column —
  * map-side partials are sketches, the exchange carries O(k log n)
  * doubles per group instead of the group's rows. Output is the
  * serialized sketch (binary), estimable with
  * [[QuantileSketchEstimate]] and unionable with
  * [[QuantileSketchUnion]].
  */
case class QuantileSketchAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllState]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(k >= 8, s"sketch parameter k must be >= 8, got $k")

  override def inputTypes = Seq(DoubleType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllState = new KllState(k)

  override def update(buf: KllState, input: InternalRow): KllState = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllState, other: KllState): KllState = {
    buf.merge(other); buf
  }

  override def eval(buf: KllState): Any = buf.serialize()

  override def serialize(buf: KllState): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): KllState =
    KllState.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(
      newChild: Expression): QuantileSketchAgg = copy(child = newChild)

  override def prettyName: String = "quantile_sketch_agg"
}

/** Aggregate: union serialized KLL sketches — the incremental-rollup
  * half of the contract (per-slice sketches persisted earlier merge
  * into any coarser granularity without touching the raw data).
  */
case class QuantileSketchUnion(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllState]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  // k = 0 sentinel: adopt the first input sketch's parameter
  override def createAggregationBuffer(): KllState = new KllState(0)

  override def update(buf: KllState, input: InternalRow): KllState = {
    val v = child.eval(input)
    if (v != null) buf.merge(KllState.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: KllState, other: KllState): KllState = {
    buf.merge(other); buf
  }

  override def eval(buf: KllState): Any = buf.serialize()

  override def serialize(buf: KllState): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): KllState =
    KllState.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): QuantileSketchUnion =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketchUnion =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(
      newChild: Expression): QuantileSketchUnion = copy(child = newChild)

  override def prettyName: String = "quantile_sketch_union"
}

/** Scalar: estimate a quantile from a serialized KLL sketch. Runs on
  * post-aggregate rows (one per group), so interpreted eval is fine —
  * it is never in a scan hot path.
  */
case class QuantileSketchEstimate(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes
  with CodegenFallback {

  override def inputTypes = Seq(BinaryType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(sketch: Any, q: Any): Any = {
    val st = KllState.deserialize(sketch.asInstanceOf[Array[Byte]])
    if (st.n == 0L) null else st.quantile(q.asInstanceOf[Double])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantileSketchEstimate =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "quantile_sketch_estimate"
}

object QuantileSketch {
  /** Aggregate Column: KLL sketch of a double column. */
  def sketchAgg(c: Column, k: Int = 256): Column =
    GraftSqlBridge.column(QuantileSketchAgg(
      GraftSqlBridge.expression(c), k).toAggregateExpression())

  /** Aggregate Column: union of serialized sketches. */
  def unionAgg(c: Column): Column =
    GraftSqlBridge.column(QuantileSketchUnion(
      GraftSqlBridge.expression(c)).toAggregateExpression())

  /** Scalar Column: quantile estimate from a serialized sketch. */
  def estimate(sketch: Column, q: Double): Column =
    GraftSqlBridge.column(QuantileSketchEstimate(
      GraftSqlBridge.expression(sketch),
      GraftSqlBridge.expression(org.apache.spark.sql.functions.lit(q))))
}
