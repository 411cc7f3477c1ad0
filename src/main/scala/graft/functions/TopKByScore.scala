package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k as a typed-imperative aggregate: keeps a group's k
  * best (score, id) pairs — best = highest score (or lowest with
  * `asc = true`), ties to the smaller id — with map-side partial
  * aggregation and a k-bounded merge.
  *
  * This is the aggregate that replaces the per-group `row_number`
  * window in ANN search: the window shuffles EVERY scored candidate
  * row (|Q|×N for brute force) to rank them reducer-side, while this
  * aggregate's partials cap each task's contribution at k rows per
  * group, so the exchange carries |Q|×k×tasks at worst. State is one
  * small sorted buffer per group; ordering is identical to
  * `row_number over (order by score desc, id)`.
  *
  * Output: array<struct<score double, id bigint>> best-first.
  */
case class TopKByScore(
    score: Expression, id: Expression, k: Int, asc: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]]
  with ImplicitCastInputTypes with BinaryLike[Expression] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def left: Expression = score
  override def right: Expression = id
  // analysis-time coercion: an INT score or id gets cast instead of
  // throwing ClassCastException mid-job from the raw unboxing below
  override def inputTypes = Seq(DoubleType, LongType)

  /** true when (s1, i1) ranks strictly better than (s2, i2). */
  private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    if (c != 0) { if (asc) c < 0 else c > 0 } else i1 < i2
  }

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    ArrayBuffer.empty

  private def insert(buf: ArrayBuffer[(Double, Long)], s: Double,
      i: Long): Unit = {
    if (buf.length == k && !better(s, i, buf.last._1, buf.last._2)) return
    var pos = buf.length
    while (pos > 0 && better(s, i, buf(pos - 1)._1, buf(pos - 1)._2)) pos -= 1
    buf.insert(pos, (s, i))
    if (buf.length > k) buf.remove(buf.length - 1)
  }

  override def update(buf: ArrayBuffer[(Double, Long)],
      input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      insert(buf, s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: ArrayBuffer[(Double, Long)],
      other: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    other.foreach { case (s, i) => insert(buf, s, i) }
    buf
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any =
    new GenericArrayData(
      buf.map { case (s, i) => InternalRow(s, i) }.toArray[Any])

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 16)
    bb.putInt(buf.length)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(
      bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < n) { buf += ((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByScore =
    copy(score = newLeft, id = newRight)

  override def prettyName: String = "topk_by_score"
}

object TopKByScore {
  /** Aggregate Column: the group's k highest-score (score, id) pairs. */
  def topk(score: Column, id: Column, k: Int): Column =
    GraftSqlBridge.column(TopKByScore(
      GraftSqlBridge.expression(score), GraftSqlBridge.expression(id),
      k).toAggregateExpression())

  /** Aggregate Column: the group's k LOWEST-score pairs (distances). */
  def topkAsc(score: Column, id: Column, k: Int): Column =
    GraftSqlBridge.column(TopKByScore(
      GraftSqlBridge.expression(score), GraftSqlBridge.expression(id),
      k, asc = true).toAggregateExpression())

  /** Aggregate Column: the group's k highest-score (score, id, tag)
    * triples — [[TopKByScoreTagged]].
    */
  def topkTagged(score: Column, id: Column, tag: Column,
      k: Int): Column =
    GraftSqlBridge.column(TopKByScoreTagged(
      GraftSqlBridge.expression(score), GraftSqlBridge.expression(id),
      GraftSqlBridge.expression(tag), k).toAggregateExpression())
}

/** [[TopKByScore]] with a PAYLOAD column carried through the ranking
  * — the shape score-quantized impact ordering needs: posting lists
  * rank by the BM25 impact (a double derived from tf AND dl) but the
  * serving side still needs the raw tf of each kept posting, and the
  * impact is not invertible without the doc's length. Ordering and
  * bounds are identical to [[TopKByScore]] (highest score first, ties
  * to the smaller id, k-row map-side partials); the tag is inert in
  * the ordering. Output: array<struct<score double, id bigint,
  * tag bigint>> best-first.
  */
case class TopKByScoreTagged(
    score: Expression, id: Expression, tag: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long, Long)]]
  with ImplicitCastInputTypes
  with org.apache.spark.sql.catalyst.trees.TernaryLike[Expression] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def first: Expression = score
  override def second: Expression = id
  override def third: Expression = tag
  override def inputTypes = Seq(DoubleType, LongType, LongType)

  private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    if (c != 0) c > 0 else i1 < i2
  }

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long, Long)] =
    ArrayBuffer.empty

  private def insert(buf: ArrayBuffer[(Double, Long, Long)], s: Double,
      i: Long, t: Long): Unit = {
    if (buf.length == k && !better(s, i, buf.last._1, buf.last._2)) return
    var pos = buf.length
    while (pos > 0 && better(s, i, buf(pos - 1)._1, buf(pos - 1)._2)) pos -= 1
    buf.insert(pos, (s, i, t))
    if (buf.length > k) buf.remove(buf.length - 1)
  }

  override def update(buf: ArrayBuffer[(Double, Long, Long)],
      input: InternalRow): ArrayBuffer[(Double, Long, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    val t = tag.eval(input)
    if (s != null && i != null && t != null) {
      insert(buf, s.asInstanceOf[Double], i.asInstanceOf[Long],
        t.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: ArrayBuffer[(Double, Long, Long)],
      other: ArrayBuffer[(Double, Long, Long)])
      : ArrayBuffer[(Double, Long, Long)] = {
    other.foreach { case (s, i, t) => insert(buf, s, i, t) }
    buf
  }

  override def eval(buf: ArrayBuffer[(Double, Long, Long)]): Any =
    new GenericArrayData(
      buf.map { case (s, i, t) => InternalRow(s, i, t) }.toArray[Any])

  override def serialize(
      buf: ArrayBuffer[(Double, Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 24)
    bb.putInt(buf.length)
    buf.foreach { case (s, i, t) =>
      bb.putDouble(s); bb.putLong(i); bb.putLong(t) }
    bb.array()
  }

  override def deserialize(
      bytes: Array[Byte]): ArrayBuffer[(Double, Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = ArrayBuffer.empty[(Double, Long, Long)]
    var i = 0
    while (i < n) {
      buf += ((bb.getDouble, bb.getLong, bb.getLong)); i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false),
      StructField("tag", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(
      newOffset: Int): TopKByScoreTagged =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): TopKByScoreTagged =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): TopKByScoreTagged =
    copy(score = newFirst, id = newSecond, tag = newThird)

  override def prettyName: String = "topk_by_score_tagged"
}
