package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature as a native typed-imperative aggregate: folds the
  * base shingle hashes of a group (document) into a `numPerms`-long
  * signature of per-permutation minima, with map-side partial
  * aggregation and elementwise-min merge.
  *
  * Input: a BIGINT base hash per shingle, expected in [0, 2^31).
  * Output: array<bigint> of length `numPerms`.
  *
  * Versus 64 separate `min(pmod(...))` agg columns this keeps one
  * buffer object per group, one pass per row, and a merge that is a
  * single array walk — the shape that scales to billions of groups.
  */
case class MinHashSig(
    child: Expression,
    numPerms: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val P = 2147483647L // 2^31 - 1
  // permutation parameters, fixed and deterministic
  private lazy val as: Array[Long] =
    Array.tabulate(numPerms)(i => (1000003L * i + 12345L) % P)
  private lazy val bs: Array[Long] =
    Array.tabulate(numPerms)(i => (998244353L * (i + 1) + 7L) % P)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numPerms)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val base = v.asInstanceOf[Long]
      var i = 0
      while (i < numPerms) {
        val h = (as(i) * base + bs(i)) % P
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numPerms) {
      if (other(i) < buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSig =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSig =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  /** Aggregate Column: MinHash signature of the group's base hashes. */
  def minhashSig(c: Column, numPerms: Int = 64): Column =
    GraftSqlBridge.column(
      MinHashSig(GraftSqlBridge.expression(c), numPerms).toAggregateExpression())
}
