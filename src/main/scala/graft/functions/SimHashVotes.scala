package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash fingerprint as one typed-imperative aggregate: folds each
  * token hash's `bits` bit votes (+1/-1 per bit) into a single int
  * buffer and emits the sign fingerprint — one buffer walk per row
  * instead of `bits` separate sum-CASE aggregate columns, with the
  * same map-side partial aggregation and an elementwise-add merge.
  *
  * Input: a BIGINT token hash. Output: the `bits`-wide fingerprint
  * (bit j set iff the vote sum for bit j is positive) — identical to
  * the column formulation, so the DuckDB oracle is unchanged.
  */
case class SimHashVotes(
    child: Expression,
    bits: Int = 60,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] with UnaryLike[Expression] {

  require(bits >= 1 && bits <= 64, s"bits must be in [1,64], got $bits")

  override def createAggregationBuffer(): Array[Int] = new Array[Int](bits)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < bits) {
        if (((h >> j) & 1L) == 1L) buf(j) += 1 else buf(j) -= 1
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Int], other: Array[Int]): Array[Int] = {
    var j = 0
    while (j < bits) { buf(j) += other(j); j += 1 }
    buf
  }

  override def eval(buf: Array[Int]): Any = {
    var fp = 0L
    var j = 0
    while (j < bits) {
      if (buf(j) > 0) fp |= 1L << j
      j += 1
    }
    fp
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 4)(bb.getInt)
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashVotes =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashVotes =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): SimHashVotes = copy(child = newChild)

  override def prettyName: String = "simhash_votes"
}

object SimHashVotes {
  def simhashFp(c: Column, bits: Int = 60): Column =
    GraftSqlBridge.column(SimHashVotes(GraftSqlBridge.expression(c), bits)
      .toAggregateExpression())
}
