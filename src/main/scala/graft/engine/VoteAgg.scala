package graft.engine

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native aggregate form of the annotation-downsample vote
  * ([[VoteAggregator]] semantics, `addData.c:28-70`): a
  * `TypedImperativeAggregate` reads (pos, value) directly from the input
  * row — no per-row case-class materialization, no UDAF wrapper — and
  * serializes its ≤8-entry tally only at shuffle/spill boundaries.
  */
case class VoteAgg(
    posExpr: Expression,
    valueExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VoteBuf] {

  override def children: Seq[Expression] = Seq(posExpr, valueExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): VoteBuf = VoteAggregator.zero

  override def update(b: VoteBuf, input: InternalRow): VoteBuf = {
    val p = posExpr.eval(input)
    val v = valueExpr.eval(input)
    if (p == null || v == null) b
    else VoteAggregator.reduce(b, VoteIn(p.asInstanceOf[Long], v.asInstanceOf[Long]))
  }

  override def merge(a: VoteBuf, b: VoteBuf): VoteBuf = VoteAggregator.merge(a, b)

  override def eval(b: VoteBuf): Any = VoteAggregator.finish(b)

  override def serialize(b: VoteBuf): Array[Byte] = {
    val n = b.vals.length
    val out = ByteBuffer.allocate(4 + n * 24)
    out.putInt(n)
    var i = 0
    while (i < n) {
      out.putLong(b.vals(i)); out.putLong(b.counts(i)); out.putLong(b.poss(i))
      i += 1
    }
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): VoteBuf = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt()
    val vals = new Array[Long](n); val counts = new Array[Long](n); val poss = new Array[Long](n)
    var i = 0
    while (i < n) {
      vals(i) = in.getLong(); counts(i) = in.getLong(); poss(i) = in.getLong()
      i += 1
    }
    VoteBuf(vals, counts, poss)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VoteAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VoteAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): VoteAgg =
    copy(posExpr = newChildren(0), valueExpr = newChildren(1))
}

object VoteAgg {
  /** Column form: `vote(pos, value)` as a native aggregate. */
  def apply(pos: Column, value: Column): Column =
    Bridge.column(
      VoteAgg(Bridge.expression(pos.cast("long")), Bridge.expression(value.cast("long")))
        .toAggregateExpression())
}
