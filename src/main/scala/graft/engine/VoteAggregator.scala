package graft.engine

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.expressions.UserDefinedFunction

/** Input to the annotation-downsample vote: one child voxel with its scan
  * position inside the 2x2x(1|2) parent cell.
  */
final case class VoteIn(pos: Long, value: Long)

/** Vote tally buffer: parallel arrays (value, count, minPos) — a parent
  * cell has at most 8 children so at most 8 distinct entries. A product
  * encoder keeps the buffer in Tungsten rows (the round-1 Map buffer
  * round-tripped through Kryo on every partial-aggregate merge).
  */
final case class VoteBuf(vals: Array[Long], counts: Array[Long], poss: Array[Long])

/** The annotation downsample vote (reference `spdb/c_lib/c_version/
  * addData.c:28-70` `getAnnValue`): among the non-zero child voxels of a
  * parent cell, prefer the value that repeats; break ties by the earliest
  * scan position, then by the smallest value; all-zero cells yield 0.
  *
  * Implemented as a typed `Aggregator` (SURVEY §2.11: mode-with-tiebreak is
  * not a Spark built-in) with map-side partial aggregation — only the
  * per-cell tallies shuffle, never voxels.
  */
object VoteAggregator extends Aggregator[VoteIn, VoteBuf, Long] {

  override def zero: VoteBuf = VoteBuf(Array.empty, Array.empty, Array.empty)

  private def add(b: VoteBuf, value: Long, count: Long, pos: Long): VoteBuf = {
    var i = 0
    val n = b.vals.length
    while (i < n) {
      if (b.vals(i) == value) {
        val c = b.counts.clone(); val p = b.poss.clone()
        c(i) += count
        p(i) = math.min(p(i), pos)
        return VoteBuf(b.vals, c, p)
      }
      i += 1
    }
    VoteBuf(b.vals :+ value, b.counts :+ count, b.poss :+ pos)
  }

  override def reduce(b: VoteBuf, in: VoteIn): VoteBuf =
    if (in.value == 0L) b else add(b, in.value, 1L, in.pos)

  override def merge(a: VoteBuf, b: VoteBuf): VoteBuf = {
    var acc = a
    var i = 0
    while (i < b.vals.length) {
      acc = add(acc, b.vals(i), b.counts(i), b.poss(i))
      i += 1
    }
    acc
  }

  override def finish(b: VoteBuf): Long = {
    if (b.vals.isEmpty) return 0L
    var best = 0
    var i = 1
    while (i < b.vals.length) {
      val betterCount = b.counts(i) > b.counts(best)
      val tieCount = b.counts(i) == b.counts(best)
      val betterPos = b.poss(i) < b.poss(best)
      val tiePos = b.poss(i) == b.poss(best)
      if (betterCount || (tieCount && (betterPos || (tiePos && b.vals(i) < b.vals(best)))))
        best = i
      i += 1
    }
    b.vals(best)
  }

  override def bufferEncoder: Encoder[VoteBuf] = Encoders.product[VoteBuf]

  override def outputEncoder: Encoder[Long] = Encoders.scalaLong

  /** Column-API form: `vote(pos, value)`. */
  lazy val asUdaf: UserDefinedFunction = udaf(VoteAggregator, Encoders.product[VoteIn])
}
