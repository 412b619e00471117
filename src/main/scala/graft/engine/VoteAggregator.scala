package graft.engine

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.expressions.UserDefinedFunction

/** Input to the annotation-downsample vote: one child voxel with its scan
  * position inside the 2x2x(1|2) parent cell.
  */
final case class VoteIn(pos: Long, value: Long)

/** The annotation downsample vote (reference `spdb/c_lib/c_version/
  * addData.c:28-70` `getAnnValue`): among the non-zero child voxels of a
  * parent cell, prefer the value that repeats; break ties by the earliest
  * scan position; if nothing repeats take the first non-zero; all-zero
  * cells yield 0.
  *
  * Implemented as a typed `Aggregator` (SURVEY §2.11: mode-with-tiebreak is
  * not a Spark built-in). The buffer is a small map value→(count, minPos):
  * at most 8 entries per group, so partial aggregation (map-side combine)
  * keeps the shuffle tiny — only the per-cell vote tallies move.
  */
object VoteAggregator extends Aggregator[VoteIn, Map[Long, (Long, Long)], Long] {

  override def zero: Map[Long, (Long, Long)] = Map.empty

  override def reduce(b: Map[Long, (Long, Long)], in: VoteIn): Map[Long, (Long, Long)] =
    if (in.value == 0L) b
    else b.get(in.value) match {
      case Some((c, p)) => b.updated(in.value, (c + 1, math.min(p, in.pos)))
      case None         => b.updated(in.value, (1L, in.pos))
    }

  override def merge(a: Map[Long, (Long, Long)], b: Map[Long, (Long, Long)]): Map[Long, (Long, Long)] =
    b.foldLeft(a) { case (acc, (v, (c, p))) =>
      acc.get(v) match {
        case Some((c0, p0)) => acc.updated(v, (c0 + c, math.min(p0, p)))
        case None           => acc.updated(v, (c, p))
      }
    }

  override def finish(b: Map[Long, (Long, Long)]): Long =
    if (b.isEmpty) 0L
    else b.minBy { case (v, (c, p)) => (-c, p, v) }._1

  override def bufferEncoder: Encoder[Map[Long, (Long, Long)]] =
    Encoders.kryo[Map[Long, (Long, Long)]]

  override def outputEncoder: Encoder[Long] = Encoders.scalaLong

  /** Column-API form: `vote(struct(pos, value))`. */
  lazy val asUdaf: UserDefinedFunction = udaf(VoteAggregator, Encoders.product[VoteIn])
}
