package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Physical grouped top-k: hash-cluster on `keys` (EnsureRequirements
  * inserts the exchange), then one linear pass per partition maintaining
  * a size-`k` bounded heap per key — no sort of the input, task memory
  * capped at keysInPartition×k row copies regardless of group fan-in.
  * Rows emit per key in rank order (rank 1 = lowest under `ordering`,
  * exactly row_number semantics including ties broken by the ordering's
  * tie-break columns).
  *
  * MEMORY CONTRACT: per-task state is (distinct keys in the partition) ×
  * k retained rows, on the JVM heap (not Tungsten-managed, so it cannot
  * spill). The operator wins when fan-in per key is large relative to k
  * — the ANN rerank shape (thousands of candidates per query, k ≈ 10).
  * The pathological case is the opposite: key cardinality ~ row count
  * (every key holds ≤ k rows), where the heap state approaches a copy of
  * the partition. That degenerate shape is exactly what a plain
  * hash-aggregate/window already handles well, so callers with
  * per-partition distinct-keys × k × rowSize approaching task memory
  * should raise `spark.sql.shuffle.partitions` (state divides linearly
  * across tasks) or fall back to the window form. TopKSpec's
  * high-cardinality case pins the behavior (correct output, state =
  * rows) at keys ≈ rows.
  */
final case class GroupedTopKExec(
    keys: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr :: Nil)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrders = ordering
    val limit = k
    val outAttrs = output
    child.execute().mapPartitions ({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord: Ordering[InternalRow] =
        GenerateOrdering.generate(sortOrders, childOutput)
      // max-heap under `ord`: head = worst of the kept k, evicted when a
      // better row arrives
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](ord)
            h += row.copy()
            heaps.put(key.copy(), h)
          case Some(h) =>
            if (h.size < limit) h += row.copy()
            else if (ord.compare(row, h.head) < 0) { h.dequeue(); h += row.copy() }
        }
      }
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      val project = UnsafeProjection.create(outAttrs, outAttrs)
      // the rank is written in the ATTRIBUTE's type: LongType from the
      // TopK.perKey entry, IntegerType when WindowTopKRewrite reuses a
      // row_number alias attribute
      val rankIsInt = rankAttr.dataType == org.apache.spark.sql.types.IntegerType
      heaps.iterator.flatMap { case (_, h) =>
        // dequeueAll drains worst-first; reverse => rank-ascending
        val best = h.dequeueAll.reverseIterator
        best.zipWithIndex.map { case (row, i) =>
          if (rankIsInt) rankRow.setInt(0, i + 1) else rankRow.setLong(0, i + 1L)
          project(joined(row, rankRow))
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupedTopKExec =
    copy(child = newChild)
}
