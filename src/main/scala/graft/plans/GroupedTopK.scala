package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, Expression, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}

/** Logical grouped top-k: for each distinct value of `keys`, the `k`
  * lowest rows under `ordering`, with a 1-based `rank` column appended.
  *
  * Semantically identical to
  * `row_number() OVER (PARTITION BY keys ORDER BY ordering) <= k`, but
  * declared as its own operator so the planner can pick a bounded-heap
  * physical strategy instead of WindowExec's per-partition full sort:
  * at 100 TB an ANN rerank's window sorts every bucket-mate of every
  * query before discarding all but k, while the heap never holds more
  * than keys×k rows per task.
  *
  * `rankAttr` is created once at construction (not derived in `output`)
  * so tree transformations preserve its exprId.
  */
final case class GroupedTopK(
    keys: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  require(k >= 1, "GroupedTopK requires k >= 1")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr :: Nil)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupedTopK =
    copy(child = newChild)
}
