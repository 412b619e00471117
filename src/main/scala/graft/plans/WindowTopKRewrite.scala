package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, IntegerLiteral, LessThan, LessThanOrEqual, PredicateHelper, RowFrame, RowNumber, SpecifiedWindowFrame, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.{CurrentRow, UnboundedPreceding}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the universal top-k-per-group idiom
  *
  * {{{ SELECT ... FROM (SELECT *, row_number() OVER
  *     (PARTITION BY p ORDER BY o) AS rk FROM t) WHERE rk <= k }}}
  *
  * into the [[GroupedTopK]] operator, so ANY query written in the
  * window style — `spark.sql`, DataFrame API, a BI tool — gets the
  * bounded-heap physical plan (per-task state keys×k rows, NO sort)
  * instead of WindowExec's per-partition full sort. Users of the
  * library don't need to know [[graft.functions.TopK.perKey]] exists.
  *
  * Spark's own `InferWindowGroupLimit` (3.5+) already inserts a
  * [[WindowGroupLimit]] *below* the window for this pattern — a
  * per-partition pre-prune that still sorts and still runs the window;
  * this rule replaces the whole stack. When the pre-prune node is
  * present it is stripped (the heap subsumes it).
  *
  * Safety conditions (all required):
  *  - exactly ONE window expression in the node, and it is `row_number`
  *    over the node's own partition/order specs with the default
  *    running-row frame;
  *  - the filter bounds that rank attribute from above (`rk <= k`,
  *    `rk < k`, `rk = 1`, or the mirrored literal-first forms), possibly
  *    conjoined with other predicates — the rank bound is consumed, the
  *    rest stays in a Filter ABOVE (they may reference `rk`: rank values
  *    are identical by construction);
  *  - the partition spec is non-empty (global top-k belongs to
  *    TakeOrderedAndProject, which Spark already plans well).
  *
  * The rewritten operator reuses the window alias's attribute (exprId
  * and IntegerType preserved — [[GroupedTopKExec]] writes the rank in
  * the attribute's own type), so references above resolve unchanged.
  */
object WindowTopKRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** Opt-out knob: GroupedTopKExec's per-task heap (distinct keys × k
    * rows) lives on the JVM heap and cannot spill, so in the
    * key-cardinality≈row-count shape an operator may prefer WindowExec's
    * spillable sort — `SET spark.graft.windowTopKRewrite.enabled=false`
    * restores it without unbinding the extension.
    */
  final val EnabledKey = "spark.graft.windowTopKRewrite.enabled"

  /** `Some(k)` when `e` is an upper bound `rk <= k` in any spelling. */
  private def rankBound(e: Expression, rk: Attribute): Option[Int] = e match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(v)) if a.semanticEquals(rk) => Some(v)
    case LessThan(a: Attribute, IntegerLiteral(v)) if a.semanticEquals(rk)        => Some(v - 1)
    case EqualTo(a: Attribute, IntegerLiteral(1)) if a.semanticEquals(rk)         => Some(1)
    case EqualTo(IntegerLiteral(1), a: Attribute) if a.semanticEquals(rk)         => Some(1)
    case GreaterThanOrEqual(IntegerLiteral(v), a: Attribute) if a.semanticEquals(rk) => Some(v)
    case GreaterThan(IntegerLiteral(v), a: Attribute) if a.semanticEquals(rk)     => Some(v - 1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(EnabledKey, "true").toBoolean) plan
    else rewrite(plan)

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(RowNumber(),
            WindowSpecDefinition(specPart, specOrder,
              SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
          partSpec, orderSpec, child, _))
        if partSpec.nonEmpty &&
          specPart.length == partSpec.length && specOrder.length == orderSpec.length &&
          specPart.zip(partSpec).forall { case (a, b) => a.semanticEquals(b) } &&
          specOrder.zip(orderSpec).forall { case (a, b) => a.semanticEquals(b) } => {
      val rk = alias.toAttribute
      val conjuncts = splitConjunctivePredicates(cond)
      val bounds = conjuncts.flatMap(c => rankBound(c, rk).map(c -> _)).toMap
      // k < 1 is the empty set — degenerate, leave it to the normal planner
      if (bounds.isEmpty || bounds.values.min < 1) f
      else {
        val k = bounds.values.min
        // the heap subsumes Spark's own sort-side pre-prune — but only
        // strip it when it provably belongs to THIS window (same
        // partition/order specs, row_number rank, limit ≥ k); a
        // mismatched node (hand-built plan, future rule interplay) is
        // left in place rather than wrongly removed
        val base = child match {
          case WindowGroupLimit(wPart, wOrder, RowNumber(), limit, grandChild)
              if limit >= k &&
                wPart.length == partSpec.length && wOrder.length == orderSpec.length &&
                wPart.zip(partSpec).forall { case (a, b) => a.semanticEquals(b) } &&
                wOrder.zip(orderSpec).forall { case (a, b) => a.semanticEquals(b) } =>
            grandChild
          case c => c
        }
        val topk = GroupedTopK(partSpec, orderSpec, k, rk, base)
        val rest = conjuncts.filterNot(bounds.contains)
        if (rest.isEmpty) topk
        else Filter(rest.reduce(org.apache.spark.sql.catalyst.expressions.And), topk)
      }
    }
  }
}
