package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Minimal bridge into Spark's `private[sql]` classic Column↔Expression
  * converters (Spark 4 moved them behind `org.apache.spark.sql.classic`).
  * Lives inside the `org.apache.spark.sql` namespace on purpose — the
  * standard pattern for Catalyst extension libraries.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `AbstractDataType` is `private[sql]` in Spark 4; expressions outside
    * the sql package need this alias to declare `inputTypes`.
    */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType

  /** `Dataset.ofRows` is `private[sql]`: wrap a custom logical plan back
    * into the public DataFrame API.
    */
  def dataFrame(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}

/** Planner strategy for the custom [[graft.plans.GroupedTopK]] logical
  * operator (the `planLater` callback lives on `GenericStrategy`, hence
  * this object sits beside [[Bridge]] in the sql namespace).
  */
object GroupedTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case g: _root_.graft.plans.GroupedTopK =>
      _root_.graft.plans.GroupedTopKExec(g.keys, g.ordering, g.k, g.rankAttr, planLater(g.child)) :: Nil
    case _ => Nil
  }
}
