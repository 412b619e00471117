package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

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
}
