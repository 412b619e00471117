package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.core.{MortonDecode, MortonEncode}
import graft.functions.{DotProductQ, NfcNormalize, SortedDistinctCount, SortedIntersectCount, SqDistQ}

/** SQL surface for the custom Catalyst expressions: registers
  * `morton_encode(x,y,z)` and `morton_x/y/z(m)` so `spark.sql(...)`
  * queries can address the Z-order curve directly.
  *
  * Two entry points: `spark.sql.extensions=graft.GraftExtensions` at
  * session build (the standard extension hook), or
  * [[GraftExtensions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graft.GroupedTopKStrategy)
    // auto-rewrite `row_number window + rank filter` → GroupedTopK, so
    // the window idiom gets the bounded-heap plan from ANY surface
    ext.injectOptimizerRule(_ => graft.plans.WindowTopKRewrite)
  }
}

object GraftExtensions {

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("morton_encode"),
      new ExpressionInfo(classOf[MortonEncode].getName, "morton_encode"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "morton_encode(x, y, z)")
        MortonEncode(args(0), args(1), args(2))
      }),
    (FunctionIdentifier("morton_x"),
      new ExpressionInfo(classOf[MortonDecode].getName, "morton_x"),
      (args: Seq[Expression]) => MortonDecode(args.head, 0)),
    (FunctionIdentifier("morton_y"),
      new ExpressionInfo(classOf[MortonDecode].getName, "morton_y"),
      (args: Seq[Expression]) => MortonDecode(args.head, 1)),
    (FunctionIdentifier("morton_z"),
      new ExpressionInfo(classOf[MortonDecode].getName, "morton_z"),
      (args: Seq[Expression]) => MortonDecode(args.head, 2)),
    (FunctionIdentifier("dot_q"),
      new ExpressionInfo(classOf[DotProductQ].getName, "dot_q"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_q(a, b)")
        DotProductQ(args(0), args(1))
      }),
    (FunctionIdentifier("sqdist_q"),
      new ExpressionInfo(classOf[SqDistQ].getName, "sqdist_q"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "sqdist_q(a, b)")
        SqDistQ(args(0), args(1))
      }),
    (FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "nfc_normalize(s)")
        NfcNormalize(args.head)
      }),
    (FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "sorted_intersect_count(a, b)")
        SortedIntersectCount(args(0), args(1))
      }),
    (FunctionIdentifier("sorted_distinct_count"),
      new ExpressionInfo(classOf[SortedDistinctCount].getName, "sorted_distinct_count"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "sorted_distinct_count(a)")
        SortedDistinctCount(args.head)
      }))

  /** Register the functions on an existing session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
