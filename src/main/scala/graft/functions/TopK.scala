package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Ascending, AttributeReference, Descending, SortOrder}
import org.apache.spark.sql.graft.{Bridge, GroupedTopKStrategy}
import org.apache.spark.sql.types.LongType

import graft.plans.GroupedTopK

/** Dataset-level entry point for the custom [[graft.plans.GroupedTopK]]
  * operator — the bounded-heap replacement for the
  * `row_number().over(Window.partitionBy(keys).orderBy(...)) <= k` idiom
  * on high-fan-in groups (ANN rerank, per-query candidate ranking).
  */
object TopK {

  /** Ensure the planner strategy is installed on `df`'s session
    * (idempotent; `spark.experimental.extraStrategies` is the public
    * live-session hook, `GraftExtensions` covers config-time injection).
    */
  private def ensureStrategy(df: DataFrame): Unit = {
    val exp = df.sparkSession.experimental
    if (!exp.extraStrategies.contains(GroupedTopKStrategy))
      exp.extraStrategies = exp.extraStrategies :+ GroupedTopKStrategy
  }

  /** Install the window→GroupedTopK auto-rewrite ([[graft.plans
    * .WindowTopKRewrite]]) plus the planner strategy on a LIVE session —
    * the `experimental` twin of the `GraftExtensions` config-time hook.
    * After this, plain `row_number() OVER (...) <= k` queries plan as
    * the bounded heap with no API change.
    */
  def installRewrite(spark: org.apache.spark.sql.SparkSession): Unit = {
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(GroupedTopKStrategy))
      exp.extraStrategies = exp.extraStrategies :+ GroupedTopKStrategy
    if (!exp.extraOptimizations.contains(graft.plans.WindowTopKRewrite))
      exp.extraOptimizations = exp.extraOptimizations :+ graft.plans.WindowTopKRewrite
  }

  /** Top `k` rows per distinct `keys` under `orderBy` (column name →
    * descending?), with a 1-based `rankName` LongType column appended.
    * Exactly `row_number()` semantics; ties resolve by the later orderBy
    * columns, so include a unique tie-break column for determinism.
    */
  def perKey(
      df: DataFrame,
      keys: Seq[String],
      orderBy: Seq[(String, Boolean)],
      k: Int,
      rankName: String = "rk"): DataFrame = {
    ensureStrategy(df)
    val plan = df.queryExecution.analyzed
    def attr(name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name).mkString(", ")}"))
    val keyExprs = keys.map(attr)
    val ordering = orderBy.map { case (name, desc) =>
      SortOrder(attr(name), if (desc) Descending else Ascending)
    }
    val rankAttr = AttributeReference(rankName, LongType, nullable = false)()
    Bridge.dataFrame(df.sparkSession,
      GroupedTopK(keyExprs, ordering, k, rankAttr, plan))
  }
}
