package graft.functions

import org.apache.spark.sql.DataFrame

/** Parallelism repair for CPU-dense per-row stages.
  *
  * A scan's task count comes from its splits; a small or single-row-group
  * file yields ONE task, which serializes every downstream narrow
  * transform (gram hashing, md5 MinHash, quantization) no matter how many
  * cores the session has. [[fanOut]] inserts a round-robin exchange ONLY
  * in that case — when the source already provides at least the session's
  * default parallelism (any production-scale table: 100 TB is ~10^6
  * splits), it is a provable no-op and no shuffle is added. Callers
  * project to the needed columns first so the exchange ships only what
  * the downstream stage reads.
  */
object Par {

  /** `df`, repartitioned to the session default parallelism iff its
    * current plan would execute with fewer partitions.
    *
    * Only scan-shaped plans are probed: if the plan already contains a
    * shuffle-introducing operator (aggregate, join, distinct, sort,
    * repartition, window), its exchange output is already
    * `spark.sql.shuffle.partitions` wide, so fan-out would be a no-op —
    * and probing `.rdd` there would be actively harmful, because under
    * AQE it materializes every upstream shuffle stage (real jobs whose
    * results the actual action cannot reuse). For exchange-free plans,
    * `.rdd` only plans the lineage; no job runs.
    */
  def fanOut(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    val hasExchange = df.queryExecution.analyzed.collectFirst {
      case _: Aggregate | _: Join | _: Distinct | _: Deduplicate | _: Sort |
          _: RepartitionOperation | _: Window => ()
    }.isDefined
    if (hasExchange) df
    else {
      val target = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
    }
  }
}
