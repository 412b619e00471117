package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Eager stage materialization with a deployment-safe mode switch.
  *
  * Multi-consumer stages in the probe/pipeline operators are materialized
  * ONCE (re-running a decode/hash stage per consumer is the measured
  * r16 regression class), historically via bare `localCheckpoint(true)`.
  * That idiom is right for a single-node bench but wrong at deployment
  * scale: localCheckpoint stores blocks UNREPLICATED on executors and
  * severs lineage, so any executor loss mid-query (routine under dynamic
  * allocation) aborts the job unrecoverably instead of recomputing —
  * Spark's documented caveat. Every operator call site routes through
  * [[mat]] so ONE session conf picks the deployment's trade-off:
  *
  *  - `spark.graft.materialize = local` (default): eager
  *    `localCheckpoint(true)` — zero-copy fast, lineage truncated,
  *    blocks die with their executor. Right for local/bench and for
  *    clusters that would rather rerun a failed query than pay
  *    replication.
  *  - `reliable`: eager `checkpoint(true)` against the session's
  *    checkpoint dir (`SparkContext.setCheckpointDir`, an HDFS/object-
  *    store path at deployment) — lineage truncated AND the
  *    materialization survives executor loss. The 100 TB setting.
  *  - `persist`: `persist(MEMORY_AND_DISK)` + eager count — blocks are
  *    recomputable from lineage on executor loss (no replication cost,
  *    no checkpoint IO), at the price of NOT truncating the plan. Not
  *    legal for iterative fixpoints (the plan doubles per pass), which
  *    is why [[matTruncating]] exists.
  *
  * All three modes materialize the same rows; StagesSpec pins result
  * parity and the lineage/storage properties of each.
  */
object Stages {

  /** Session conf key selecting the materialization mode. */
  final val ModeConf = "spark.graft.materialize"

  final val Local = "local"
  final val Reliable = "reliable"
  final val Persist = "persist"

  private def mode(df: DataFrame): String =
    df.sparkSession.conf.get(ModeConf, Local)

  /** Materialize `df` eagerly for multi-consumer reuse (mode above). */
  def mat(df: DataFrame): DataFrame = mode(df) match {
    case Reliable => df.checkpoint(eager = true)
    case Persist =>
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      // force the cache NOW so every consumer starts from the built
      // blocks; toRdd (not count()) so no aggregate query plans around it
      p.queryExecution.toRdd.count()
      p
    case _ => df.localCheckpoint(eager = true)
  }

  /** [[mat]] for iterative fixpoints (connected components): the plan
    * MUST truncate per pass or planning itself becomes the bottleneck,
    * so `persist` — which keeps lineage — promotes to `reliable` when a
    * checkpoint dir is set and degrades to `local` otherwise.
    */
  def matTruncating(df: DataFrame): DataFrame = mode(df) match {
    case Reliable => df.checkpoint(eager = true)
    case Persist if df.sparkSession.sparkContext.getCheckpointDir.isDefined =>
      df.checkpoint(eager = true)
    case _ => df.localCheckpoint(eager = true)
  }

  /** Release the blocks behind a [[mat]]/[[matTruncating]] result —
    * superseded fixpoint rounds must free their predecessor instead of
    * accumulating one labels-copy per pass. Non-blocking; safe on frames
    * that were never materialized. (Reliable checkpoint files are left
    * to the checkpoint dir's lifecycle, as with plain Spark.)
    */
  def release(df: DataFrame): Unit = {
    df.unpersist(blocking = false)
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false); ()
      case _ => ()
    }
  }
}
