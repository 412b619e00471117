package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** First-class curation/dedup reporting over the verdict logs every
  * ingest gate in this library writes ([[graft.streaming
  * .StreamingRawIngest]], [[graft.streaming.StreamingMediaIngest]],
  * [[graft.streaming.StreamingDedup]], and any batch pipeline that logs
  * per-doc keep/drop verdicts) — the one-groupBy summary an operator
  * otherwise writes by hand after every run.
  */
object Reports {

  /** Per-group curation summary over a verdict log: documents seen /
    * kept / dropped, the drop rate in integer BASIS POINTS
    * (`n_dropped · 10000 div n_docs` — exact integer math, so the same
    * number falls out of any engine), and, when `bytesCol` names a
    * per-doc payload size, the bytes ingested and bytes removed by the
    * gate.
    *
    * Output: groupCols..., n_docs, n_kept, n_dropped, drop_bp,
    * bytes_total, bytes_removed (the byte columns are 0 when the log
    * carries no sizes — media verdict logs, for instance, log
    * fingerprint verdicts, not payloads).
    *
    * Scale: one map-side-combined aggregate over the log, grouped on
    * low-cardinality report keys (source/split/modality/batch) — no
    * joins, no windows; safe to run over a 100 TB deployment's full
    * verdict history as-is.
    */
  def curationReport(
      verdicts: DataFrame,
      keptCol: String,
      groupCols: Seq[String],
      bytesCol: Option[String] = None): DataFrame = {
    require(groupCols.nonEmpty, "curationReport needs at least one group column")
    val bytes = bytesCol.map(c => col(c).cast("long")).getOrElse(lit(0L))
    verdicts
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col(keptCol), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col(keptCol), 0L).otherwise(1L)).as("n_dropped"),
        sum(bytes).as("bytes_total"),
        sum(when(col(keptCol), lit(0L)).otherwise(bytes)).as("bytes_removed"))
      .select(
        groupCols.map(col) ++ Seq(
          col("n_docs"), col("n_kept"), col("n_dropped"),
          expr("n_dropped * 10000 div n_docs").as("drop_bp"),
          col("bytes_total"), col("bytes_removed")): _*)
  }

  /** Span-scrub coverage report — the [[curationReport]] analog for
    * span-granular operators ([[TextOps.scrubDuplicatedSpans]],
    * [[TextOps.duplicatedSpans]]): per group, documents touched, spans,
    * duplicated windows, and covered tokens/bytes. `spans` must carry
    * (groupCols..., n_windows, span_start, span_end, byte_start,
    * byte_end) — [[TextOps.duplicatedSpans]] output joined to whatever
    * grouping attributes the caller reports on.
    */
  def spanCoverageReport(
      spans: DataFrame,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "spanCoverageReport needs at least one group column")
    spans
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_spans"),
        sum(col("n_windows")).as("n_windows"),
        sum(col("span_end") - col("span_start")).as("tokens_covered"),
        sum(col("byte_end") - col("byte_start")).as("bytes_covered"))
  }
}
