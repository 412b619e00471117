package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One buffered write: the streaming analog of the reference's write-
  * buffer entry `WRITE-CUBOID&{...}&{uuid}` (`rediskvio.py:220-242`) —
  * a cuboid key plus a monotone sequence for last-writer-wins ordering.
  */
final case class WriteEvent(
    lookupKey: String,
    res: Int,
    t: Int,
    morton: Long,
    seq: Long,
    data: Array[Byte])

/** Structured-Streaming operators beyond the ingest drain: event-time
  * windowed aggregation with watermarking, and the keyed page-out dedup
  * state (SURVEY W2: `flatMapGroupsWithState` keyed by the cuboid key
  * replaces the Redis WATCH/MULTI page-out set, `state.py:332-380`).
  */
object StreamOps {

  /** Event-time tumbling-window aggregate with a watermark: the streaming
    * form of q05 (`withWatermark` bounds state; late events beyond the
    * watermark are dropped).
    */
  def windowedEventCounts(
      events: DataFrame,
      tsCol: String = "ts",
      watermark: String = "10 minutes",
      windowLen: String = "5 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("total"))

  /** Stream-stream interval join: correlate a write stream with its ack
    * stream on the cuboid key, accepting acks within `within` after the
    * write. Both sides carry watermarks, so Spark bounds the join state
    * (a write's buffered row is dropped once the ack watermark passes
    * `w_ts + within`) — the property that keeps a continuous 100 TB
    * ingest's state finite. Columns: writes(w_key, w_ts, …),
    * acks(a_key, a_ts, …).
    */
  def ackJoin(
      writes: DataFrame,
      acks: DataFrame,
      within: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    writes.withWatermark("w_ts", watermark)
      .join(
        acks.withWatermark("a_ts", watermark),
        expr(s"w_key = a_key AND a_ts >= w_ts AND a_ts <= w_ts + interval $within"))

  /** W2 page-out dedup: first event per cuboid key wins while the key is
    * in-flight; later events for the same key are suppressed (the
    * reference's `in_page_out` gate — losers there became delayed writes,
    * which the per-batch snapshot commit of [[StreamingIngest]] makes
    * unnecessary). State is kept for the life of the drain (`NoTimeout`):
    * the availableNow ingest runs bounded drains, so state ends with the
    * query — a continuous deployment would swap in a processing-time
    * timeout to mirror the reference's page-out temp-key TTL
    * (`state.py:356`).
    */
  def dedupInFlight(writes: Dataset[WriteEvent]): Dataset[WriteEvent] = {
    import writes.sparkSession.implicits._
    writes
      .groupByKey(w => (w.lookupKey, w.res, w.t, w.morton))
      .flatMapGroupsWithState[Boolean, WriteEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, events, state: GroupState[Boolean]) =>
          if (state.exists) {
            Iterator.empty // key already in flight: suppress
          } else {
            state.update(true)
            // lowest seq wins deterministically within the batch
            events.toSeq.sortBy(_.seq).headOption.iterator
          }
      }
  }
}
