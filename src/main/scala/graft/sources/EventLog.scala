package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-explicit readers for raw event logs (CSV / JSON-lines) into the
  * canonical events shape. Two non-negotiables at 100 TB:
  *
  *  - **No schema inference.** Inferring runs a full extra pass over the
  *    input before the real job starts; both readers take the schema as
  *    a constant.
  *  - **Corrupt rows are data, not exceptions.** PERMISSIVE mode routes
  *    unparseable lines to a `_corrupt` column so one bad log line can't
  *    kill a 10^6-task ingest; [[partitionValid]] splits the streams.
  *
  * Timestamps normalize to nanosecond epoch longs (`tn`), matching the
  * events.parquet convention used across the query surface.
  */
object EventLog {

  /** Raw-side schema: ts as string (parsed explicitly), one corrupt-line
    * catch-all.
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", StringType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType),
    StructField("_corrupt", StringType)))

  // The raw string carries no zone, so parse with an explicit UTC offset
  // appended — to_timestamp alone resolves in the SESSION time zone, and
  // tn would silently shift on any deployment not pinned to UTC.
  // try_to_timestamp, not to_timestamp: under ANSI semantics (Spark 4
  // default) the latter THROWS on a malformed ts, so one bad log line
  // would kill the ingest job — the exact failure mode the quarantine
  // split exists to prevent. NULL here routes the row to quarantine.
  private def normalize(df: DataFrame): DataFrame =
    df.withColumn("tn",
      (unix_micros(try_to_timestamp(concat(col("ts"), lit("+00:00")),
        lit("yyyy-MM-dd HH:mm:ss.SSSSSSXXX"))) * 1000L))
      .select(col("event_id"), col("tn"), col("user_id"),
        col("event_type"), col("value"), col("props"), col("_corrupt"))

  /** Read JSON-lines event logs. */
  def jsonl(spark: SparkSession, path: String): DataFrame =
    normalize(spark.read
      .schema(rawSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path))

  /** Read headered CSV event logs. */
  def csv(spark: SparkSession, path: String): DataFrame =
    normalize(spark.read
      .schema(rawSchema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(path))

  /** Split into (valid, corrupt) — corrupt rows keep the offending raw
    * line for quarantine-and-replay. The parsed frame is cached first:
    * Spark refuses a corrupt-column-only projection pushed into a raw
    * file scan (the filter would see only the internal column), and the
    * split reads the parse output twice anyway.
    */
  def partitionValid(df: DataFrame): (DataFrame, DataFrame) = {
    val parsed = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // A structurally-valid row whose ts failed to parse (tn IS NULL) is
    // quarantined too — it would otherwise pass as 'valid' with a null
    // timestamp and poison every time-keyed downstream op.
    val tnOk = if (parsed.columns.contains("tn")) col("tn").isNotNull else lit(true)
    val valid = col("_corrupt").isNull && col("event_id").isNotNull && tnOk
    // Quarantine is the EXACT complement of valid (every predicate is an
    // is[Not]Null form, so the split is total — no three-valued-logic row
    // class can fall through). An earlier version required `_corrupt OR
    // (event_id AND !tnOk)`, which silently DROPPED parseable rows with a
    // null event_id — at ingest scale that is silent data loss, the one
    // failure mode a quarantine split exists to prevent.
    (parsed.where(valid).drop("_corrupt"),
      parsed.where(!valid)
        .select(coalesce(col("_corrupt"), to_json(struct(parsed.columns.filter(_ != "_corrupt").toIndexedSeq
          .map(col): _*))).as("_corrupt")))
  }
}
