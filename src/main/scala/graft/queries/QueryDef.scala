package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One oracle-checked operator query: the Spark implementation plus the
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. Column names/types and value determinism must match exactly —
  * every aggregate is aliased identically on both sides, doubles are
  * computed via exact integer/decimal arithmetic, and both sides order by
  * a total key.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Normalize an event-time `ts` column to epoch NANOSECONDS as Long,
    * whatever the parquet physical type: ns-stored files already surface
    * as Long under the `nanosAsLong` legacy flag (pass-through);
    * us-precision TIMESTAMP columns (plain or NTZ — sessions run UTC)
    * convert exactly via `unix_micros × 1000`. Downstream bucket
    * arithmetic is then dtype-independent and matches the oracle side's
    * `epoch_ns(ts)`, which is equally agnostic in DuckDB.
    */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _: org.apache.spark.sql.types.TimestampType |
           _: org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr(
            "unix_micros(CAST(ts AS TIMESTAMP)) * 1000"))
      case other =>
        throw new IllegalStateException(s"events.ts: unexpected type $other")
    }

  /** The `events` table with `ts` as epoch-ns Long ([[normalizeTs]]). */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(tbl(spark, dir, "events"))
}
