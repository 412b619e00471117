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
}
