package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-scan table profiling — the `ANALYZE`-style corpus health check a
  * curation run starts and ends with: per column, row count, null count,
  * exact distinct count, and lexicographic min/max of the string form.
  * Everything is computed in ONE aggregate over ONE scan (no per-column
  * passes), then the single result row is unpivoted driver-free into one
  * row per column.
  *
  * Scale: the only exchange is the global aggregate itself. The exact
  * multi-column `count(DISTINCT …)` plans as Spark's Expand (the scan is
  * replicated ×columns inside the map stage — the standard ANALYZE cost,
  * still one pass over storage); a 100 TB profile that can tolerate ±2%
  * swaps the distinct counts for the mergeable HLL registers of q73 and
  * keeps everything else identical. Min/max compare the STRING form on
  * both engines (`CAST(c AS VARCHAR)` in the twin), so numeric columns
  * profile lexicographically — exact and portable, if not numeric order;
  * the point of the column is domain eyeballing, not arithmetic.
  */
object Profile {

  /** Profile `cols` of `df` in one scan: one output row per column —
    * (col_name, n_rows, n_null, n_distinct, min_str, max_str).
    */
  def tableProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c).cast("string")).as(s"__min_$c"),
        max(col(c).cast("string")).as(s"__max_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_str"),
        col(s"__max_$c").as("max_str"))
    }
    row.select(explode(array(stacked: _*)).as("p")).select("p.*")
  }

  /** DuckDB twin of [[tableProfile]] — a UNION ALL of per-column
    * profiles (the oracle may scan per column; the Spark side is the
    * one-pass contract).
    */
  def tableProfileSql(tbl: String, cols: Seq[String]): String =
    cols.map { c =>
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |  count(*) - count($c) AS n_null,
         |  count(DISTINCT $c) AS n_distinct,
         |  min(CAST($c AS VARCHAR)) AS min_str,
         |  max(CAST($c AS VARCHAR)) AS max_str FROM $tbl""".stripMargin
        .replace("\n", " ")
    }.mkString(" UNION ALL ")
}
