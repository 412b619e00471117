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

  /** The 100 TB profile: [[tableProfile]] with the exact multi-column
    * `count(DISTINCT)` (and its Expand ×columns shuffle of raw values)
    * replaced by per-column HLL REGISTER state (the q73 sketch, grouped
    * by column): per column — n_rows, n_null, the exact integer HLL
    * denominator `hll_denom = Σ_buckets 2^(55 − max_rho)` and
    * `n_buckets_hit` (of 64). The caller turns (denom, hit) into the
    * usual float estimate `α·m²·2⁵⁵/denom` (+ linear counting when
    * hit < m); the OUTPUT stays integer-exact so the DuckDB twin replays
    * it bit-for-bit — the q73 register-exactness discipline applied to
    * profiling.
    *
    * Plan: still ONE scan — each row projects an array of
    * (col_idx, bucket, rho) structs (rho null for null values), one
    * explode (×columns, the same multiplier the exact path pays in
    * Expand — but the exchange after it is keyed (col, bucket) and
    * carries ≤ 64·columns mergeable register rows out of each task,
    * never raw values), then two tiny aggregates. Distinct state at any
    * corpus size is 64 longs per column.
    */
  def tableProfileSketch(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    val entries = cols.zipWithIndex.map { case (c, i) =>
      struct(
        lit(i).as("ci"),
        when(col(c).isNotNull,
          graft.functions.TextOps.portableHash(col(c).cast("string")))
          .as("hv"))
    }
    val nameFor = cols.zipWithIndex
      .foldLeft(lit(null).cast("string")) { case (e, (c, i)) =>
        when(col("ci") === i, c).otherwise(e)
      }
    df.select(explode(array(entries: _*)).as("e"))
      .select(col("e.ci").as("ci"),
        (col("e.hv") % 64).as("bucket"),
        when(col("e.hv").isNotNull,
          lit(55) - length(expr("trim(LEADING '0' FROM bin(e.hv div 64))")))
          .cast("long").as("rho"))
      .groupBy(col("ci"), col("bucket"))
      .agg(count(lit(1)).as("n"), count(col("rho")).as("nn"),
        max(col("rho")).as("max_rho"))
      .groupBy(col("ci"))
      .agg(sum(col("n")).as("n_rows"),
        (sum(col("n")) - sum(col("nn"))).as("n_null"),
        sum(when(col("max_rho").isNotNull,
          expr("shiftleft(cast(1 as bigint), cast(55 - max_rho as int))"))
          .otherwise(0L)).as("hll_denom"),
        count(col("max_rho")).as("n_buckets_hit"))
      .select(nameFor.as("col_name"), col("n_rows"), col("n_null"),
        col("hll_denom"), col("n_buckets_hit"))
  }

  /** DuckDB twin of [[tableProfileSketch]] (register-exact, q73's
    * convention; `bucket` for a null value is NULL so null rows never
    * touch a register but still count).
    */
  def tableProfileSketchSql(tbl: String, cols: Seq[String]): String = {
    import graft.functions.TextOps.portableHashSql
    val branches = cols.zipWithIndex.map { case (c, i) =>
      s"SELECT '$c' AS col_name, CASE WHEN $c IS NOT NULL THEN ${portableHashSql(s"CAST($c AS VARCHAR)")} END AS hv FROM $tbl"
    }.mkString(" UNION ALL ")
    s"""WITH e AS ($branches),
       |b AS (SELECT col_name, hv % 64 AS bucket,
       |  CASE WHEN hv IS NOT NULL
       |       THEN 55 - length(ltrim(bin(hv // 64), '0')) END AS rho FROM e),
       |r AS (SELECT col_name, bucket, count(*) AS n, count(rho) AS nn,
       |  max(rho) AS max_rho FROM b GROUP BY col_name, bucket)
       |SELECT col_name, CAST(sum(n) AS BIGINT) AS n_rows,
       |  CAST(sum(n) - sum(nn) AS BIGINT) AS n_null,
       |  CAST(coalesce(sum(CASE WHEN max_rho IS NOT NULL
       |    THEN 1::BIGINT << (55 - max_rho) ELSE 0 END), 0) AS BIGINT) AS hll_denom,
       |  count(max_rho) AS n_buckets_hit
       |FROM r GROUP BY col_name""".stripMargin.replace("\n", " ")
  }

  /** Caller-side float estimate from [[tableProfileSketch]]'s exact
    * integer state: standard HLL `α·m²/Σ2^-ρ` (denominators were scaled
    * by 2⁵⁵, so the numerator is too), with the linear-counting
    * correction for small cardinalities (empty buckets present).
    */
  def hllEstimate(hllDenom: Long, bucketsHit: Long, m: Int = 64): Double = {
    if (hllDenom == 0L) return 0.0
    val zeros = m - bucketsHit
    // Σ2^-ρ includes 2^0 = 1 per EMPTY bucket in standard HLL
    val denom = hllDenom.toDouble + zeros.toDouble * math.pow(2.0, 55)
    val alpha = 0.709 // α₆₄
    val raw = alpha * m.toDouble * m.toDouble * math.pow(2.0, 55) / denom
    if (raw <= 2.5 * m && zeros > 0) m.toDouble * math.log(m.toDouble / zeros)
    else raw
  }
}
