package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Exact quantiles without a global sort — the 100 TB replacement for the
  * window-pass form (q69): a corpus-wide `row_number()` window is a total
  * sort of the dataset, which is exactly the plan a 1000-executor job
  * cannot afford. Radix selection finds the EXACT rank-`r` value in 4
  * passes over 16-bit digits instead:
  *
  *   pass j: count rows per (resolved-prefix, next-16-bit-digit) — a
  *   two-phase hash aggregate whose result is driver-bounded by the
  *   digit space (≤ targets × 65536 rows, INDEPENDENT of N) — then walk
  *   the histogram to resolve 16 more bits of each target's value.
  *
  * 1 metadata count + 4 narrow scans, no shuffle wider than the digit
  * histogram, no sort anywhere. Signed order is preserved by the usual
  * sign-bit flip (u = v XOR Long.MinValue makes signed order unsigned).
  * Rank convention matches q69: the p-quantile is the value at 1-based
  * ascending position ceil(p·n) — integer-exact for rational p.
  */
object Quantiles {

  private final case class Target(pNum: Int, var rank: Long, var prefix: Long = 0L)

  /** Quantiles of `valueCol` (cast to long) at probabilities
    * `pNums.map(_ / pDen)`. Returns (p_num, value) ordered by p_num;
    * empty input yields no rows.
    */
  def radixQuantiles(
      df: DataFrame,
      valueCol: String,
      pNums: Seq[Int],
      pDen: Int): DataFrame = {
    require(pNums.nonEmpty && pNums.forall(p => p > 0 && p <= pDen),
      s"probabilities must be in (0, 1]: $pNums / $pDen")
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("p_num", LongType, nullable = false),
      StructField("value", LongType, nullable = false)))

    val vals = df.select(col(valueCol).cast("long").as("v"))
      .where(col("v").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = vals.count()
      if (n == 0L)
        return spark.createDataFrame(
          new java.util.ArrayList[Row](), outSchema)

      val targets = pNums.map { p =>
        Target(p, (p.toLong * n + pDen - 1) / pDen) // ceil(p·n), ≥ 1
      }
      val u = col("v").bitwiseXOR(lit(Long.MinValue))

      for (pass <- 0 until 4) {
        val digShift = 48 - 16 * pass
        // prefix = the 16·pass bits already resolved (shared scan per
        // distinct prefix; targets collapse onto few prefixes fast)
        val prefixes = targets.map(_.prefix).distinct
        val pfxCol =
          if (pass == 0) lit(0L)
          else shiftrightunsigned(u, digShift + 16)
        val base =
          if (pass == 0) vals
          else vals.where(pfxCol.isin(prefixes: _*))
        val hist: Map[(Long, Long), Long] = base
          .groupBy(pfxCol.as("pfx"),
            shiftrightunsigned(u, digShift).bitwiseAND(lit(0xffffL)).as("dig"))
          .count()
          .collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
        // resolve 16 more bits of every target from the one histogram
        for (t <- targets) {
          val digits = hist.collect { case ((p, d), c) if p == t.prefix => (d, c) }
            .toSeq.sortBy(_._1)
          var cum = 0L
          var resolved = false
          for ((d, c) <- digits if !resolved) {
            if (cum + c >= t.rank) {
              t.prefix = (t.prefix << 16) | d
              t.rank -= cum
              resolved = true
            } else cum += c
          }
          assert(resolved, s"rank ${t.rank} beyond histogram mass $cum — count/histogram drift")
        }
      }

      val rows = new java.util.ArrayList[Row]()
      targets.sortBy(_.pNum).foreach { t =>
        rows.add(Row(t.pNum.toLong, t.prefix ^ Long.MinValue))
      }
      spark.createDataFrame(rows, outSchema)
    } finally vals.unpersist()
  }

  /** DuckDB twin: the definitional rank-select over a total order. */
  def radixQuantilesSql(
      tbl: String, valueExpr: String, pNums: Seq[Int], pDen: Int): String = {
    val pRows = pNums.map(p => s"($p)").mkString(", ")
    s"""WITH v AS (SELECT $valueExpr AS vc FROM $tbl WHERE $valueExpr IS NOT NULL),
       |n AS (SELECT count(*) AS c FROM v),
       |s AS (SELECT vc, row_number() OVER (ORDER BY vc) AS rn FROM v),
       |p(pn) AS (VALUES $pRows)
       |SELECT CAST(p.pn AS BIGINT) AS p_num, s.vc AS value
       |FROM p CROSS JOIN n JOIN s ON s.rn = (p.pn * n.c + $pDen - 1) // $pDen
       |ORDER BY p_num""".stripMargin.replace("\n", " ")
  }
}
