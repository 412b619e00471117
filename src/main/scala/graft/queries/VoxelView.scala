package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic voxel view derived from the driver's `lineitem`
  * parquet — the bridge that lets the volumetric operators (cutout, id
  * filter, bbox, downsample, Morton addressing, merge kernels) be checked
  * against a DuckDB oracle: both engines derive the *same* voxel table from
  * the same parquet with integer-only arithmetic, so every spatial operator
  * has an exact relational oracle.
  *
  * Columns: (t, x, y, z, id) — id 0 is background (~1 voxel in 7).
  * Key uniqueness is guaranteed by deriving coordinates from
  * (l_orderkey, l_linenumber), which is the table's primary key.
  */
object VoxelView {

  /** The lookupKey the oracle-checked spatial queries run under. */
  val LK = "4&3&2"

  /** [[df]] projected to the engine contract (lookupKey, res, ..., value)
    * — shared by every spatial/mutation query file so the column mapping
    * lives in exactly one place.
    */
  def engineDf(spark: SparkSession, dir: String): DataFrame =
    df(spark, dir).select(lit(LK).as("lookupKey"), lit(0).as("res"),
      col("t"), col("x"), col("y"), col("z"), col("id").as("value"))

  /** [[df2]] under the engine contract. */
  def engineDf2(spark: SparkSession, dir: String): DataFrame =
    df2(spark, dir).select(lit(LK).as("lookupKey"), lit(0).as("res"),
      col("t"), col("x"), col("y"), col("z"), col("id").as("value"))

  def df(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
      .select(
        (col("l_linenumber") % 2).cast("long").as("t"),
        (col("l_orderkey") % 64).cast("long").as("x"),
        (((col("l_orderkey") * 7 + col("l_linenumber")) % 4) * 64 +
          (col("l_partkey") % 29)).cast("long").as("y"),
        (col("l_suppkey") % 16).cast("long").as("z"),
        when(col("l_partkey") % 7 === 0, 0L)
          .otherwise((col("l_partkey") % 50) + 1).cast("long").as("id"))

  /** The same derivation in DuckDB SQL (the driver runs this verbatim). */
  val sql: String =
    """SELECT CAST(l_linenumber % 2 AS BIGINT) AS t,
      |       CAST(l_orderkey % 64 AS BIGINT) AS x,
      |       CAST(((l_orderkey * 7 + l_linenumber) % 4) * 64 + (l_partkey % 29) AS BIGINT) AS y,
      |       CAST(l_suppkey % 16 AS BIGINT) AS z,
      |       CAST(CASE WHEN l_partkey % 7 = 0 THEN 0 ELSE (l_partkey % 50) + 1 END AS BIGINT) AS id
      |FROM lineitem""".stripMargin.replace("\n", " ")

  /** A second, differently-seeded voxel derivation over the same coordinate
    * ranges — the "incoming write" side for the merge-kernel queries
    * (M1-M3): overlaps [[df]] partially so overwrite/exception/shave rules
    * all exercise both matched and unmatched branches.
    */
  def df2(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
      .select(
        (col("l_suppkey") % 2).cast("long").as("t"),
        ((col("l_orderkey") * 3 + col("l_suppkey")) % 64).cast("long").as("x"),
        (((col("l_suppkey") * 11 + col("l_linenumber")) % 4) * 64 +
          (col("l_orderkey") % 29)).cast("long").as("y"),
        (col("l_partkey") % 16).cast("long").as("z"),
        when(col("l_orderkey") % 5 === 0, 0L)
          .otherwise((col("l_suppkey") % 50) + 1).cast("long").as("id"))

  val sql2: String =
    """SELECT CAST(l_suppkey % 2 AS BIGINT) AS t,
      |       CAST((l_orderkey * 3 + l_suppkey) % 64 AS BIGINT) AS x,
      |       CAST(((l_suppkey * 11 + l_linenumber) % 4) * 64 + (l_orderkey % 29) AS BIGINT) AS y,
      |       CAST(l_partkey % 16 AS BIGINT) AS z,
      |       CAST(CASE WHEN l_orderkey % 5 = 0 THEN 0 ELSE (l_suppkey % 50) + 1 END AS BIGINT) AS id
      |FROM lineitem""".stripMargin.replace("\n", " ")
}
