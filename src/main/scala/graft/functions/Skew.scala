package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hot-key (skew) mitigation for shuffle joins.
  *
  * AQE's skew-join split handles sort-merge joins it can observe, but not
  * every skewed exchange (stream-static joins, pre-partitioned reuse, or
  * an aggregation keyed on the join output). Salting is the explicit
  * fallback: the skewed fact side spreads each key over `salts` synthetic
  * sub-keys, the dimension side is replicated `salts`×, and the join key
  * becomes (key, salt) — a hot key's rows then land on `salts` shuffle
  * partitions instead of one. Cost: dim side grows `salts`×, so use for
  * dimension tables too big to broadcast but far smaller than the fact.
  */
object Skew {

  /** Inner equi-join of a skewed `fact` against `dim` on `keys`, salted
    * across `salts` sub-partitions. The salt is derived (xxhash64 of
    * `saltCols` — by default every fact column — mod `salts`) rather than
    * random, so the plan stays deterministic and retried tasks recompute
    * identical output.
    *
    * Limitations of the derived salt, and what to pass instead:
    *  - **Byte-identical duplicate fact rows all hash to ONE salt**, so a
    *    hot key consisting of duplicated rows is not spread at all. Pass
    *    `saltCols` naming a column that discriminates duplicates (an
    *    ingest offset, a surrogate id), or pre-stamp the frame with
    *    `withRowSalt` and pass that column.
    *  - xxhash64 throws on MapType columns; pass an explicit `saltCols`
    *    excluding them.
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      salts: Int,
      saltCols: Seq[String] = Nil): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val hashed = (if (saltCols.nonEmpty) saltCols else fact.columns.toSeq).map(col)
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(hashed: _*), lit(salts)).cast("int"))
    val saltedDim = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedFact.join(saltedDim, keys :+ "__salt").drop("__salt")
  }

  /** Stamp a per-partition counter column usable as a duplicate-proof
    * salt source: deterministic given a fixed partitioning (task retries
    * recompute the same values), and distinct for byte-identical rows —
    * the degenerate case the row-hash salt cannot spread.
    */
  def withRowSalt(df: DataFrame, name: String = "__row_salt"): DataFrame =
    df.withColumn(name, monotonically_increasing_id())
}
