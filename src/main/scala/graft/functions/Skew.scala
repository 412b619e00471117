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
    * across `salts` sub-partitions. The salt is derived (xxhash64 of the
    * whole fact row, mod `salts`) rather than random, so the plan stays
    * deterministic and retried tasks recompute identical output.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String], salts: Int): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col): _*), lit(salts)).cast("int"))
    val saltedDim = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedFact.join(saltedDim, keys :+ "__salt").drop("__salt")
  }
}
