package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Mutation, Pipeline, QueryDef, Relational, Spatial, Streaming}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each entry in [[queries]] is one operator from SURVEY §2 (or a
  * beyond-reference pipeline operator); [[oracleSql]] carries the DuckDB
  * equivalent the driver hash-compares against at sf0.01.
  */
object SparkEntry {

  private def all: Map[String, QueryDef] =
    Relational.defs ++ Spatial.defs ++ Pipeline.defs ++ Mutation.defs ++ Streaming.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all("q02_revenue_by_nation").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, d) => k -> d.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check.
    */
  def oracleSql: Map[String, String] =
    all.collect { case (k, QueryDef(_, Some(sql))) => k -> sql }
}
