package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.plans.{GeneratedTables, Mor}
import graft.sources.GenConfig

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a DuckDB-oracle twin in `oracleSql`;
  * column names and ordering are aligned on both sides (the driver's
  * compare sorts columns by name before hashing values).
  */
object SparkEntry {

  /** Flagship: the full reference pipeline (generate → commit 3 snapshots
    * → MOR read). Surviving rows = 5000 - 2000 - 2000 = 1000 on the
    * reference-default config (`config.toml:17-35`, `main.rs:334-345`).
    */
  def entry(spark: SparkSession): DataFrame = {
    val cfg = GenConfig.reference
    val root = GeneratedTables.ensure(spark, "entry", cfg)
    Mor.read(spark, root, cfg.namespace, cfg.tableName)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Registry.queries

  def oracleSql: Map[String, String] = graft.queries.Registry.oracleSql
}
