package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central registry combining every query family exposed through
  * `SparkEntry.queries` / `SparkEntry.oracleSql`.
  */
object Registry {
  private def families: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Generated.queries, Generated.oracleSql),
      (Relational.queries, Relational.oracleSql),
      (SqlSurface.queries, SqlSurface.oracleSql),
      (Extensions.queries, Extensions.oracleSql),
      (Formats.queries, Formats.oracleSql),
      (Analytics.queries, Analytics.oracleSql)
    )

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    families.map(_._1).reduce(_ ++ _)

  lazy val oracleSql: Map[String, String] =
    families.map(_._2).reduce(_ ++ _)
}
