package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are declared per-module as [[QueryDef]]s and aggregated here;
  * every SQL-expressible operator carries a DuckDB oracle.
  */
object SparkEntry {

  private def allDefs: Seq[QueryDef] =
    ReferenceQueries.defs ++ ControlPlaneQueries.defs ++ RelationalQueries.defs ++
      DedupQueries.defs ++ SimilarityQueries.defs ++ TextQueries.defs ++
      TrainingQueries.defs ++ FeatureQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The SURVEY §7.3 minimum slice: gates → scaling → last-value-per-key →
    * liveness → modvalues-shaped current-value table.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q07_current_values")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
