package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: the Spark formulation plus (optionally) the
  * equivalent DuckDB SQL the driver hash-compares against. Modules expose
  * `defs: Seq[QueryDef]`; SparkEntry aggregates them.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, sql: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(sql))
  def sparkOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
