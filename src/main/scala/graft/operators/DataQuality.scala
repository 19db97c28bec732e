package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Data-quality gates for pipeline tables — the Deequ/expectations idea
  * re-expressed declaratively: a profile pass that summarizes every
  * column in one scan, and composable constraint checks that each emit
  * one (rule, n_violations, pass) row. A 100 TB ingest runs these
  * between snapshot and training consumption; they are the
  * operational counterpart of [[FeatureEng.snapshotDiff]].
  */
object DataQuality {

  /** One-pass column profiler: callers pass each column pre-stringified
    * with DETERMINISTIC formatting (explicit date_format / integer
    * casts — never raw double→string, whose rendering is
    * engine-specific). The unpivoted (column, value) frame aggregates
    * twice — value-grain counts with map-side combine, then column-dim
    * stats — so the table is scanned once and the only row-grain
    * exchange is the (column, value) agg. Per column: row count, null
    * count, exact distinct count, lexicographic min/max, and the top
    * value by (count desc, value asc).
    */
  def profile(df: DataFrame, columns: Seq[(String, Column)]): DataFrame = {
    val unpivoted = df.select(explode(array(columns.map { case (nm, c) =>
      struct(lit(nm).as("col_name"), c.cast("string").as("value"))
    }: _*)).as("cv"))
      .select(col("cv.col_name").as("col_name"), col("cv.value").as("value"))
    // count(lit(1)), not count(value): null-valued rows group into one
    // null row whose cnt must count them, not drop them
    val counts = unpivoted.groupBy("col_name", "value")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("col_name")
      .orderBy(col("value").isNull.asc, col("cnt").desc, col("value").asc)
    counts
      .withColumn("rk", row_number().over(w))
      .groupBy("col_name")
      .agg(
        sum("cnt").as("n"),
        sum(when(col("value").isNull, col("cnt")).otherwise(0L)).as("n_null"),
        sum(when(col("value").isNotNull, 1L).otherwise(0L)).as("n_distinct"),
        min("value").as("min_value"),
        max("value").as("max_value"),
        max(when(col("rk") === 1 && col("value").isNotNull, col("value")))
          .as("top_value"),
        max(when(col("rk") === 1 && col("value").isNotNull, col("cnt")))
          .as("top_count"))
  }

  /** Duplicate-key rows beyond the first occurrence of each key. */
  def uniqueness(name: String, df: DataFrame, keys: Seq[String]): DataFrame =
    ruleRow(name, df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(col("c") - 1), lit(0L)).cast(LongType).as("v")))

  /** Child keys with no matching parent (referential integrity). */
  def referential(name: String, child: DataFrame, childKey: Column,
      parent: DataFrame, parentKey: Column): DataFrame =
    ruleRow(name, child.select(childKey.as("k"))
      .join(parent.select(parentKey.as("k")).distinct(), Seq("k"), "left_anti")
      .agg(count(lit(1)).as("v")))

  /** Rows whose value falls outside [lo, hi] (nulls count as violations). */
  def inRange(name: String, df: DataFrame, c: Column,
      lo: Double, hi: Double): DataFrame =
    ruleRow(name, df.agg(sum(
      when(c.isNull || c < lo || c > hi, 1L).otherwise(0L)).as("v")))

  /** Null-valued rows. */
  def notNull(name: String, df: DataFrame, c: Column): DataFrame =
    ruleRow(name, df.agg(sum(when(c.isNull, 1L).otherwise(0L)).as("v")))

  /** Rows whose value is outside the accepted set (nulls violate). */
  def acceptedValues(name: String, df: DataFrame, c: Column,
      vals: Seq[String]): DataFrame =
    ruleRow(name, df.agg(sum(
      when(c.isin(vals.map(lit): _*), 0L).otherwise(1L)).as("v")))

  private def ruleRow(name: String, agg: DataFrame): DataFrame =
    agg.select(lit(name).as("rule"),
      coalesce(col("v"), lit(0L)).cast(LongType).as("n_violations"))

  /** The report: one row per rule with a pass verdict. Each rule is its
    * own bounded aggregation (different rules read different tables);
    * the union is rule-dim-sized.
    */
  def report(rules: Seq[DataFrame]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    rules.reduce(_ unionAll _)
      .withColumn("pass", col("n_violations") === 0L)
  }

  /** k-anonymity audit — the release gate for shared corpora: every
    * quasi-identifier combination (the columns an adversary can link
    * on) must cover at least `k` rows, or those rows are re-identifiable
    * and must be suppressed/generalized before release. One grouped
    * aggregation at the quasi-identifier grain; output one row per
    * combination with its size and the suppression verdict — the
    * summary a release pipeline joins back to drop or coarsen
    * offenders.
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty && k >= 1, "need quasi columns and k >= 1")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("suppress", col("n") < k)
  }
}
