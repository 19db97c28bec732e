package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J4 — the reference's `GetVennSet` (`Extensions/CommonExtensions.cs:9-47`):
  * classify two keyed sets into left-only / both / right-only in ONE pass.
  * Relationally a full outer join with null-side classification — one
  * shuffle total, versus three (except/intersect/except) for the naive
  * trio. Used by the reference to diff exclusion-folder lists on config
  * update (`Services/OpcuaHelperService.cs:142-164`).
  */
object VennJoin {

  /** Both inputs must contain `keys`; payload columns are suffixed _left /
    * _right. Output: keys ++ status ('left_only'|'both'|'right_only').
    */
  def vennJoin(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame = {
    val l = left.withColumn("_present_l", lit(true))
    val r = right.withColumn("_present_r", lit(true))
    l.join(r, keys, "full_outer")
      .withColumn("status",
        when(col("_present_l").isNotNull && col("_present_r").isNotNull, "both")
          .when(col("_present_l").isNotNull, "left_only")
          .otherwise("right_only"))
      .drop("_present_l", "_present_r")
  }
}
