package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right payload with
  * right.ts <= left.ts within the same key (extension operator — the
  * reference's closest construct is the staleness gate, SURVEY.md §2.4).
  *
  * Implemented with the union + running-`last(ignoreNulls)` trick: tag the
  * sides, union, and take the running last right payload over a
  * (key, ts, side)-sorted window. ONE shuffle on the key and a sort within
  * partitions — no range-join row explosion (a naive `ts <= ts` theta join
  * is O(|L|·|R|) per key and is exactly what kills range joins at 100 TB).
  * Skewed keys split under AQE since the exchange is a plain hash
  * partition on the key.
  */
object AsOfJoin {

  /** `right` must be unique per (key, ts) — pre-aggregate it otherwise.
    * Right rows at a timestamp EQUAL to a left row's are visible
    * (inclusive bound): sides sort right-before-left at equal ts. The
    * matched payload lands in a struct column `asof` (null when no right
    * row precedes the left row).
    */
  def leftAsOf(left: DataFrame, right: DataFrame, key: String, ts: String,
               payloadCols: Seq[String]): DataFrame = {
    val r = right.select(col(key), col(ts), lit(0).as("__side"),
      struct(payloadCols.map(col): _*).as("asof"))
    val l = left.withColumn("__side", lit(1))
      .withColumn("asof", lit(null).cast(r.schema("asof").dataType))
    val w = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l, allowMissingColumns = true)
      .withColumn("asof", last(col("asof"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side")
  }
}
