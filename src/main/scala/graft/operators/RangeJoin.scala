package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval join (extension operator): pairs of left/right rows with the
  * same key whose timestamps lie within `toleranceMicros` of each other.
  *
  * A naive theta join (`abs(l.ts − r.ts) <= tol`) is O(|L|·|R|) per key —
  * Spark plans it as a broadcast nested loop and it dies at scale. Here
  * time is bucketed into tolerance-width bins: the left side explodes to
  * its bin and both neighbors, the right side keeps its one bin, and the
  * join becomes an EQUI-join on (key, bin) followed by the exact
  * predicate. Any within-tolerance pair differs by at most one bin, so
  * recall is exact; each right row has exactly one bin, so no pair
  * duplicates. Work is proportional to pairs in adjacent bins — the
  * shuffle partitions by (key, bin), and skewed buckets split under AQE.
  */
object RangeJoin {

  /** Inner interval join returning exactly the within-tolerance pairs,
    * each once. Right columns are prefixed `r_`. For outer shapes,
    * aggregate the pairs and left-join the result back (see q56) — an
    * outer bucketed join can silently drop left rows whose only bin
    * matches all fail the exact predicate.
    */
  def within(left: DataFrame, right: DataFrame, key: String,
             leftTs: String, rightTs: String,
             toleranceMicros: Long): DataFrame = {
    val l = left
      .withColumn("__bin0", (unix_micros(col(leftTs)) / toleranceMicros).cast("long"))
      .withColumn("__bin", explode(array(col("__bin0") - 1, col("__bin0"), col("__bin0") + 1)))
      .drop("__bin0")
    val r = right.columns.foldLeft(right)((d, c) =>
        d.withColumnRenamed(c, if (c == key) c else s"r_$c"))
      .withColumn("__bin", (unix_micros(col(s"r_$rightTs")) / toleranceMicros).cast("long"))
    l.join(r, Seq(key, "__bin"))
      .filter(abs(unix_micros(col(leftTs)) - unix_micros(col(s"r_$rightTs"))) <= toleranceMicros)
      .drop("__bin")
  }
}
