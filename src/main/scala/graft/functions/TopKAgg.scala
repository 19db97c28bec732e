package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Partial-aggregating top-k-per-group: a bounded ordered buffer as a
  * typed [[Aggregator]], so the exchange carries AT MOST k rows per group
  * instead of the group's entire row set. The window form
  * (`row_number().over(partitionBy(g).orderBy(...)) <= k`, q24) is
  * oracle-exact but shuffles every row to its group's partition before
  * discarding all but k; this form discards map-side — at 100 TB the
  * difference is the whole shuffle. Result is IDENTICAL to the window
  * form (same deterministic tie-break), which is exactly what q106's
  * oracle — q24's SQL verbatim — asserts.
  *
  * Ordering: value DESC (exact decimal comparison — double ties at 2
  * decimals are not binary-exact), id ASC as the deterministic
  * tie-break. Buffer kept sorted and trimmed to k on every insert/merge:
  * O(k) memory per group map-side, O(log k)-ish insert cost, associative
  * and commutative so any partition layout and merge order yields the
  * same top-k.
  */
object TopKAgg {

  /** (id, value) entry; value carried as BigDecimal for exact ordering. */
  final case class Entry(id: Long, value: java.math.BigDecimal)

  private val byValueDescIdAsc: Ordering[Entry] = (a: Entry, b: Entry) => {
    val c = b.value.compareTo(a.value) // DESC
    if (c != 0) c else java.lang.Long.compare(a.id, b.id)
  }

  /** Top-k over rows of (group, id, value); callers `groupByKey(_._1)`
    * and `agg(topK(k).toColumn)`.
    */
  final case class TopK(k: Int)
      extends Aggregator[(Long, Long, java.math.BigDecimal), Seq[Entry], Seq[Entry]] {
    require(k >= 1, s"k must be >= 1, got $k")

    override def zero: Seq[Entry] = Vector.empty

    private def insert(b: Seq[Entry], e: Entry): Seq[Entry] =
      if (b.length == k && byValueDescIdAsc.compare(b.last, e) <= 0) b // below the bar
      else ((b :+ e).sorted(byValueDescIdAsc)).take(k)

    override def reduce(b: Seq[Entry], row: (Long, Long, java.math.BigDecimal)): Seq[Entry] =
      insert(b, Entry(row._2, row._3))

    override def merge(a: Seq[Entry], b: Seq[Entry]): Seq[Entry] =
      (a ++ b).sorted(byValueDescIdAsc).take(k)

    override def finish(b: Seq[Entry]): Seq[Entry] = b

    override def bufferEncoder: Encoder[Seq[Entry]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Entry]] = ExpressionEncoder()
  }
}
