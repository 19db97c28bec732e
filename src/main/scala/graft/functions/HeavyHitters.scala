package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.Encoder

/** Misra-Gries heavy-hitters summary as a mergeable Spark aggregate — the
  * frequent-items sketch beside the HLL cardinality sketch (q29/q81):
  * approximate token frequencies at 100 TB where an exact groupBy over
  * trillions of distinct n-grams is the dominant shuffle.
  *
  * Implemented as a typed [[Aggregator]] registered through
  * `functions.udaf` — Spark's supported custom-aggregate path (it plans
  * as a TypedImperativeAggregate with map-side partial aggregation and
  * object buffers, exactly like the built-in ApproximatePercentile; the
  * buffer crosses the exchange as ONE summary per partition, never rows).
  * The merge is the Agarwal-et-al "mergeable summaries" construction, so
  * the guarantee below holds for ANY partitioning and merge order —
  * which is also why the raw sketch is not cross-engine comparable and
  * q105 verifies the THEOREM (presence + error bound) rather than the
  * bytes, the q81 pattern.
  *
  * Guarantee: estimates only undercount, by at most N/(k+1) total
  * (N = stream length); hence every token with true count > N/(k+1)
  * survives in the final summary. Proof sketch: each compression step
  * subtracts `sub` (the (k+1)-th largest count) from every surviving
  * counter and drops the rest, removing ≥ (k+1)·sub mass from a total of
  * N, so the cumulative subtraction — an upper bound on any token's
  * undercount — is ≤ N/(k+1).
  */
object HeavyHitters {

  /** `k`: summary capacity. The working buffer is allowed to grow to 2k
    * between compressions (amortizes the sort), and `finish` compresses
    * to k, so the error constant is governed by k alone.
    */
  final case class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k >= 1, s"k must be >= 1, got $k")
    private val cap = 2 * k

    override def zero: Map[String, Long] = Map.empty

    private def compress(m: Map[String, Long], to: Int): Map[String, Long] =
      if (m.size <= to) m
      else {
        val sub = m.values.toArray.sorted(Ordering[Long].reverse).apply(to)
        m.collect { case (t, c) if c > sub => t -> (c - sub) }
      }

    override def reduce(b: Map[String, Long], tok: String): Map[String, Long] = {
      val nb = b.updated(tok, b.getOrElse(tok, 0L) + 1L)
      if (nb.size > cap) compress(nb, k) else nb
    }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val m = b.foldLeft(a) { case (acc, (t, c)) => acc.updated(t, acc.getOrElse(t, 0L) + c) }
      if (m.size > cap) compress(m, k) else m
    }

    override def finish(m: Map[String, Long]): Map[String, Long] = compress(m, k)

    override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  }

  /** Column-usable form: `df.agg(misraGries(64)(col("tok")))` yields a
    * map<string,bigint> of ≤ k candidate heavy hitters and their
    * (under-)estimates.
    */
  def misraGries(k: Int): UserDefinedFunction = udaf(MisraGries(k))
}
