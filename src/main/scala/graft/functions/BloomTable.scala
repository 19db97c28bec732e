package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Bloom filter as a mergeable TABLE with bit-exact cross-engine words —
  * the membership counterpart of the q132/q133/q139 sketch family. Where
  * q90's incremental dedup uses Spark's built-in BloomFilterAggregate as
  * an opaque binary (engine-specific, verdict-checked only), this bloom
  * is plain relational state: bit positions come from the exported
  * universal-hash family, words are `bit_or` aggregates of single-bit
  * longs, so the filter CONTENT reproduces bit-for-bit in any engine —
  * the oracle hash-matches the words, the probe verdicts, and the
  * measured false-positive count, not just an error flag.
  *
  * Words pack 62 bits, not 64: DuckDB raises on `1::BIGINT << 63`
  * (signed overflow) and the two-bit headroom costs 3% space for
  * engine-portable words.
  *
  * Merge = `bit_or` of words (set union — the q132 linearity argument,
  * OR instead of SUM); probe = all `k` positions set. Scale shape: the
  * build is one groupBy over (keys, word) — the shuffle carries at most
  * words-per-filter rows per partition; probes broadcast-join the
  * filter table (filters are words·8 bytes — tiny by construction).
  */
object BloomTable {

  val Mod: Long = Dedup.MinhashMod
  val BitsPerWord = 62

  /** Default geometry: 64 words × 62 bits = 3968 bits, 3 hash rows. */
  val Words = 64
  val Hashes = 3

  private def jCol(k: Int): Column = explode(array((0 until k).map(lit): _*)).as("j")

  private def posCol(item: Column, k: Int, mBits: Int): Column = {
    val as = array((0 until k).map(j => lit(Dedup.permA(j))): _*)
    val bs = array((0 until k).map(j => lit(Dedup.permB(j))): _*)
    ((item % Mod) * element_at(as, col("j") + 1) + element_at(bs, col("j") + 1)) % Mod % mBits
  }

  /** Build one filter per key group: rows (keys..., word, bits). */
  def build(df: DataFrame, keys: Seq[String], item: Column,
            words: Int = Words, hashes: Int = Hashes): DataFrame = {
    val m = words * BitsPerWord
    df.select((keys.map(col) :+ item.as("item")): _*)
      .withColumn("j", jCol(hashes))
      .withColumn("pos", posCol(col("item"), hashes, m))
      .withColumn("word", expr(s"pos div $BitsPerWord"))
      .withColumn("bit", col("pos") % BitsPerWord)
      .groupBy((keys.map(col) :+ col("word")): _*)
      .agg(bit_or(expr(s"shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))")).as("bits"))
  }

  /** Merge filters built over disjoint slices: OR the words. */
  def merge(filters: DataFrame, keys: Seq[String]): DataFrame =
    filters.groupBy((keys.map(col) :+ col("word")): _*)
      .agg(bit_or(col("bits")).as("bits"))

  /** Probe membership: `probes` carries `keys` + `item`; output adds
    * `maybe` (all k bits set — definite-no when false, maybe when true).
    */
  def probe(filter: DataFrame, keys: Seq[String], probes: DataFrame,
            words: Int = Words, hashes: Int = Hashes): DataFrame = {
    val m = words * BitsPerWord
    val probeCols = probes.columns.map(col).toSeq
    probes
      .withColumn("j", jCol(hashes))
      .withColumn("pos", posCol(col("item"), hashes, m))
      .withColumn("word", expr(s"pos div $BitsPerWord"))
      .withColumn("bit", col("pos") % BitsPerWord)
      .join(filter, keys :+ "word", "left")
      .withColumn("hit",
        (coalesce(col("bits"), lit(0L))
          .bitwiseAND(expr(s"shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))")) =!= 0L)
          .cast("int"))
      .groupBy(probeCols: _*)
      .agg((sum(col("hit")) === hashes).as("maybe"))
  }

  /** The oracle-side hash dimension (j, a, b) as a VALUES CTE. */
  def oracleJs(hashes: Int = Hashes): String =
    (0 until hashes)
      .map(j => s"(${j}, ${Dedup.permA(j)}, ${Dedup.permB(j)})")
      .mkString("js(j, a, b) AS (VALUES ", ", ", ")")
}
