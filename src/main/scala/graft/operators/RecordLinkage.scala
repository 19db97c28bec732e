package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Record linkage / entity resolution between two systems' records of
  * the same entities: corruption-invariant blocking, character-bigram
  * set overlap scoring, and per-record argmax survivorship — the
  * classic three-stage ER shape (block → compare → resolve), with the
  * board's exactness conventions (integer overlap counts, deterministic
  * ties) so the whole linkage is oracle-verifiable.
  *
  * Scale shape (round 14 — the sf100 OOM fix): candidate pairs come
  * from ONE equi-join on `block`; the bigram overlap is computed per
  * joined row with `array_intersect` over the two records' distinct
  * bigram SETS, never by exploding bigrams into a pair-grain frame.
  * The round-13 sf100 board OOM'd exactly there: the exploded
  * (block, bigram) join materialized 3.5e9 pre-aggregation rows whose
  * (b_id, a_id) hash-agg exhausted execution memory. The block-only
  * join emits Σ_block a·b rows (1.29e9 at sf100 — measured) that
  * stream straight into a PARTIAL argmax aggregation: every pair of a
  * given b_id is produced inside the single partition owning its block,
  * so map-side combine collapses the stream to one row per b_id before
  * the only post-join shuffle (|B| rows, never pair-grain). Scores are
  * bit-identical to the exploded formulation for the operator's
  * contract below.
  *
  * Contract: each `id` carries exactly ONE (block, key) row per side —
  * standard single-key blocking (q178's shape). Multi-scheme blocking
  * composes by unioning `link` outputs per scheme and re-resolving,
  * not by feeding multi-block inputs (under which the old exploded
  * form summed scores ACROSS schemes — a different operator). `id`
  * must be numeric (the argmax tiebreak encodes "smallest a_id wins"
  * as a struct-max over (score, -a_id)).
  */
object RecordLinkage {

  /** Distinct character bigrams of a string column (empty below 2
    * chars — Spark's `sequence(1, 0)` counts DOWN, the bigrams()
    * lesson, so the guard is correctness, not style).
    */
  def charBigrams(s: Column): Column =
    when(length(s) >= 2,
      array_distinct(transform(sequence(lit(1), length(s) - 1),
        i => s.substr(i, lit(2)))))
      .otherwise(expr("cast(array() as array<string>)"))

  /** Link each `b` record to its best `a` record: inputs carry
    * (id, block, key) where `block` is a corruption-invariant blocking
    * key and `key` the comparison string. Score = |bigrams(a) ∩
    * bigrams(b)| (set semantics); each b_id resolves to the highest
    * score, ties to the smallest a_id; scores below `minOverlap` drop.
    *
    * `maxBlockWidth` is the standard linkage guard at scale: a block
    * matched by more than the cap records ON EITHER SIDE fans out a·b
    * candidate pairs, and such a block is by definition a
    * non-discriminating blocker. Oversized blocks are SKIPPED on the
    * side that exceeds the cap — their records pair only through
    * their other side's narrow blocks (here: not at all, since each
    * record has one block), a quantified recall cut
    * (RecordLinkageSpec pins it on a hot-block fixture).
    *
    * `calibrate` (OPT-IN since round 15 — r14 ADVICE: a results-
    * changing cap must not be a silent library default) resolves an
    * unset cap from the corpus size with
    * [[Dedup.calibrateBlockWidthCap]] — 4·⌈√n⌉, floored to None
    * (exhaustive-exact) below 20k records, so q178 (which opts in)
    * keeps pinned oracle hashes unchanged at every test SF. At the
    * sf100 audit corpus the calibrated cap (≈15.5k) sits far above the
    * measured max block width (438): it exists to bound ADVERSARIAL
    * block skew, not to shave the honest corpus.
    */
  def link(a: DataFrame, b: DataFrame, minOverlap: Int,
           maxBlockWidth: Option[Int] = None,
           calibrate: Boolean = false): DataFrame = {
    require(maxBlockWidth.forall(_ > 0), "maxBlockWidth must be positive when set")
    // Per-side BLOCK-WIDTH dim instead of (a) two eager full-table
    // count() scans for the calibration and (b) a per-side width window
    // over the join exchange (round 15 — the r14 verdict's stretch #10
    // and ADVICE note). One block-grain aggregation per side (projecting
    // only `block`, so the scan never computes bigrams) yields the row
    // count (Σ width) AND the max width in one tiny collect; the cap
    // then resolves from the same dim, and — the honest-corpus case
    // (sf100: max width 438 vs calibrated cap 15492) — when no block
    // exceeds it the filter is skipped outright instead of paying a
    // window sort per side. When the cap binds, the over-cap blocks are
    // a broadcast-sized anti-join dim (non-discriminating blockers are
    // few by definition). Results are identical to the window form:
    // both drop exactly the rows whose side's block width exceeds the
    // cap. `calibrate` is opt-in (r14 ADVICE): the library default no
    // longer arms a results-changing cap the caller didn't ask for;
    // q178 opts in explicitly, keeping its calibrated posture.
    def widths(df: DataFrame): DataFrame =
      df.groupBy("block").agg(count(lit(1)).as("__bw"))
    // (width dim, row count = Σ width, max width) per side — computed
    // only when a cap may apply at all
    val stats: Seq[(DataFrame, Long, Long)] =
      if (maxBlockWidth.isEmpty && !calibrate) Nil
      else Seq(a, b).map { side =>
        val w = widths(side).persist()
        val r = w.agg(coalesce(sum(col("__bw")), lit(0L)),
          coalesce(max(col("__bw")), lit(0L))).head()
        (w, r.getLong(0), r.getLong(1))
      }
    val cap = maxBlockWidth.orElse(
      if (calibrate) Dedup.calibrateBlockWidthCap(stats.map(_._2).max) else None)
    def prep(df: DataFrame, st: Option[(DataFrame, Long, Long)],
             idAs: String, gAs: String): DataFrame = {
      val base = df.select(col("id").as(idAs), col("block"),
        charBigrams(col("key")).as(gAs))
      (cap, st) match {
        case (Some(c), Some((wd, _, mx))) if mx > c =>
          val wide = wd.filter(col("__bw") > c).select("block")
          base.join(broadcast(wide), Seq("block"), "left_anti")
        case _ => base
      }
    }
    val scored = prep(a, stats.headOption, "a_id", "__ga")
      .join(prep(b, stats.lastOption, "b_id", "__gb"), Seq("block"))
      .select(col("b_id"), col("a_id"),
        size(array_intersect(col("__ga"), col("__gb")))
          .cast(IntegerType).as("score"))
      // the exploded form never emitted zero-overlap pairs (no shared
      // bigram → no join row); preserve that so the argmax domain —
      // and therefore which b_ids appear at minOverlap ≤ 1 — matches
      .filter(col("score") >= 1)
    scored
      .groupBy("b_id")
      .agg(max(struct(col("score"), (-col("a_id")).as("na"))).as("__m"))
      .select(col("b_id"), (-col("__m.na")).as("a_id"),
        col("__m.score").as("score"))
      .filter(col("score") >= minOverlap)
  }
}
