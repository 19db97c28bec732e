package graft

import org.apache.spark.sql.functions._
import graft.operators.RecordLinkage

/** Block → compare → resolve invariants for the entity-resolution
  * operator.
  */
class RecordLinkageSpec extends SparkSpec {
  import spark.implicits._

  private def sys(rows: (Long, String, String)*) =
    rows.toSeq.toDF("id", "block", "key")

  test("exact duplicate links with the full distinct-bigram score") {
    val a = sys((1L, "x", "abcdef"))
    val b = sys((10L, "x", "abcdef"))
    val got = RecordLinkage.link(a, b, minOverlap = 1).collect()
    assert(got.length == 1)
    assert(got.head.getLong(0) == 10L && got.head.getLong(1) == 1L &&
      got.head.getInt(2) == 5) // 5 distinct bigrams of "abcdef"
  }

  test("adjacent-swap corruption still resolves to the true record over a decoy") {
    val a = sys((1L, "x", "123456789"), (2L, "x", "987654321"))
    val b = sys((10L, "x", "124356789")) // 3<->4 swapped from record 1
    val got = RecordLinkage.link(a, b, minOverlap = 1).collect()
    assert(got.length == 1 && got.head.getLong(1) == 1L)
    assert(got.head.getInt(2) >= 5, s"swap keeps most bigrams: ${got.head}")
  }

  test("threshold drops weak candidates; ties resolve to the smallest a_id") {
    val a = sys((5L, "x", "aabb"), (3L, "x", "bbaa"))
    val b = sys((10L, "x", "aabb"), (11L, "x", "zzzz"))
    val got = RecordLinkage.link(a, b, minOverlap = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    // "aabb" distinct bigrams {aa,ab,bb}; "bbaa" {bb,ba,aa} -> overlap 2;
    // exact match scores 3 and wins; zzzz shares nothing and drops
    assert(got == Map(10L -> ((5L, 3))))
    // with both a-records scoring equally, the smaller a_id wins
    val tie = RecordLinkage.link(
      sys((5L, "x", "abab"), (3L, "x", "baba")),
      sys((10L, "x", "ab")), minOverlap = 1).collect()
    // "ab" single bigram hits both (abab has {ab,ba}, baba has {ba,ab})
    assert(tie.head.getLong(1) == 3L)
  }

  test("blocking prevents cross-block pairs even for identical keys") {
    val a = sys((1L, "x", "abcdef"))
    val b = sys((10L, "y", "abcdef"))
    assert(RecordLinkage.link(a, b, minOverlap = 1).isEmpty)
  }

  test("maxBlockWidth skips oversized blocks; narrow blocks resolve unchanged") {
    // hot block: 60 a-records and 60 b-records sharing one blocking key —
    // the uncapped comparison space there is 3600 pairs. Clean block: one
    // honest match of width 1. Block-width cap semantics (round 14, the
    // sf100 OOM posture): an oversized block is skipped ENTIRELY on the
    // side that exceeds the cap — a quantified recall cut on
    // non-discriminating blockers, never a score change on survivors.
    val hotA = (1L to 60L).map(i => (i, "h", s"customer common $i"))
    val hotB = (101L to 160L).map(i => (i, "h", s"customer common ${i - 100}"))
    val a = sys(hotA :+ ((70L, "c", "distinctive alpha")): _*)
    val b = sys(hotB :+ ((170L, "c", "distinctive alphb")): _*)
    val full = RecordLinkage.link(a, b, minOverlap = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    val capped = RecordLinkage.link(a, b, minOverlap = 2, maxBlockWidth = Some(10))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    // the clean block's resolution (id AND score) is untouched by the cap
    assert(capped(170L) === full(170L))
    // the 60-wide hot block exceeds cap=10 on both sides: none of its
    // b-records may resolve, and none may leak a cross-block pair
    val hotResolved = capped.keySet.filter(_ <= 160L)
    assert(hotResolved.isEmpty, s"oversized block must be skipped: $hotResolved")
    assert(full.keySet.count(_ <= 160L) == 60, "uncapped hot block resolves fully")
    info(s"maxBlockWidth=10: resolved ${capped.size} of ${full.size} b-records " +
      s"(hot block ${hotResolved.size}/60)")
  }

  test("calibrated cap floors to exhaustive-exact at test-SF sizes") {
    // the sf100 posture must not move a single row at oracle SFs: below
    // the 20k-record floor calibrate=true resolves to None, so the
    // default-calibrated linkage is bit-identical to the explicit
    // exhaustive one — q178's pinned hashes are safe by construction.
    val a = sys((1L to 50L).map(i => (i, s"b${i % 7}", f"rec$i%04d")): _*)
    val b = sys((101L to 150L).map(i => (i, s"b${(i - 100) % 7}", f"rec${i - 100}%04d")): _*)
    val calibrated = RecordLinkage.link(a, b, minOverlap = 1, calibrate = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val exhaustive = RecordLinkage.link(a, b, minOverlap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(calibrated === exhaustive)
    assert(calibrated.nonEmpty)
    // and the floor itself: the calibrator only arms past 20k records
    import graft.operators.Dedup
    assert(Dedup.calibrateBlockWidthCap(20000L).isEmpty)
    assert(Dedup.calibrateBlockWidthCap(20001L).nonEmpty)
  }

  test("calibrate is opt-IN (r15): only an explicit opt-in arms the width cap past the floor") {
    // 21k a-records (past the 20k floor): one 700-wide hot block plus
    // unique-block filler. calibrate=true resolves cap = 4·⌈√21001⌉ =
    // 580 < 700 → the hot block is skipped; the r14 default would have
    // armed this silently — the library default must NOT (r14 ADVICE).
    val hotA = (1L to 700L).map(i => (i, "hot", "abcdefgh"))
    val fill = (1000L to 21300L).map(i => (i, s"u$i", "zzzz"))
    val a = sys((hotA ++ fill): _*)
    val b = sys((1L, "hot", "abcdefgh"))
    val default = RecordLinkage.link(a, b, minOverlap = 1).collect()
    val optIn = RecordLinkage.link(a, b, minOverlap = 1, calibrate = true).collect()
    assert(default.length == 1, "default (no cap): the hot-block record links")
    assert(optIn.isEmpty, "opt-in calibration: the 700-wide block exceeds cap 580 and is skipped")
  }

  test("charBigrams: distinct set semantics, single char yields empty") {
    val got = Seq("aaaa", "ab", "z").toDF("s")
      .select(RecordLinkage.charBigrams(col("s")).as("g"))
      .as[Seq[String]].collect()
    assert(got(0) == Seq("aa") && got(1) == Seq("ab") && got(2).isEmpty)
  }
}
