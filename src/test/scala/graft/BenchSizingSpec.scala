package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the harness's input-derived shuffle sizing (r9 verdict #4):
  * the sf10 audit legs must run at default config, while sf0.1 bench
  * numbers stay comparable round-over-round (core-count floor).
  */
class BenchSizingSpec extends AnyFunSuite {

  test("autoShufflePartitions: core-count floor at test SFs keeps bench comparable") {
    // sf0.1 is ~17 MB — well under 32 cores x 4 MB
    assert(Bench.autoShufflePartitions(17L << 20, 32) == 32)
    assert(Bench.autoShufflePartitions(0L, 4) == 4)
  }

  test("autoShufflePartitions: 4 MB/partition at audit scale, 4096 cap") {
    // the 100x audit corpus (~1.5 GB) resolves to the order the r9 sf10
    // legs needed by hand (256)
    val sf10 = Bench.autoShufflePartitions(1500L << 20, 32)
    assert(sf10 == 375, s"got $sf10")
    // a 100 TB-ish input hits the cap instead of a million tasks
    assert(Bench.autoShufflePartitions(100L << 40, 32) == 4096)
    // monotone in input bytes
    val pts = Seq(1L << 20, 1L << 30, 1L << 34, 1L << 40)
      .map(Bench.autoShufflePartitions(_, 32))
    assert(pts == pts.sorted)
  }
}
