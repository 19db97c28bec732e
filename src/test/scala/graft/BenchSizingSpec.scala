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

  test("med: middle-index median survives the single-pass audit knob") {
    // SPARK_GRAFT_BENCH_PASSES=1 gives one-element pass vectors; the
    // retry-compare used `samples(1)` and threw INSIDE the per-query try
    // — the r13 sf100 board recorded q07/q08/q09/q101 as query failures
    // that were this harness bug firing on transiently load-flagged
    // passes (reproduced on q02 in the r14 prefix replay)
    assert(Bench.med(Vector(5.0)) == 5.0)
    assert(Bench.med(Vector(1.0, 2.0, 9.0)) == 2.0)
    assert(Bench.med(Vector(1.0, 2.0)) == 2.0) // upper-middle, the spreads convention
  }

  test("calibrateIvfStep: cell growth is sqrt-bounded and clamped (r13 verdict #7)") {
    import graft.operators.Similarity.calibrateIvfStep
    def cells(n: Long, step: Long = 100L) = n / calibrateIvfStep(n, step)
    // floor: every test-SF corpus keeps the caller's step (pinned oracle geometry)
    assert(calibrateIvfStep(500L) == 100L && calibrateIvfStep(2000L) == 100L
      && calibrateIvfStep(10000L) == 100L)
    // calibration band: cells ≈ sqrt(n/2) — the sf100 corpus (2M vectors)
    // resolves to 1000 cells, and cell count grows SLOWER than n
    assert(calibrateIvfStep(2000000L) == 2000L && cells(2000000L) == 1000L)
    val decades = Seq(200000L, 2000000L, 20000000L, 200000000L).map(cells(_))
    assert(decades == decades.sorted)
    decades.sliding(2).foreach { case Seq(a, b) =>
      assert(b.toDouble / a < 4.0, s"cell growth per decade must stay ~sqrt(10): $decades")
    }
    // clamp: past ~4.3B vectors the centroid model stops growing — the
    // broadcast/reference-object stays bounded (<= 34 MB at 64 dims)
    assert(cells(10000000000L) <= 65536L)
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
