package graft

import org.apache.spark.sql.functions._
import graft.functions.CountMinSketch

/** Behavioral pins for the count-min sketch table (q139). */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq(
    ("a", 1, 1L), ("a", 1, 1L), ("a", 1, 2L), ("a", 2, 1L),
    ("a", 2, 7L), ("b", 1, 3L), ("b", 1, 3L), ("b", 2, 3L),
    ("b", 2, 9L), ("b", 2, 9L), ("b", 2, 9L)
  ).toDF("g", "day", "item")

  test("mergeability: summing day cells equals one direct sketch") {
    val cells = CountMinSketch.sketchCells(events, Seq("g"), col("day"), col("item"))
    val merged = CountMinSketch.rollup(cells, Seq("g"))
      .orderBy("g", "j", "bucket")
      .as[(String, Int, Long, Long)].collect().toList
    val direct = CountMinSketch.sketchCells(events, Seq("g"), lit(0), col("item"))
      .select(col("g"), col("j"), col("bucket"), col("cnt"))
      .orderBy("g", "j", "bucket")
      .as[(String, Int, Long, Long)].collect().toList
    assert(merged == direct)
  }

  test("estimates are never below exact counts; exact when the grid is wide") {
    val cells = CountMinSketch.sketchCells(events, Seq("g"), col("day"), col("item"),
      width = 4096)
    val sketch = CountMinSketch.rollup(cells, Seq("g"))
    val probes = events.groupBy("g", "item").agg(count(lit(1)).as("exact"))
    val got = CountMinSketch.estimate(sketch, Seq("g"), probes, width = 4096)
      .as[(String, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (g, item, exact, est) =>
      assert(est >= exact, s"CM lower bound violated for ($g,$item)")
    }
    // 6 distinct items across 4096·4 counters: collisions impossible at
    // this density only if no two items share a bucket in EVERY row —
    // assert the stronger point: est == exact for all probes here.
    got.foreach { case (g, item, exact, est) =>
      assert(est == exact, s"unexpected collision for ($g,$item): $est != $exact")
    }
  }

  test("never-seen probes estimate 0 (coalesced buckets), not null") {
    val cells = CountMinSketch.sketchCells(events, Seq("g"), col("day"), col("item"),
      width = 4096)
    val sketch = CountMinSketch.rollup(cells, Seq("g"))
    val probes = Seq(("a", 999999L)).toDF("g", "item")
    val got = CountMinSketch.estimate(sketch, Seq("g"), probes, width = 4096)
      .as[(String, Long, Long)].collect().toList
    assert(got == List(("a", 999999L, 0L)))
  }

  test("deterministic across partition counts") {
    val big = (1L to 500L).map(i => ("g", (i % 7).toInt, i % 40)).toDF("g", "day", "item")
    def run(parts: Int) = {
      val cells = CountMinSketch.sketchCells(big.repartition(parts), Seq("g"),
        col("day"), col("item"), width = 32)
      CountMinSketch.rollup(cells, Seq("g")).orderBy("j", "bucket")
        .as[(String, Int, Long, Long)].collect().toList
    }
    assert(run(1) == run(13))
  }

  test("sliding heavy hitters: top-k matches an exact windowed recount") {
    // skewed fixture: item i appears with frequency ~ 40/i per day, so
    // the window top-5 is stable and the CM estimates (width 2048 on a
    // tiny domain: no collisions) equal the exact counts — the output
    // must therefore be the exact windowed top-5 with its own exact_cnt
    val rows = (for {
      day <- 0 until 12
      item <- 1 to 40
      rep <- 1 to (40 / item)
    } yield ("g", day, item.toLong)).toDF("g", "day", "item")
      .withColumn("d", date_add(lit("2024-01-01").cast("date"), col("day")))
    val hh = CountMinSketch.slidingHeavyHitters(rows, Seq("g"), col("d"),
      col("item"), windowDays = 7, dailyTopM = 10, topK = 5, width = 2048)
      .select(col("g"), datediff(col("day"), lit("2024-01-01")).as("day"),
        col("item"), col("exact_cnt"), col("est_cnt"), col("lower_ok"), col("rk"))
      .as[(String, Int, Long, Long, Long, Boolean, Int)].collect()
    assert(hh.nonEmpty)
    assert(hh.forall(_._6), "CM estimate below exact — one-sided guarantee broken")
    // per (day), the reported top-5 must be the exact windowed top-5
    for (day <- 0 until 12) {
      val got = hh.filter(_._2 == day).sortBy(_._7).map(_._3).toList
      val exact = rows.filter(col("day").between(day - 6, day))
        .groupBy("item").count()
        .orderBy(col("count").desc, col("item"))
        .limit(5).select("item").as[Long].collect().toList
      assert(got == exact, s"day $day: $got != exact $exact")
    }
  }
}
