package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Historian

/** Behavioral pins for the historian resampling trio (q143–q145). */
class HistorianSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("twa: step interpolation weights by holding time, not sample count") {
    // value 10 held for 9 minutes, value 90 held for 1 minute:
    // TWA = (10·9 + 90·1)/10 = 18 — the plain mean (50) would be wrong
    val obs = Seq((1L, ts(0), 10.0, 1L), (1L, ts(9), 90.0, 2L), (1L, ts(10), 0.0, 3L))
      .toDF("k", "t", "v", "id")
    val got = Historian.twa(obs, col("k"), col("t"), col("v"), col("id"))
      .as[(Long, Double)].collect().toMap
    assert(math.abs(got(1L) - 18.0) < 1e-9)
  }

  test("twa: single observation falls back to the value itself") {
    val obs = Seq((1L, ts(0), 42.5, 1L)).toDF("k", "t", "v", "id")
    val got = Historian.twa(obs, col("k"), col("t"), col("v"), col("id"))
      .as[(Long, Double)].collect().toMap
    assert(math.abs(got(1L) - 42.5) < 1e-6)
  }

  test("ohlc: open/close honor the tiebreak at equal timestamps") {
    val obs = Seq(
      (1L, ts(0), 5.0, 2L), (1L, ts(0), 3.0, 1L), // same ts: open = tie 1 → 3.0
      (1L, ts(30), 9.0, 3L), (1L, ts(30), 7.0, 4L) // close = tie 4 → 7.0
    ).toDF("k", "t", "v", "id")
    val got = Historian.ohlc(obs, col("k"), col("t"), col("v"), col("id"))
      .orderBy("bucket")
      .as[(Long, Timestamp, Double, Double, Double, Double, Long)].collect().toList
    assert(got.size == 1)
    val (_, _, open, high, low, close, n) = got.head
    assert(open == 3.0 && high == 9.0 && low == 3.0 && close == 7.0 && n == 4)
  }

  test("gap fill: missing hours carry the prior close and are flagged") {
    val obs = Seq(
      (1L, ts(0), 1.0, 1L),    // hour 0
      (1L, ts(150), 5.0, 2L)   // hour 2 — hour 1 is a gap
    ).toDF("k", "t", "v", "id")
    val got = Historian.gapFillHourly(obs, col("k"), col("t"), col("v"), col("id"))
      .orderBy("bucket")
      .as[(Long, Timestamp, Double, Boolean)].collect().toList
    assert(got.map(r => (r._3, r._4)) == List((1.0, false), (1.0, true), (5.0, false)))
  }

  test("deterministic across partition counts") {
    val obs = (1L to 400L).map(i =>
      ((i % 7), ts((i % 97).toInt), (i % 13).toDouble, i)).toDF("k", "t", "v", "id")
    def run(p: Int) = Historian.twa(obs.repartition(p), col("k"), col("t"),
      col("v"), col("id")).orderBy("k").as[(Long, Double)].collect().toList
    assert(run(1) == run(11))
  }

  test("anomaly: a spike against a flat baseline flags; the baseline never does") {
    // 12 flat observations then one spike — variance 0, spike dev > 0
    val obs = ((1 to 12).map(i => (1L, ts(i), 5.0, i.toLong))
      :+ ((1L, ts(13), 50.0, 13L))).toDF("k", "t", "v", "id")
    val got = Historian.rollingAnomalies(obs, col("k"), col("t"), col("v"),
      col("id"), minN = 8).select("tie").as[Long].collect().toList
    assert(got == List(13L))
  }

  test("anomaly: observation never baselines itself (window ends at 1 preceding)") {
    // alternating signal: every point deviates from a mixed baseline but
    // none exceeds 3 sigma of the alternating history
    val obs = (1 to 30).map(i =>
      (1L, ts(i), if (i % 2 == 0) 10.0 else -10.0, i.toLong)).toDF("k", "t", "v", "id")
    val got = Historian.rollingAnomalies(obs, col("k"), col("t"), col("v"), col("id"))
    assert(got.isEmpty)
  }

  test("trend slope: exact linear series recovers the exact rational slope") {
    // v = 2·minutes + 5 → dv/dt = 2 per 60 s. x in seconds, q = v·1024:
    // num/den must equal 2·1024/60 exactly (rational equality, no eps)
    val obs = (0 to 9).map(i => (1L, ts(i), 2.0 * i + 5.0)).toDF("k", "t", "v")
    val got = Historian.trendSlope(obs, col("k"), col("t"), col("v"))
      .select("k", "num", "den").as[(Long, Long, Long)].collect().head
    assert(got._2 * 60L == got._3 * 2L * 1024L,
      s"num/den = ${got._2}/${got._3} is not exactly 2048/60")
  }

  test("trend slope: constant series has num = 0; single point den = 0 and null slope") {
    val obs = ((0 to 5).map(i => (1L, ts(i), 7.0)) :+ ((2L, ts(0), 3.0)))
      .toDF("k", "t", "v")
    val rows = Historian.trendSlope(obs, col("k"), col("t"), col("v"))
      .select("k", "num", "den").as[(Long, Long, Long)].collect().toList
    val byK = rows.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byK(1L)._1 == 0L && byK(1L)._2 > 0L)
    assert(byK(2L) == ((0L, 0L)), "single observation must have den 0")
  }

  test("cusum: level shift is cut at the last pre-shift observation") {
    // 10 observations at 0, then 10 at 100: |n·S_i − i·S_n| peaks at
    // i = 10 (the boundary), the earliest-index rule breaking any tie
    val obs = ((1 to 10).map(i => (1L, ts(i), 0.0, i.toLong)) ++
      (11 to 20).map(i => (1L, ts(i), 100.0, i.toLong))).toDF("k", "t", "v", "id")
    val got = Historian.cusumChangepoint(obs, col("k"), col("t"), col("v"), col("id"))
      .select("k", "cut_i", "cut_tie").as[(Long, Long, Long)].collect().head
    assert(got._2 == 10L && got._3 == 10L, s"cut at $got")
  }

  test("cusum: deterministic across partition counts") {
    val obs = (1 to 60).map(i => (i % 3L, ts(i), (i * 7 % 13).toDouble, i.toLong))
      .toDF("k", "t", "v", "id")
    val a = Historian.cusumChangepoint(obs.repartition(1), col("k"), col("t"), col("v"), col("id"))
      .collect().map(_.toString).sorted.toList
    val b = Historian.cusumChangepoint(obs.repartition(7), col("k"), col("t"), col("v"), col("id"))
      .collect().map(_.toString).sorted.toList
    assert(a == b && a.nonEmpty)
  }

  test("ewma: constant series forecasts itself exactly; warm-up drops 16 rows") {
    val obs = (1 to 30).map(i => (1L, ts(i), 2.5, i.toLong)).toDF("k", "t", "v", "id")
    val got = Historian.ewmaForecast(obs, col("k"), col("t"), col("v"), col("id"))
      .orderBy("tie").collect()
    assert(got.length == 14) // 30 - 16 warm-up
    got.foreach { r =>
      assert(r.getLong(2) == 2560L)               // q = 2.5 * 1024
      assert(r.getLong(3) == 2560L * 65535L)      // fnum = q * (2^16 - 1)
      assert(r.getDouble(4) == 2560.0 * 65535.0 / 67107840.0)
      assert(r.getLong(5) == 0L)                  // residual exactly zero
    }
  }

  test("ewma: hand-computed numerator on a ramp; nearest lag dominates") {
    // series q_i = i*1024 (v = i); forecast of row 17 uses lags 16..1
    val obs = (1 to 17).map(i => (1L, ts(i), i.toDouble, i.toLong)).toDF("k", "t", "v", "id")
    val got = Historian.ewmaForecast(obs, col("k"), col("t"), col("v"), col("id"))
      .collect()
    assert(got.length == 1)
    val expected = (1 to 16).map(j => (17 - j) * 1024L * (1L << (16 - j))).sum
    assert(got.head.getLong(3) == expected)
    // dyadic decay: the forecast sits near the latest value, not the mean
    assert(got.head.getDouble(4) > 14.9 && got.head.getDouble(4) < 17.0)
  }

  test("seasonal residuals: deviation from the hour cell mean, ranked; ties by id") {
    // hour 0 cell: values 10,10,10,22 -> the 22 deviates by +9.0
    // hour 1 cell: values 5,5 -> zero deviation
    val rows = Seq(
      (1L, new Timestamp(3600000L * 24 * 10), 10.0, 1L),
      (1L, new Timestamp(3600000L * 24 * 10 + 1000), 10.0, 2L),
      (1L, new Timestamp(3600000L * 24 * 10 + 2000), 10.0, 3L),
      (1L, new Timestamp(3600000L * 24 * 10 + 3000), 22.0, 4L),
      (1L, new Timestamp(3600000L * (24 * 10 + 1)), 5.0, 5L),
      (1L, new Timestamp(3600000L * (24 * 10 + 1) + 1000), 5.0, 6L))
      .toDF("k", "t", "v", "id")
    val got = Historian.seasonalResiduals(rows, col("k"), col("t"), col("v"),
      col("id"), topN = 3).orderBy("rk").collect()
    assert(got.length == 3)
    assert(got(0).getInt(0) == 1 && got(0).getLong(3) == 22L * 1024L)
    assert(got(0).getDouble(5) == (22.0 - 13.0) * 1024) // dev from mean 13
    // the three 10s deviate equally (-3): ranks 2,3 go to lowest ids
    assert(got(1).getDouble(5) == -3.0 * 1024 && got(2).getDouble(5) == -3.0 * 1024)
  }

  test("lttb: endpoints always kept, the spike survives its bucket, short keys drop") {
    // key 1: 42 points, flat at 10.0 except a spike of 500.0 at i = 17 —
    // LTTB must keep the spike (largest triangle in its bucket); a
    // plain stride would skip it. key 2: too short (< buckets+2) → out.
    val rows = (0 until 42).map { i =>
      (1L, ts(i + 1), if (i == 17) 500.0 else 10.0, i.toLong)
    } ++ (0 until 5).map(i => (2L, ts(i + 1), 1.0, 100L + i))
    val out = Historian.lttb(rows.toDF("k", "t", "v", "id"),
      col("k"), col("t"), col("v"), col("id"), buckets = 10)
      .select("k", "sel_idx", "tie", "q")
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(out.map(_._1).toSet === Set(1L), "short key must be excluded")
    assert(out.size === 12 && out.map(_._2).sorted === (0 to 11))
    val byIdx = out.map(t => t._2 -> t._3).toMap
    assert(byIdx(0) === 0L && byIdx(11) === 41L, "endpoints always kept")
    assert(out.exists(_._4 === 500L * 1024), s"spike must survive: $out")
  }

  test("lttb: deterministic across partitionings") {
    val rows = (0 until 60).map(i => (1L, ts(i + 1), (i * 37 % 11).toDouble, i.toLong))
    val a = Historian.lttb(rows.toDF("k", "t", "v", "id"),
      col("k"), col("t"), col("v"), col("id"))
      .select("sel_idx", "tie").as[(Int, Long)].collect().sortBy(_._1).toSeq
    val b = Historian.lttb(rows.toDF("k", "t", "v", "id").repartition(13),
      col("k"), col("t"), col("v"), col("id"))
      .select("sel_idx", "tie").as[(Int, Long)].collect().sortBy(_._1).toSeq
    assert(a === b)
  }

  test("madOutliers: a spike the mean/sigma baseline masks is flagged; the bulk is not") {
    // 9 values at 10.0 ± 0.1 and one spike at 50.0. The spike inflates
    // mean AND sigma (masking); median = 10.0-ish, MAD ≈ 0.1·1024 and
    // the spike's dev ≈ 40·1024 clears 4.4478·MAD by orders of magnitude.
    val vals = Seq(9.9, 10.0, 10.1, 9.9, 10.0, 10.1, 9.9, 10.0, 10.1, 50.0)
    val obs = vals.zipWithIndex.map { case (v, i) => (1L, v, i.toLong) }
      .toDF("k", "v", "id")
    val got = Historian.madOutliers(obs, col("k"), col("v"), col("id"))
      .select("tie", "q", "med", "dev", "mad")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) === Seq(9L), s"only the spike flags: $got")
    val (_, q, med, dev, mad) = got.head
    assert(q == 51200L && med == 10240L && dev == 40960L)
    assert(mad == math.round(0.1 * 1024).toLong)
  }

  test("madOutliers: constant key flags any deviating row (MAD = 0); pure-constant flags none") {
    val obs = (Seq.fill(8)(5.0) :+ 5.5).zipWithIndex
      .map { case (v, i) => (1L, v, i.toLong) } ++
      Seq.fill(6)(7.0).zipWithIndex.map { case (v, i) => (2L, v, 100L + i) }
    val got = Historian.madOutliers(obs.toDF("k", "v", "id"),
      col("k"), col("v"), col("id"))
      .select("k", "tie").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 8L)), s"got $got")
  }
}
