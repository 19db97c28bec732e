package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.FeatureEng

class FeatureEngSpec extends SparkSpec {
  import spark.implicits._

  test("quantileBins: bin ids are monotone in value and cover the requested range") {
    val df = (1L to 1000L).toDF("v")
    val out = FeatureEng.quantileBins(df, col("v"), nBins = 10)
      .orderBy("v").collect()
    val bins = out.map(r => (r.getLong(0), r.getInt(1)))
    assert(bins.map(_._2).min == 0)
    assert(bins.map(_._2).max == 9)
    // monotone: bin_id never decreases as v increases
    assert(bins.sliding(2).forall { case Array(a, b) => a._2 <= b._2 })
    // roughly equi-depth: every decile holds >= 5% of rows (log-bin
    // granularity makes them inexact, never empty on a smooth input)
    val sizes = bins.groupBy(_._2).view.mapValues(_.length)
    assert(sizes.values.forall(_ >= 50))
  }

  test("quantileBins: heavy duplicate mass collapses bins instead of splitting ties") {
    // 90% of rows share one value -> many boundaries coincide on its bin;
    // all equal rows must land in the SAME bin
    val df = (Seq.fill(900)(7L) ++ (1L to 100L)).toDF("v")
    val out = FeatureEng.quantileBins(df, col("v"), nBins = 10)
    val binsOf7 = out.filter(col("v") === 7L).select("bin_id").distinct().collect()
    assert(binsOf7.length == 1)
  }

  test("quantileBins is partition-invariant") {
    val base = (1L to 500L).map(i => (i * 37L) % 499L + 1L)
    val a = FeatureEng.quantileBins(base.toDF("v").repartition(1), col("v"), 4)
      .orderBy("v", "bin_id").collect().toSeq
    val b = FeatureEng.quantileBins(base.toDF("v").repartition(7), col("v"), 4)
      .orderBy("v", "bin_id").collect().toSeq
    assert(a == b)
  }

  test("targetEncode: exact rational smoothing toward the global prior") {
    val df = Seq(("a", 1L), ("a", 1L), ("a", 0L), ("b", 0L), ("b", 0L),
      ("c", 1L)).toDF("cat", "y")
    val enc = FeatureEng.targetEncode(df, col("cat"), col("y"), m = 2L)
      .orderBy("category").collect()
    // prior = 3/6; enc(a) = (2 + 2*0.5)/(3+2) = 0.6 via (2*6 + 2*3)/(5*6)
    val a = enc.find(_.getString(0) == "a").get
    assert(a.getLong(1) == 3L && a.getLong(2) == 2L)
    assert(math.abs(a.getDouble(3) - 0.6) < 1e-15)
    // a singleton positive is pulled well below 1.0 by the prior
    val c = enc.find(_.getString(0) == "c").get
    assert(math.abs(c.getDouble(3) - (1.0 * 6 + 2 * 3) / (3.0 * 6)) < 1e-15)
  }

  test("corrPairs: perfect linear, anti-linear, and constant columns") {
    val df = (1L to 100L).map(i => (i, 2 * i + 5, 101 - i, 42L))
      .toDF("x", "y2", "neg", "const")
    val out = FeatureEng.corrPairs(df.withColumn("g", lit("all")), Seq("g"),
      Seq("x" -> col("x"), "y2" -> col("y2"), "neg" -> col("neg"),
        "const" -> col("const")),
      maxAbs = 300L, expectedMaxRows = 1000L)
      .collect().map(r => r.getString(1) -> r).toMap
    assert(math.abs(out("x_y2").getDouble(6) - 1.0) < 1e-12)
    assert(math.abs(out("x_neg").getDouble(6) + 1.0) < 1e-12)
    assert(out("x_const").isNullAt(6)) // zero variance -> null, not NaN
  }

  test("corrPairs rejects inputs past the per-row Long-exactness bound") {
    val df = Seq((1L, 1L)).toDF("x", "y").withColumn("g", lit("all"))
    // round 10: the binding constraint is the PER-ROW Σx² bound
    // n·V² ≤ 4e18 (group-level products now run in Decimal(38) and are
    // effectively unbounded); 1e9 rows × (3e5)² = 9e19 exceeds it
    intercept[IllegalArgumentException] {
      FeatureEng.corrPairs(df, Seq("g"), Seq("x" -> col("x"), "y" -> col("y")),
        maxAbs = 300000L, expectedMaxRows = 1000000000L)
    }
    // the old 3e9 n·V limit no longer binds: 1e8 rows × V=1100 is legal
    FeatureEng.corrPairs(df, Seq("g"), Seq("x" -> col("x"), "y" -> col("y")),
      maxAbs = 1100L, expectedMaxRows = 100000000L)
  }

  test("snapshotDiff classifies added/removed/changed/unchanged; ties by id") {
    val ev = Seq(
      // k1: in both windows, value changed
      (1L, "k1", 10L, 1.0), (1L, "k1", 60L, 2.0),
      // k2: only old window -> removed
      (2L, "k2", 10L, 5.0),
      // k3: only new window -> added
      (3L, "k3", 60L, 7.0),
      // k4: same value both windows -> unchanged
      (4L, "k4", 20L, 3.0), (4L, "k4", 70L, 3.0),
      // k5: two rows at the SAME ts in the new window -> higher id wins
      (5L, "k5", 10L, 1.0), (5L, "k5", 80L, 8.0), (6L, "k5", 80L, 9.0)
    ).toDF("event_id", "key", "t", "value")
      .withColumn("ts", timestamp_seconds(col("t")))
    val out = FeatureEng.snapshotDiff(ev, Seq("key"), col("ts"),
      col("event_id"), col("value"),
      oldWindow = col("t") < 50L, newWindow = col("t") >= 15L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("k1").getString(3) == "changed")
    assert(out("k2").getString(3) == "removed" && out("k2").isNullAt(2))
    assert(out("k3").getString(3) == "added" && out("k3").isNullAt(1))
    assert(out("k4").getString(3) == "unchanged")
    assert(out("k5").getDouble(2) == 9.0) // same-ts tie -> event_id 6
  }

  test("scaleFeatures: rank ties share percentile; min-max exact; degenerate groups null") {
    import graft.operators.FeatureEng
    val df = Seq(("g1", 10L), ("g1", 20L), ("g1", 20L), ("g1", 40L),
      ("solo", 5L), ("const", 7L), ("const", 7L)).toDF("g", "v0")
    val out = FeatureEng.scaleFeatures(df, Seq("g"), col("v0"))
      .select("g", "v0", "rnk", "pct_rank", "minmax")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    val ten = out(("g1", 10L))
    assert(ten.getInt(2) == 1 && ten.getDouble(3) == 0.0 && ten.getDouble(4) == 0.0)
    val twenty = out(("g1", 20L)) // both 20s share rank 2
    assert(twenty.getInt(2) == 2 && twenty.getDouble(3) == 1.0 / 3)
    assert(twenty.getDouble(4) == 10.0 / 30)
    val forty = out(("g1", 40L))
    assert(forty.getInt(2) == 4 && forty.getDouble(3) == 1.0 && forty.getDouble(4) == 1.0)
    assert(out(("solo", 5L)).isNullAt(3) && out(("solo", 5L)).isNullAt(4))
    // const group: both rows share rank 1 -> pct 0; minmax degenerate
    assert(out(("const", 7L)).getDouble(3) == 0.0)
    assert(out(("const", 7L)).isNullAt(4))
  }

  test("profile: counts, nulls, distincts, lexicographic bounds, top ties to smaller value") {
    import graft.operators.DataQuality
    val df = Seq(
      ("a", Some(1L)), ("a", Some(2L)), ("b", Some(2L)), ("b", None),
      ("a", None), ("c", Some(9L))).toDF("s", "v")
    val out = DataQuality.profile(df, Seq(
      "s" -> col("s"), "v" -> col("v"), "allnull" -> lit(null).cast("string")))
      .collect().map(r => r.getString(0) -> r).toMap
    val s = out("s")
    assert(s.getLong(1) == 6 && s.getLong(2) == 0 && s.getLong(3) == 3)
    assert(s.getString(4) == "a" && s.getString(5) == "c")
    assert(s.getString(6) == "a" && s.getLong(7) == 3) // a=3 beats b=2
    val v = out("v")
    assert(v.getLong(1) == 6 && v.getLong(2) == 2 && v.getLong(3) == 3)
    assert(v.getString(6) == "2" && v.getLong(7) == 2) // tie 1 vs 9 broken by count; 2 has 2
    val an = out("allnull")
    assert(an.getLong(2) == 6 && an.getLong(3) == 0 && an.isNullAt(6) && an.isNullAt(7))
  }

  test("quality checks: violations counted per rule, report verdicts") {
    import graft.operators.DataQuality._
    val parent = Seq(1L, 2L, 3L).toDF("id")
    val child = Seq((1L, "x"), (1L, "y"), (4L, "z"), (5L, "w")).toDF("fk", "s")
    val dup = Seq(1L, 1L, 1L, 2L).toDF("k")
    val vals = Seq(Some(0.01), Some(0.2), None).toDF("d")
    val byRule = report(Seq(
      uniqueness("uniq", dup, Seq("k")),
      referential("fk", child, col("fk"), parent, col("id")),
      inRange("range", vals, col("d"), 0.0, 0.1),
      notNull("nn", vals, col("d")),
      acceptedValues("acc", child, col("s"), Seq("x", "y", "z"))))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(byRule("uniq") == ((2L, false)))  // three 1s -> 2 extra rows
    assert(byRule("fk") == ((2L, false)))    // 4 and 5 orphaned
    assert(byRule("range") == ((2L, false))) // 0.2 out of range + null
    assert(byRule("nn") == ((1L, false)))
    assert(byRule("acc") == ((1L, false)))   // "w" not accepted
    // a clean rule passes
    val clean = report(Seq(uniqueness("ok", parent, Seq("id")))).collect()
    assert(clean.head.getLong(1) == 0L && clean.head.getBoolean(2))
  }

  test("snapshotDiff is a single shuffle: no join in the plan") {
    val ev = Seq((1L, "k", 10L, 1.0)).toDF("event_id", "key", "t", "value")
      .withColumn("ts", timestamp_seconds(col("t")))
    val plan = FeatureEng.snapshotDiff(ev, Seq("key"), col("ts"),
      col("event_id"), col("value"), col("t") < 50L, col("t") >= 15L)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"))
  }

  test("winsorize: exact-rank band, extremes clamp, interior passes through") {
    // group of 10 values 1..9 plus an outlier 1000. p10 rank =
    // ceil(10·10/100) = 1 → lo = 1; p90 rank = ceil(900/100) = 9 → hi = 9.
    val df = ((1L to 9L).map(i => ("g", i, i)) :+ (("g", 1000L, 10L)))
      .toDF("k", "v0", "id")
    val out = FeatureEng.winsorize(df, Seq("k"), col("v0"), col("id"))
      .select("v0", "lo", "hi", "clipped")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(out(1000L) === ((1L, 9L, 9L)), s"outlier must clamp to hi: $out")
    assert(out(5L) === ((1L, 9L, 5L)))
    assert(out(1L) === ((1L, 9L, 1L)))
  }

  test("kAnonymity: combinations under k flag for suppression, others pass") {
    val df = (Seq.fill(12)(("en", "web")) ++ Seq.fill(3)(("en", "books")) ++
      Seq.fill(10)(("de", "web"))).toDF("lang", "src")
    val got = graft.operators.DataQuality.kAnonymity(df, Seq("lang", "src"), k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getBoolean(3))).toSet
    assert(got === Set(("en", "web", 12L, false), ("en", "books", 3L, true),
      ("de", "web", 10L, false)))
  }

  test("winsorize: a singleton group clips to itself") {
    val df = Seq(("a", 7L, 1L)).toDF("k", "v0", "id")
    val got = FeatureEng.winsorize(df, Seq("k"), col("v0"), col("id"))
      .select("lo", "hi", "clipped").as[(Long, Long, Long)].collect().head
    assert(got === ((7L, 7L, 7L)))
  }
}
