package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.QualityClassifier

/** Logistic-regression quality classifier: exact linear scoring,
  * separable-corpus learning, monotone loss, holdout generalization, and
  * bit-identical training across partitionings (the fixed-point gradient
  * contract).
  */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic separable corpus: doc i is positive iff i%2==0.
    * Positives draw from goodN vocabulary, negatives from badN, both mixed
    * with shared stop tokens — linearly separable but not trivially (the
    * stop tokens carry no signal and dominate counts).
    */
  private def corpus(n: Int, parts: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val y = i % 2
      val marker =
        if (y == 1) s"good${i % 5} good${(i + 1) % 5} good${i % 3}"
        else s"bad${i % 5} bad${(i + 1) % 5} bad${i % 3}"
      val noise = s"the of and to in ${"filler" + (i % 7)} the of"
      (i.toLong, s"$noise $marker $noise", y)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, parts))
      .toDF("doc_id", "text", "label")
  }

  test("scoreLinear computes exact integer margins; OOV tokens score zero") {
    val docs = Seq((1L, "foo foo bar baz"), (2L, "baz qux")).toDF("doc_id", "text")
    val w = Seq(("foo", 2L), ("bar", -1L)).toDF("token", "weight")
    val got = QualityClassifier.scoreLinear(docs, w).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1).toSeq
    assert(got == Seq((1L, 3L, 1), (2L, 0L, 0)))
  }

  test("training separates a separable corpus and converges") {
    val m = QualityClassifier.train(corpus(200, 4), iters = 25, lr = 5.0)
    assert(m.lossHistory.size == 25)
    // AdaGrad's first steps can overshoot (tiny accumulators); assert
    // convergence overall and a monotone tail, not per-step descent.
    assert(m.lossHistory.last < m.lossHistory.head / 10,
      s"loss barely moved: ${m.lossHistory.head} -> ${m.lossHistory.last}")
    m.lossHistory.drop(12).sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + 1e-9, s"loss rose in the tail: ${m.lossHistory}")
      case _ => ()
    }
    // learned signs: every good token positive, every bad token negative
    (0 until 5).foreach { k =>
      assert(m.weights(s"good$k") > 0, s"good$k: ${m.weights(s"good$k")}")
      assert(m.weights(s"bad$k") < 0, s"bad$k: ${m.weights(s"bad$k")}")
    }
    // stop tokens carry no label signal: unregularized LR keeps them an
    // order of magnitude below the signal tokens (exact zero needs l2)
    val minSignal = (0 until 5).map(k =>
      math.abs(m.weights(s"good$k")) min math.abs(m.weights(s"bad$k"))).min
    Seq("the", "of", "and", "to", "in").foreach { t =>
      assert(math.abs(m.weights(t)) < 0.1 * minSignal,
        s"$t drifted: ${m.weights(t)} vs signal floor $minSignal")
    }
  }

  test("prCurve matches the hand-computed confusion table") {
    // scores 3,3,2,1 with labels 1,0,1,0: thresholds 3,2,1 give
    // (tp,fp) = (1,1), (2,1), (2,2); pos_total = 2
    val scored = Seq((3L, 1), (3L, 0), (2L, 1), (1L, 0)).toDF("score", "label")
    val got = QualityClassifier.prCurve(scored)
      .orderBy(col("threshold").desc)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == Seq(
      (3L, 1L, 1L, 1L, 0.5, 0.5),
      (2L, 2L, 1L, 0L, 2.0 / 3, 1.0),
      (1L, 2L, 2L, 0L, 0.5, 1.0)))
    // recall is monotone non-decreasing as the threshold drops
    val recalls = got.map(_._6)
    assert(recalls.sliding(2).forall { case Array(a, b) => b >= a; case _ => true })
  }

  test("rocAuc matches the hand-computed rank-sum") {
    // scores 3,3,2,1 labels 1,0,1,0: pairs (pos,neg): (3,3)=tie→0.5,
    // (3,1)=1, (2,3)=0, (2,1)=1 → U = 2.5, AUC = 2.5/4 = 0.625
    val scored = Seq((3L, 1), (3L, 0), (2L, 1), (1L, 0)).toDF("score", "label")
    val r = QualityClassifier.rocAuc(scored).head()
    assert(r.getDouble(0) == 0.625)
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L && r.getLong(3) == 5L)
    // a perfect separator scores 1.0
    val perfect = Seq((9L, 1), (8L, 1), (2L, 0), (1L, 0)).toDF("score", "label")
    assert(QualityClassifier.rocAuc(perfect).head().getDouble(0) == 1.0)
  }

  test("calibration bands: counts exact, negative scores floor down") {
    val scored = Seq((-30L, 0), (-1L, 0), (0L, 1), (24L, 0), (25L, 1))
      .toDF("score", "label")
    val got = QualityClassifier.calibration(scored, bandWidth = 25L)
      .orderBy("band").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      (-2L, -50L, 1L, 0L, 0.0),   // -30 → band -2, not 1
      (-1L, -25L, 1L, 0L, 0.0),
      (0L, 0L, 2L, 1L, 0.5),
      (1L, 25L, 1L, 1L, 1.0)))
  }

  test("selectTopFraction keeps ~frac per group with the strictly-above tie rule") {
    // group a: scores 1..100 distinct; group b: all-tied score 7
    val scored = ((1 to 100).map(i => ("a", i.toLong, i.toLong)) ++
      (1 to 50).map(i => ("b", 1000L + i, 7L)))
      .toDF("lang", "doc_id", "score")
    val got = QualityClassifier.selectTopFraction(scored, "lang", frac = 0.3)
    val a = got.filter(col("lang") === "a")
    // cutoff = order stat at rank ceil(0.7·100) = 70 → keep 71..100
    assert(a.filter(col("kept")).count() == 30)
    assert(a.filter(col("kept")).agg(min("score")).head().getLong(0) == 71L)
    // an all-tied group: nothing is strictly above its own quantile —
    // deterministic, never a random 30% of an indistinguishable pool
    val b = got.filter(col("lang") === "b")
    assert(b.count() == 50 && b.filter(col("kept")).count() == 0)
  }

  test("holdout accuracy >= 0.95 on unseen separable docs") {
    val m = QualityClassifier.train(corpus(200, 4), iters = 25, lr = 5.0)
    // unseen docs 200..279 from the same generator
    val holdout = corpus(280, 4).filter(col("doc_id") >= 200)
    val scored = m.transform(holdout.select("doc_id", "text"))
      .join(holdout.select("doc_id", "label"), Seq("doc_id"))
    val acc = scored
      .select(avg(when((col("p_good") > 0.5) === (col("label") === 1), 1.0)
        .otherwise(0.0)).as("acc"))
      .head().getDouble(0)
    assert(acc >= 0.95, s"holdout accuracy $acc")
  }

  test("trained weights are bit-identical across input partitionings") {
    val m1 = QualityClassifier.train(corpus(120, 1), iters = 5, lr = 20.0)
    val m8 = QualityClassifier.train(corpus(120, 8), iters = 5, lr = 20.0)
    assert(m1.bias == m8.bias)
    assert(m1.weights == m8.weights)
  }

  test("vocabSize caps the model: OOV tokens get no weight") {
    val m = QualityClassifier.train(corpus(100, 4), iters = 3, lr = 20.0,
      vocabSize = 8)
    assert(m.weights.count(_._2 != 0.0) <= 8)
  }
}
