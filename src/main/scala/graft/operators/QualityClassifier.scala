package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.TextOps

/** fastText/DCLM-style linear quality classifier over `documents`-shaped
  * data — the supervised half of corpus curation. Modern pipelines train
  * a cheap linear model on bag-of-words features (label: "looks like a
  * reference corpus" vs not) and keep the documents the model scores
  * high; this operator is that model, Spark-native.
  *
  * Two halves:
  *  - [[scoreLinear]]: inference with an arbitrary (token, weight) dim —
  *    explode → broadcast-join the weight dim → doc-keyed sum. Integer
  *    weights stay integer end-to-end (oracle-exact, q112).
  *  - [[train]]: batch gradient descent for logistic regression. The
  *    MODEL is bounded driver state (vocab ≤ a few 10⁵ token weights,
  *    like KMeans' centroid set and IVF's cells); the DATA never leaves
  *    the executors. Each round broadcasts the weights, computes per-doc
  *    margins (token-keyed join + doc-keyed agg), per-doc residuals
  *    σ(m)−y, then token-keyed gradient sums — two keyed exchanges per
  *    round, both partially aggregated map-side.
  *
  * Determinism: gradient contributions quantize to FIXED-POINT
  * (round_even(g·2²⁴) summed as longs — the q79/KMeans contract) so the
  * trained weights are bit-identical across partitionings; the training
  * trajectory is a pure function of the data. σ/log run on the driver or
  * per-row where their operand sequence is fixed, never inside an
  * order-sensitive aggregation.
  */
object QualityClassifier {

  /** Fixed-point scale for gradient accumulation: 2²⁴ ≈ 7 decimal digits
    * of gradient resolution, ample next to lr ≥ 1e-3.
    */
  private val Fp = 1L << 24
  private val FpD = Fp.toDouble

  /** Per-doc sparse bag-of-words: (doc_id, token, cnt, n_tokens).
    * Tokenization is [[TextOps.words]] — the corpus-wide contract shared
    * with every text oracle.
    */
  def features(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), TextOps.words(col("text")).as("ws"))
      .select(col("doc_id"), size(col("ws")).cast(LongType).as("n_tokens"),
        explode(col("ws")).as("token"))
    toks.groupBy("doc_id", "n_tokens", "token")
      .agg(count(lit(1)).as("cnt"))
      .select(col("doc_id"), col("token"), col("cnt"), col("n_tokens"))
  }

  /** Linear scorer: margin = bias + Σ_t cnt_t · w(t) over the (token,
    * weight) dim, label = margin > bias threshold 0. A LEFT join keeps
    * docs with no in-vocab token (margin = bias). With integer weights
    * and bias the margin is exact integer arithmetic.
    */
  def scoreLinear(docs: DataFrame, weights: DataFrame, bias: Long = 0L): DataFrame =
    scoreFeatures(features(docs), weights, bias)

  /** [[scoreLinear]] over an already-built [[features]] frame — the entry
    * point when the caller derives anything else from the same token
    * stream (e.g. the vocabulary): tokenize once, persist the features,
    * feed both consumers (the q61 unpersisted-diamond lesson).
    */
  def scoreFeatures(feats: DataFrame, weights: DataFrame, bias: Long = 0L): DataFrame =
    feats
      .join(broadcast(weights), Seq("token"), "left")
      .groupBy("doc_id")
      .agg((coalesce(sum(col("cnt") * col("weight")), lit(0L)) + lit(bias)).as("margin"))
      .select(col("doc_id"), col("margin"),
        when(col("margin") > 0, 1).otherwise(0).cast(IntegerType).as("label"))

  /** Precision/recall curve for a scored corpus: one row per DISTINCT
    * score, giving the confusion counts and precision/recall/F1 of the
    * rule "predict positive iff score ≥ this row's score".
    *
    * `scored`: (score: numeric, label ∈ {0,1}). Scale shape: the corpus
    * reduces FIRST via a score-keyed aggregation to the distinct-score
    * dim — bounded by the score range (integer margins), orders of
    * magnitude below the corpus — and only that dim crosses the terminal
    * cumulative window (the q72-cutpoints / q39-shrunken-sort pattern:
    * sketch-sized exchange, never a corpus sort). Counts are exact
    * BIGINTs; precision/recall/F1 are single IEEE divisions of those
    * exact counts, so they hash-match cross-engine.
    */
  def prCurve(scored: DataFrame, scoreCol: String = "score",
      labelCol: String = "label"): DataFrame = {
    val byScore = scored
      .groupBy(col(scoreCol).as("threshold"))
      .agg(count(lit(1)).as("n"), sum(col(labelCol)).cast(LongType).as("n_pos"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("threshold").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val total = byScore.agg(sum(col("n_pos")).as("pos_total"))
    val cum = byScore
      .withColumn("tp", sum(col("n_pos")).over(w))
      .withColumn("fp", sum(col("n") - col("n_pos")).over(w))
      .crossJoin(broadcast(total)) // one-row total, q108 precedent
    cum.select(
      col("threshold"), col("tp"), col("fp"),
      (col("pos_total") - col("tp")).as("fn"),
      (col("tp").cast(DoubleType) / (col("tp") + col("fp"))).as("precision"),
      (col("tp").cast(DoubleType) / col("pos_total")).as("recall"),
      ((lit(2.0) * col("tp")) / (lit(2.0) * col("tp") + col("fp") +
        (col("pos_total") - col("tp")))).as("f1"))
  }

  /** Exact ROC-AUC via the rank-sum (Mann-Whitney U) identity — one row:
    * (auc, pos_total, neg_total, u2). AUC = P(score⁺ > score⁻) + ½·P(=),
    * and 2·U = Σ_s n_pos(s)·(2·n_neg(<s) + n_neg(s)) is EXACT integer
    * arithmetic over the distinct-score dim, so the only float op is the
    * final division — engine-exact with no trapezoid float accumulation.
    * Scale shape: corpus → score-keyed agg (distinct-score dim) →
    * cumulative window over that dim → one-row global agg.
    */
  def rocAuc(scored: DataFrame, scoreCol: String = "score",
      labelCol: String = "label"): DataFrame = {
    val byScore = scored
      .groupBy(col(scoreCol).as("s"))
      .agg(sum(col(labelCol)).cast(LongType).as("n_pos"),
        sum(lit(1) - col(labelCol)).cast(LongType).as("n_neg"))
    val below = org.apache.spark.sql.expressions.Window
      .orderBy(col("s"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    byScore
      .withColumn("neg_below", coalesce(sum(col("n_neg")).over(below), lit(0L)))
      .agg(
        sum(col("n_pos") * (lit(2L) * col("neg_below") + col("n_neg"))).as("u2"),
        sum(col("n_pos")).as("pos_total"),
        sum(col("n_neg")).as("neg_total"))
      .select(
        (col("u2").cast(DoubleType) /
          (lit(2.0) * col("pos_total") * col("neg_total"))).as("auc"),
        col("pos_total"), col("neg_total"), col("u2"))
  }

  /** Reliability table over score bands: band = floor(score / width), per
    * band the exact counts and the empirical positive rate (one division
    * of exact BIGINTs). Calibration on the raw margin scale — binning the
    * sigmoid output would put exp() on the cross-engine path. Pure
    * score-keyed aggregation: one exchange, bands ≤ margin range / width.
    */
  def calibration(scored: DataFrame, bandWidth: Long,
      scoreCol: String = "score", labelCol: String = "label"): DataFrame =
    scored
      .groupBy(floor(col(scoreCol) / lit(bandWidth)).cast(LongType).as("band"))
      .agg(count(lit(1)).as("n"), sum(col(labelCol)).cast(LongType).as("n_pos"))
      .select(col("band"), (col("band") * lit(bandWidth)).as("band_lo"),
        col("n"), col("n_pos"),
        (col("n_pos").cast(DoubleType) / col("n")).as("pos_rate"))

  /** The DCLM-style SELECTION step — what the classifier exists for:
    * keep the top `frac` of each group by score ("the best 30 % of each
    * language", not one global bar that empties low-scoring groups).
    * Cutoff = the group's (1−frac) quantile via one GROUPED
    * percentile_approx (one sketch per group crosses the exchange — the
    * q72/q77 machinery and exactness contract: at accuracy ≥ max group
    * size the cutoff is the exact order statistic at asc rank
    * ceil((1−frac)·n_g)); keep = score STRICTLY above the cutoff (q72's
    * strictly-below convention, deterministic under integer-score ties).
    * Emits every row with its verdict rather than filtering, so the
    * selection is auditable; integer scores keep the cutoff integer.
    */
  def selectTopFraction(scored: DataFrame, groupCol: String, frac: Double,
      scoreCol: String = "score", accuracy: Int = 1000000): DataFrame = {
    require(frac > 0.0 && frac < 1.0, s"frac must be in (0,1), got $frac")
    val cuts = scored.groupBy(groupCol)
      .agg(percentile_approx(col(scoreCol), lit(1.0 - frac), lit(accuracy))
        .as("cutoff"))
    scored.join(broadcast(cuts), Seq(groupCol))
      .withColumn("kept", col(scoreCol) > col("cutoff"))
  }

  /** The trained model: driver-held weights + bias + per-round mean
    * log-loss (loss(0) is the untrained model's).
    */
  final case class Model(weights: Map[String, Double], bias: Double,
      lossHistory: Vector[Double]) {

    /** The model as a parameter frame for [[graft.sources.Storage.writeModel]]:
      * one (token, weight) row per vocab entry plus the bias as the
      * single NULL-token row. Doubles survive parquet exactly, so
      * save → load → [[Model.fromFrame]] scores bit-identically.
      */
    def toFrame(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import spark.implicits._
      (weights.toSeq.map { case (t, w) => (Option(t), w) } :+
        (Option.empty[String], bias)).toDF("token", "weight")
    }
    /** Score new docs with the trained weights (broadcast dim), emitting
      * the probability σ(margin).
      */
    def transform(docs: DataFrame): DataFrame = {
      val spark = docs.sparkSession
      import spark.implicits._
      val wDf = weights.toSeq.toDF("token", "w")
      features(docs)
        .join(broadcast(wDf), Seq("token"), "left")
        .groupBy("doc_id", "n_tokens")
        .agg(coalesce(sum(col("cnt") * col("w")), lit(0.0)).as("dot"))
        .select(col("doc_id"),
          (lit(1.0) / (lit(1.0) + exp(-(col("dot") / col("n_tokens") + lit(bias)))))
            .as("p_good"))
    }
  }

  object Model {
    /** Rebuild a [[Model]] from its [[Model.toFrame]] parameter frame
      * (e.g. after [[graft.sources.Storage.readModel]]). The loss
      * history is a training-time diagnostic and is not persisted.
      */
    def fromFrame(params: DataFrame): Model = {
      val rows = params.select(col("token"), col("weight")).collect()
      val (biasRows, weightRows) = rows.partition(_.isNullAt(0))
      require(biasRows.length == 1,
        s"model frame needs exactly one NULL-token bias row, got ${biasRows.length}")
      Model(
        weightRows.map(r => r.getString(0) -> r.getDouble(1)).toMap
          .withDefaultValue(0.0),
        biasRows.head.getDouble(1), Vector.empty)
    }
  }

  /** Batch logistic regression on length-normalized term frequencies
    * (x_t = cnt_t / n_tokens — bounds every feature in [0,1]), with
    * ADAGRAD per-feature step sizes: plain GD on bag-of-words is
    * crippled by conditioning (ubiquitous stop tokens + the bias span a
    * high-curvature zero-signal direction that caps the stable global
    * rate, while rare informative tokens see gradients orders of
    * magnitude smaller), and AdaGrad's g/√(Σg²) normalization is the
    * standard linear-text-model answer. The accumulators are driver
    * state beside the weights; the distributed pass is unchanged.
    *
    * `labeled`: (doc_id, text, label∈{0,1}). The vocabulary is the
    * `vocabSize` most-document-frequent tokens (ties → token asc,
    * deterministic); everything else is out-of-vocab and ignored, which
    * caps the model (driver memory, broadcast size) independent of corpus
    * width.
    */
  def train(labeled: DataFrame, iters: Int, lr: Double,
      vocabSize: Int = 1 << 15, l2: Double = 0.0): Model = {
    val spark = labeled.sparkSession
    import spark.implicits._

    val feats = features(labeled.select(col("doc_id"), col("text")))
      .join(labeled.select(col("doc_id"), col("label").cast(DoubleType).as("y")), Seq("doc_id"))
      .withColumn("x", col("cnt").cast(DoubleType) / col("n_tokens"))
      .select(col("doc_id"), col("token"), col("x"), col("y"))
      .persist()

    // vocab: top-V by document frequency (partial top-k, no global sort)
    val vocab = feats.groupBy("token").agg(countDistinct("doc_id").as("df"))
      .orderBy(col("df").desc, col("token")).limit(vocabSize)
      .select("token").as[String].collect()

    val nDocs = feats.select("doc_id").distinct().count().toDouble

    var w = Map.empty[String, Double].withDefaultValue(0.0)
    var b = 0.0
    // AdaGrad squared-gradient accumulators (driver model state)
    var gAcc = Map.empty[String, Double].withDefaultValue(0.0)
    var gAccB = 0.0
    val eps = 1e-8
    val losses = Vector.newBuilder[Double]

    val inVocab = feats.join(broadcast(vocab.toSeq.toDF("token")), Seq("token"))
      .persist()

    for (_ <- 0 until iters) {
      val wDf = broadcast(w.toSeq.toDF("token", "w"))
      // per-doc margin; LEFT join keeps zero-weight rounds (w empty) and
      // docs whose every token is OOV
      val perDoc = inVocab
        .join(wDf, Seq("token"), "left")
        .groupBy("doc_id", "y")
        .agg(coalesce(sum(col("x") * col("w")), lit(0.0)).as("dot"))
        .withColumn("p", lit(1.0) / (lit(1.0) + exp(-(col("dot") + lit(b)))))
        .withColumn("resid", col("p") - col("y"))
      // mean log-loss of the CURRENT weights (before the step); clamp
      // away log(0). Driver-visible diagnostic, not part of the model.
      val loss = perDoc.select(avg(
        -(col("y") * log(greatest(col("p"), lit(1e-15))) +
          (lit(1.0) - col("y")) * log(greatest(lit(1.0) - col("p"), lit(1e-15))))).as("l"))
        .head().getDouble(0)
      losses += loss
      // token-keyed gradient, fixed-point quantized per contribution
      val grads = inVocab
        .join(perDoc.select(col("doc_id"), col("resid")), Seq("doc_id"))
        .withColumn("g", bround(col("resid") * col("x") * FpD, 0).cast(LongType))
        .groupBy("token").agg(sum("g").as("gs"))
        .collect().map(r => r.getString(0) -> r.getLong(1) / FpD).toMap
      val gradB = perDoc
        .select(sum(bround(col("resid") * FpD, 0).cast(LongType)).as("gb"))
        .head().getLong(0) / FpD
      w = vocab.map { t =>
        val g = grads.getOrElse(t, 0.0) / nDocs + l2 * w(t)
        gAcc += t -> (gAcc(t) + g * g)
        t -> (w(t) - lr * g / (math.sqrt(gAcc(t)) + eps))
      }.toMap.withDefaultValue(0.0)
      val gb = gradB / nDocs
      gAccB += gb * gb
      b -= lr * gb / (math.sqrt(gAccB) + eps)
    }
    inVocab.unpersist(); feats.unpersist()
    Model(w, b, losses.result())
  }
}
