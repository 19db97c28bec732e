package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Deterministic stratified sampling for training-data curation: keep a
  * row iff md5Hash32(key) mod 10000 < rate_bp(group), with per-group
  * basis-point rates from a small dim (broadcast join) and a default for
  * unlisted groups.
  *
  * This is `df.stat.sampleBy` minus the RNG: membership is a pure
  * function of the KEY, so it is stable across runs, engines,
  * repartitioning, and incremental re-processing — the property that
  * makes a 100 TB downsample reproducible (and lets an oracle verify it
  * exactly). Map-side only: one broadcast join, a pushed-down filter, no
  * shuffle.
  */
object Sampling {

  val Modulus = 10000 // basis points: rate_bp = 9000 keeps ~90 %

  def sampleHash(key: Column): Column =
    TextOps.hash32(key.cast("string")) % Modulus

  /** `ratesBp`: group value → keep-rate in basis points (of [[Modulus]]);
    * groups not listed use `defaultBp`.
    */
  def stratified(df: DataFrame, keyCol: Column, groupCol: Column,
                 ratesBp: Map[String, Int], defaultBp: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // internal columns namespaced so they can't collide with the input's
    val rates = ratesBp.toSeq.toDF("__sampling_group", "__sampling_rate_bp")
    df.join(broadcast(rates), groupCol === col("__sampling_group"), "left_outer")
      .filter(sampleHash(keyCol) <
        coalesce(col("__sampling_rate_bp"), lit(defaultBp)))
      .drop("__sampling_group", "__sampling_rate_bp")
  }

  /** EXACTLY-k per group (deterministic reservoir): rank each group's
    * rows by (md5Hash32(key), key) — a uniform-without-replacement draw
    * whose membership is a pure function of the keys, like
    * [[stratified]] but with a FIXED quota instead of a rate: "200 eval
    * docs per language" regardless of how skewed the group sizes are.
    *
    * Scale: one shuffle on the group key; Spark's WindowGroupLimit
    * pushes `rn <= k` down to a per-partition top-k before the shuffle,
    * so a billion-row group moves only k·partitions candidates, never
    * the group (SamplingSpec pins the optimization into the plan).
    * Output keeps the input columns + `rn` (1-based draw order — a
    * stable sub-sample prefix: rows with rn <= j are exactly the
    * k=j draw).
    */
  def reservoirK(df: DataFrame, keyCol: Column, groupCol: Column, k: Int): DataFrame = {
    require(k >= 1, s"reservoir size must be >= 1, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol)
      .orderBy(graft.functions.ScalarOps.md5Hash32(keyCol), keyCol)
    df.withColumn("rn", row_number().over(w).cast("int"))
      .filter(col("rn") <= k)
  }

  /** Per-row WEIGHTED (importance) sampling: keep iff
    * hash(key) < weight·[[Modulus]], `weight` any per-row expression in
    * [0, 1] (a quality score, a length ramp, an upsample factor). The
    * deterministic analogue of `rand() < weight` with the same
    * reproducibility contract as [[stratified]]; map-side only, no
    * shuffle, filter pushes toward the scan.
    */
  def weighted(df: DataFrame, keyCol: Column, weight: Column): DataFrame =
    df.filter(sampleHash(keyCol) < weight * Modulus)

  /** Deterministic UPSAMPLING — the epochs/repeat side of data mixing
    * ([[mixture]] and [[stratified]] only thin). Per-group weights in
    * basis points of [[Modulus]] (24000 = 2.4 epochs): every row gets
    * floor(bp/10000) whole copies plus one more iff
    * hash(key) < bp mod 10000 — so a group's expected multiplicity is
    * exactly bp/10000, membership of the fractional copy is a pure
    * function of the KEY (stable across runs/engines/partitionings), and
    * weights < 1 degrade to [[stratified]] thinning. Output repeats each
    * surviving row with copy = 1..n_copies.
    *
    * Pure map-side: one broadcast dim join + an explode — no shuffle, no
    * RNG; the 100 TB shape for "2.4 epochs of Wikipedia, 0.5 of CC".
    */
  def upsample(df: DataFrame, keyCol: Column, groupCol: Column,
               weightsBp: Map[String, Int], defaultBp: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val weights = weightsBp.toSeq.toDF("__up_group", "__up_bp")
    df.join(broadcast(weights), groupCol === col("__up_group"), "left_outer")
      .withColumn("__up_eff", coalesce(col("__up_bp"), lit(defaultBp)))
      .withColumn("__up_n",
        (col("__up_eff") / lit(Modulus)).cast("long") +
          when(sampleHash(keyCol) < col("__up_eff") % lit(Modulus), 1L).otherwise(0L))
      .filter(col("__up_n") >= 1L)
      .withColumn("copy", explode(sequence(lit(1L), col("__up_n"))))
      .drop("__up_group", "__up_bp", "__up_eff", "__up_n")
  }

  /** Data-MIXTURE rebalancing — resample a corpus to target group
    * proportions (the static mixture step of training-data pipelines:
    * "40 % en, 15 % each of de/es/fr/zh"). The binding group fixes the
    * total (T = min_g count_g / share_g, keeping ALL of the scarcest
    * group and downsampling the rest), per-group quotas are
    * floor(share·T), and membership is EXACT and deterministic: rows
    * rank by (hash(key), key) within their group and the top quota
    * survive. Groups without a target share are dropped.
    *
    * Scale: counts and quotas are one keyed aggregation + a tiny
    * broadcast dim; exact quotas cost a per-group window sort — when an
    * approximate rate suffices at extreme scale, [[stratified]] with
    * rate_bp = quota/count is the sort-free form.
    */
  def mixture(df: DataFrame, keyCol: Column, groupCol: Column,
              targetShares: Map[String, Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val shares = targetShares.toSeq.toDF("__mix_group", "__mix_share")
    val counts = df.groupBy(groupCol.as("__mix_group")).agg(count(lit(1)).as("__mix_n"))
      .join(broadcast(shares), Seq("__mix_group"))
    val total = counts.agg(min(col("__mix_n") / col("__mix_share")).as("__mix_total"))
    // share·T for the BINDING group is exactly its count in ℝ, but IEEE
    // can land a hair under the integer (0.7 · (3/0.7) = 2.9999…96) and
    // floor would then drop a row of the scarcest group — the one group
    // the contract keeps whole. The ε nudge forgives that representation
    // error; least(count, ·) re-caps any group ε pushes past its size.
    val quota = counts.crossJoin(broadcast(total))
      .select(col("__mix_group"),
        least(col("__mix_n"),
          floor(col("__mix_share") * col("__mix_total") + lit(1e-9)))
          .cast("long").as("__mix_quota"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(sampleHash(keyCol), keyCol)
    df.join(broadcast(quota), groupCol === col("__mix_group"))
      .withColumn("__mix_rk", row_number().over(w))
      .filter(col("__mix_rk") <= col("__mix_quota"))
      .drop("__mix_group", "__mix_quota", "__mix_rk")
  }

  /** √-capped group sampling — the multilingual "temperature" heuristic
    * in its exactly-verifiable form: group g keeps
    * `min(n_g, c · floor(√n_g))` rows, so huge groups downsample ∝ √n
    * (English stops drowning the tail languages) while groups under
    * the cap pass through whole. `floor(√x)` is engine-exact — IEEE
    * sqrt is correctly rounded, unlike pow/exp — which is why this is
    * the T = 2 temperature form a cross-engine contract can actually
    * pin. Membership is the hash-rank rule ([[reservoirK]]'s window):
    * deterministic, reproducible, top-rank-stable under re-runs.
    *
    * One group-keyed count window + one rank window over the same
    * partitioning — a single exchange.
    */
  def sqrtCapped(df: DataFrame, keyCol: Column, groupCol: Column,
                 c: Long): DataFrame = {
    require(c >= 1, "cap multiplier must be >= 1")
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
    val wRank = wAll.orderBy(sampleHash(keyCol), keyCol)
    df.withColumn("__sc_n", count(lit(1)).over(wAll))
      .withColumn("__sc_quota",
        least(col("__sc_n"),
          lit(c) * floor(sqrt(col("__sc_n").cast("double"))).cast("long")))
      .withColumn("__sc_rn", row_number().over(wRank).cast("long"))
      .filter(col("__sc_rn") <= col("__sc_quota"))
      .drop("__sc_n", "__sc_quota", "__sc_rn")
  }

  /** Curriculum schedule: a deterministic multi-epoch training order
    * that ANNEALS from high quality to the full corpus — epoch e admits
    * documents whose quality decile is ≤ `epochCaps(e-1)` (decile 1 =
    * best; deciles come from [[FeatureEng.quantileBins]]' sketch
    * boundaries + map-side assignment, NOT a global rank window — a
    * corpus-wide ORDER BY would serialize 100 TB through one sort), so
    * early epochs see only the cleanest data and later epochs widen.
    * Within an epoch, order is (shard, seq): shard = md5(key) mod
    * nShards and seq the hash-ordered rank WITHIN (epoch, shard) — the
    * [[graft.sources.Storage.exportTrainingShards]] layout, so trainers
    * stream shards independently and no epoch serializes globally.
    *
    * Epoch membership is a map-side array filter (no non-equi join);
    * the only exchanges are the sketch histogram aggregation and the
    * (epoch, shard) sequence window. Everything is integer/hash
    * deterministic — the schedule reproduces across runs, engines, and
    * partitionings.
    *
    * Output: (epoch, shard, seq, key, decile).
    */
  def curriculum(df: DataFrame, keyCol: Column, qualityCol: Column,
                 epochCaps: Seq[Int], nShards: Int): DataFrame = {
    require(epochCaps.nonEmpty && epochCaps.forall(c => c >= 1 && c <= 10),
      "epochCaps must be decile caps in 1..10")
    require(nShards >= 1, "nShards must be >= 1")
    val caps = epochCaps.zipWithIndex
      .map { case (c, i) => s"struct(${i + 1} AS epoch, $c AS cap)" }
      .mkString("array(", ", ", ")")
    val wSeq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("epoch"), col("shard"))
      .orderBy(col("__cu_hash"), col("key"))
    FeatureEng.quantileBins(
        df.select(keyCol.as("key"), qualityCol.cast("long").as("__cu_q")),
        col("__cu_q"), nBins = 10)
      .withColumn("decile", lit(10) - col("bin_id")) // bin 9 = top values
      .withColumn("__cu_hash", TextOps.hash32(col("key").cast("string")))
      .withColumn("shard", pmod(col("__cu_hash"), lit(nShards.toLong)))
      .withColumn("epoch",
        explode(expr(s"filter($caps, x -> x.cap >= decile).epoch")))
      .withColumn("seq", row_number().over(wSeq).cast("long"))
      .select("epoch", "shard", "seq", "key", "decile")
  }

  /** Leakage-safe train/val split: the split key is the NEAR-DUP CLUSTER
    * id, not the document id, so every member of a near-duplicate family
    * lands in the same split — hashing raw doc ids (q53's shape) leaks
    * val-set content into training whenever a near-copy of a val doc
    * exists, which near-dup-heavy web corpora guarantee. `clusters` is
    * any (id, cluster_id) assignment ([[Similarity.nearDupClusters]],
    * [[Dedup]] MinHash components…); unclustered docs fall back to their
    * own id (a cluster of one). Membership stays a pure hash of the key
    * — deterministic across runs, engines, and partitionings. One keyed
    * left join + map-side hash; no extra shuffles beyond the join.
    */
  def leakageSafeSplit(df: DataFrame, keyCol: Column, clusters: DataFrame,
                       trainPct: Int): DataFrame = {
    val cl = clusters.select(col("id").as("__ls_id"), col("cluster_id"))
    df.join(cl, keyCol === col("__ls_id"), "left")
      .withColumn("split_key", coalesce(col("cluster_id"), keyCol))
      .withColumn("split",
        when(TextOps.hash32(col("split_key").cast("string")) % 100 < trainPct,
          "train").otherwise("val"))
      .drop("__ls_id", "cluster_id")
  }
}
