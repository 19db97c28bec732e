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
}
