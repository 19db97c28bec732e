package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Dedup

/** Sparse-free Johnson-Lindenstrauss projection with a DETERMINISTIC
  * ±1 matrix (Achlioptas 2003's database-friendly variant, sign-only):
  * reduced_k = Σ_i sign(k,i) · q_i over integer-quantized embeddings,
  * where sign(k,i) = 1 − 2·(bit 10 of (i·a_k + b_k) mod M) comes from
  * the exported minhash hash family (bit 0 of the mod-M residue is
  * measurably biased — row k=8 was CONSTANT over i ≤ 64; bit 10 is
  * balanced 30–38/64 across all rows) — no stored matrix, no RNG; any
  * executor (or engine) regenerates the same projection from two
  * integer literals per output dim. The dimensionality-reduction step
  * in front of ANN/clustering when 64 dims is still too wide for a
  * first-pass index.
  *
  * Entirely map-side: the sign matrix is a compile-time literal per
  * output dim (out_dim × in_dim ints), each reduced component one
  * zip_with/aggregate fold inside codegen — zero shuffles, zero joins;
  * the only exchange in a typical query is the caller's output sort.
  * Integer-exact end to end, so the oracle hash-matches components.
  */
object RandomProjection {

  val Mod: Long = Dedup.MinhashMod

  /** sign(k, i) for 1-based input position i. */
  def sign(k: Int, i: Int): Long =
    1L - 2L * ((i * Dedup.permA(k) + Dedup.permB(k)) % Mod / 1024L % 2L)

  private def qArr(embedding: Column, qScale: Long): Column =
    transform(embedding.cast(ArrayType(DoubleType)),
      v => bround(v * qScale, 0).cast(LongType))

  /** Long-form projection (vec_id, k, comp), k in [0, outDim). */
  def project(emb: DataFrame, inDim: Int, outDim: Int,
              qScale: Long = 1L << 10): DataFrame = {
    val comps = (0 until outDim).map { k =>
      val signs = array((1 to inDim).map(i => lit(sign(k, i))): _*)
      aggregate(zip_with(qArr(col("embedding"), qScale), signs, (a, b) => a * b),
        lit(0L), (acc, x) => acc + x).as(s"c$k")
    }
    val stackArgs = (0 until outDim).map(k => s"$k, c$k").mkString(", ")
    emb.select((col("vec_id") +: comps): _*)
      .select(col("vec_id"), expr(s"stack($outDim, $stackArgs) AS (k, comp)"))
  }

  /** The oracle-side sign dimension as a VALUES CTE: (k, a, b) rows so
    * the SQL regenerates sign(k,i) from the same formula.
    */
  def oracleKs(outDim: Int): String =
    (0 until outDim)
      .map(k => s"($k, ${Dedup.permA(k)}, ${Dedup.permB(k)})")
      .mkString("ks(k, a, b) AS (VALUES ", ", ", ")")
}
