package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Top principal component of an embedding corpus via FIXED-POINT power
  * iteration — the whitening/rotation primitive of embedding pipelines
  * (OPQ-style preprocessing, drift axes, outlier directions), built the
  * q138-PageRank way: every arithmetic step is integer, so an ITERATIVE
  * numeric result is bit-identical across engines, partitionings, and
  * task orders, and the oracle can replay the iterations as unrolled
  * CTEs and hash-match projections exactly.
  *
  * Shape: ONE distributed pass builds the d×d Gram matrix (embeddings
  * quantized to q = round_even(v·2¹⁰); S_ij = Σ_vec q_i·q_j — the double
  * position-explode partial-aggregates map-side, so the shuffle carries
  * d² rows per partition, never the corpus). S is a BOUNDED dim (d² = 64²
  * longs here — the KMeans-centroid convention), so the power iteration
  * itself runs driver-side: v₀ = 2²⁰·1, then t rounds of
  * w = S·v; v' = w / max(max|w|/2²⁰, 1) with truncating Long division
  * (DuckDB's `//` truncates toward zero exactly like JVM Long division —
  * verified, NOT floor; the divide-by-d form avoids the w·2²⁰ overflow).
  * Projections p = Σ q_i·v_i stream map-side with the eigenvector as a
  * broadcast literal.
  *
  * Overflow budget (all exact): |q| ≤ 0.6·2¹⁰, so S_ij ≤ n·2¹⁹ and the
  * matvec accumulates w_i ≤ d·S_ij·|v| ≈ 64·n·2¹⁸·⁵·2²⁰ ≈ n·2⁴⁵ — Long
  * exactness therefore caps n at ~2¹⁷–2¹⁸ vectors per exact run (NOT
  * 2²⁰; the d·|v| factors cost ~8 bits). [[topComponentInt]] enforces
  * the bound on the ACTUAL collected Gram magnitudes, so an oversized
  * corpus fails loudly instead of wrapping silently. At corpus scale,
  * sample the Gram pass (PC direction is a statistic, the projections
  * stay exact) or raise the scale-down shift; the fixture sizes are
  * orders of magnitude inside the budget.
  */
object Pca {

  /** Embedding quantization scale (2¹⁰) — matches the oracle's
    * round_even(emb[i]·1024).
    */
  val QScale: Long = 1L << 10

  /** Eigenvector fixed-point scale (2²⁰). */
  val VScale: Long = 1L << 20

  private def qArr(embedding: Column): Column =
    transform(embedding.cast(ArrayType(DoubleType)),
      v => bround(v * QScale, 0).cast(LongType))

  /** Integer Gram matrix rows (i, j, s), 1-based positions. */
  def gramInt(emb: DataFrame, dim: Int): DataFrame =
    emb.select(qArr(col("embedding")).as("q"))
      .withColumn("i", explode(sequence(lit(1), lit(dim))))
      .withColumn("qi", element_at(col("q"), col("i")))
      .withColumn("j", explode(sequence(lit(1), lit(dim))))
      .withColumn("qj", element_at(col("q"), col("j")))
      .groupBy("i", "j")
      .agg(sum(col("qi") * col("qj")).as("s"))

  /** Driver-side power iteration over the collected (bounded, d²-long)
    * Gram matrix. Returns the fixed-point eigenvector, scale 2²⁰.
    */
  def topComponentInt(emb: DataFrame, dim: Int, iters: Int): Array[Long] = {
    require(iters >= 1)
    val s = Array.ofDim[Long](dim, dim)
    gramInt(emb, dim).collect().foreach { r =>
      s(r.getInt(0) - 1)(r.getInt(1) - 1) = r.getLong(2)
    }
    // wraparound guard: each matvec term is ≤ |S_ij|·max|v|, and the
    // truncating normalization keeps max|v| < 2·VScale, so the d-term
    // accumulator is bounded by d · maxAbsS · 2·VScale — require it
    // fits in Long or fail loudly (silent wrap would corrupt the
    // eigenvector without any error)
    val maxAbsS = s.iterator.flatMap(_.iterator).map(math.abs).max
    require(maxAbsS <= Long.MaxValue / (2L * dim * VScale),
      s"Gram magnitudes too large for exact Long power iteration " +
        s"(max |S_ij| = $maxAbsS, d = $dim): sample the Gram pass or " +
        "raise the quantization shift")
    var v = Array.fill(dim)(VScale)
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dim) { i =>
        var acc = 0L
        var j = 0
        while (j < dim) { acc += s(i)(j) * v(j); j += 1 }
        acc
      }
      val m = w.map(math.abs).max
      require(m > 0, "degenerate Gram matrix (all-zero embeddings)")
      // normalize via d = max(m/2²⁰, 1) so |v'| ≈ 2²⁰ WITHOUT forming
      // w·2²⁰ (which overflows Int64 — m reaches ~2⁴³ here); both
      // divisions truncate toward zero ≡ DuckDB //
      val d = math.max(m / VScale, 1L)
      v = w.map(_ / d)
    }
    v
  }

  /** Per-vector integer projections onto the top component for
    * vec_id < `maxId`: (vec_id, proj). Map-side — the eigenvector rides
    * along as a literal array, never a join.
    */
  def projectTop(emb: DataFrame, dim: Int, iters: Int, maxId: Long): DataFrame = {
    val v = topComponentInt(emb, dim, iters)
    val vLit = array(v.map(lit): _*)
    emb.filter(col("vec_id") < maxId)
      .select(col("vec_id"),
        aggregate(zip_with(qArr(col("embedding")), vLit, (a, b) => a * b),
          lit(0L), (acc, x) => acc + x).as("proj"))
  }

  /** The oracle's unrolled power-iteration CTE chain: v0 … v{iters},
    * expecting a CTE `s(i, j, s)` (the Gram matrix) in scope. Matches
    * [[topComponentInt]] exactly (truncating `//`).
    */
  def oracleIterCtes(dim: Int, iters: Int): String =
    s"v0 AS (SELECT unnest(range(1, ${dim + 1})) AS i, CAST($VScale AS BIGINT) AS v)" +
      (1 to iters).map { t =>
        s""",
           |w$t AS (SELECT s.i, CAST(SUM(s.s * v${t - 1}.v) AS BIGINT) AS w
           |        FROM s JOIN v${t - 1} ON v${t - 1}.i = s.j GROUP BY s.i),
           |m$t AS (SELECT GREATEST(MAX(ABS(w)) // $VScale, 1) AS d FROM w$t),
           |v$t AS (SELECT i, w // d AS v FROM w$t, m$t)""".stripMargin
      }.mkString
}
