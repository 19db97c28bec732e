package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector algebra over `array<float>` embedding columns — pure Column
  * (higher-order functions, codegen'd), no UDFs.
  *
  * Numeric reproducibility contract (shared with the DuckDB oracles): cast
  * elements to double FIRST, multiply pairwise, then fold LEFT-to-right in
  * double. Both engines then execute the identical IEEE op sequence, so
  * results are bit-identical and need no tolerance when hash-compared.
  */
object VectorOps {

  /** array<float> → array<double>, element-exact. */
  def toDouble(a: Column): Column = transform(a, _.cast("double"))

  /** Sequential-fold dot product of two equal-length double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** DuckDB SQL fragment computing the same dot product over two
    * DOUBLE[] expressions of length `dim` (1-based list indexing;
    * list_reduce's first-element seed equals a 0.0-seeded left fold).
    */
  def dotSql(a: String, b: String, dim: Int): String =
    s"list_reduce(list_transform(range(1, ${dim + 1}), i -> $a[i] * $b[i]), (x, y) -> x + y)"

  def cosineSql(a: String, b: String, dim: Int): String =
    s"(${dotSql(a, b, dim)} / (sqrt(${dotSql(a, a, dim)}) * sqrt(${dotSql(b, b, dim)})))"

  /** Deterministic pseudo-random hyperplane weight for LSH, computed with
    * exact integer arithmetic so both engines agree bit-for-bit:
    *
    *   idx = j·dim + d
    *   x₀  = (1103515245·idx + 12345) mod 2³¹     (POSIX-rand LCG round)
    *   x₁  = x₀ XOR (x₀ >> 15)                    (avalanche mix)
    *   x₂  = (1103515245·x₁ + 12345) mod 2³¹      (second LCG round)
    *   w   = x₂ / 2³¹ − 0.5
    *
    * TWO rounds with an xorshift between them, not one: a single affine
    * round w = (a·idx + c) mod m has Marsaglia lattice structure, and
    * because plane j+1's weights are the SAME LCG stream shifted by
    * `dim`, adjacent planes' sign bits correlated strongly — bucket
    * codes were dominated by runs-of-ones patterns, one bucket held
    * 2.1% of a 200 000-vector corpus (4 222 rows vs ≈98 expected), and
    * widening the band added almost no entropy, silently defeating
    * [[graft.operators.Similarity.calibrateLshGeometry]] (measured at
    * the round-9 100× audit: 813 M candidates where the geometry
    * predicts ≈150 M). The xor breaks affinity in idx; every step is
    * exact non-negative integer arithmetic bounded by 1103515245·2³¹
    * < 2⁶², so Spark and DuckDB (BIGINT ops raise on overflow rather
    * than wrap — never reached) agree bit-for-bit, and division by 2³¹
    * is exact in double.
    */
  def planeWeight(j: Column, d: Column, dim: Int): Column = {
    val x0 = (lit(1103515245L) * (j.cast("long") * dim + d) + lit(12345L)) %
      lit(2147483648L)
    val x1 = x0.bitwiseXOR(shiftright(x0, 15))
    val x2 = (lit(1103515245L) * x1 + lit(12345L)) % lit(2147483648L)
    x2.cast("double") / lit(2147483648.0) - lit(0.5)
  }

  def planeWeightSql(j: String, i1based: String, dim: Int): String = {
    // 1103515245::BIGINT: DuckDB parses bare int literals as INT32 and
    // RAISES on product overflow (it never wraps — the exactness
    // contract survives); the cast forces 64-bit arithmetic like the JVM
    val x0 = s"((1103515245::BIGINT * ($j * $dim + ($i1based - 1)) + 12345) % 2147483648)"
    val x1 = s"xor($x0, $x0 >> 15)"
    val x2 = s"((1103515245::BIGINT * $x1 + 12345) % 2147483648)"
    s"(($x2::DOUBLE / 2147483648.0) - 0.5)"
  }

  /** Signed-random-projection dot for plane `j` (column) over a double
    * array: sum_d e[d] * w(j,d).
    */
  def planeDot(e: Column, j: Column, dim: Int): Column = {
    val products = zip_with(e, sequence(lit(0), lit(dim - 1)), (x, d) => x * planeWeight(j, d, dim))
    aggregate(products, lit(0.0), (acc, v) => acc + v)
  }

  /** [[planeWeight]] evaluated driver-side with the same exact Long
    * arithmetic — materializes a plane as a literal weight array so hot
    * paths can take the native codegen dot against it instead of the
    * interpreted higher-order [[planeDot]]. Bit-identical by construction.
    */
  def planeWeightValue(j: Int, d: Int, dim: Int): Double = {
    val x0 = (1103515245L * (j.toLong * dim + d) + 12345L) % 2147483648L
    val x1 = x0 ^ (x0 >> 15)
    val x2 = (1103515245L * x1 + 12345L) % 2147483648L
    x2.toDouble / 2147483648.0 - 0.5
  }

  def planeArray(j: Int, dim: Int): Array[Double] =
    Array.tabulate(dim)(d => planeWeightValue(j, d, dim))

  def planeDotSql(e: String, j: String, dim: Int): String =
    s"list_reduce(list_transform(range(1, ${dim + 1}), i -> $e[i] * ${planeWeightSql(j, "i", dim)}), (x, y) -> x + y)"
}
