package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native argmax-cosine cell assignment — the round-14 scale fix for the
  * IVF-assignment family (q44/q102/q118/q120 measured 16–129×/decade at
  * the sf100 board). The declarative form (`crossJoin(broadcast(cents))`
  * → per-pair cosine → `max(struct(cs, cell))`) is algebraically the
  * same O(n·cells) flops, but it MATERIALIZES one ~1 KB row per
  * (vector, centroid) pair — ~2·10⁹ rows / ~2 TB of intermediate at
  * sf100 — so the measured cost is row-copy memory bandwidth, not
  * arithmetic, and it pays a per-vector combine exchange on top. This
  * expression evaluates the whole argmax inside one projection: the
  * centroid matrix rides along as a plan-time reference object (bounded
  * by `calibrateIvfStep`'s maxCells clamp — ≤ 34 MB, the same bound the
  * old broadcast carried), each vector is scored against every centroid
  * in a fused primitive loop, and the operator that used to be
  * crossJoin + shuffle becomes a narrow map.
  *
  * Numeric contract (bit-identical to the declarative form, so every
  * pinned oracle hash is unchanged):
  *   - d_norm = sqrt(Σ eᵢ·eᵢ), c_norm likewise, both left-to-right IEEE
  *     folds — exactly `sqrt(graft_dot(e, e))`;
  *   - cs = dot / (d_norm * c_norm), same association;
  *   - winner = lexicographic max of (cs, cell) under Spark's SQL double
  *     ordering (NaN greatest, NaN = NaN, -0.0 = 0.0) — exactly
  *     `max(struct(cs, cell))`, ties to the HIGHER cell id;
  *   - an embedding whose length ≠ the centroid dim yields the highest
  *     cell id (the declarative form's null-cosine structs all tie and
  *     the max struct carries the max cell).
  * Null embeddings return null (the corpora contain none; the
  * declarative twin in the spec pins only non-null inputs).
  */
/** Content-equal holder for the collected centroid model (round 15 —
  * r14 ADVICE): the expression used to carry the raw arrays as
  * case-class fields, whose generated equality is REFERENCE equality —
  * two `ArgmaxCosine`s built from the same collected model never
  * compared equal/semanticEquals, defeating plan canonicalization,
  * common-subexpression elimination, and the persist-reuse-on-
  * canonicalized-plan contract documented at `ivfIndex`. The holder
  * compares by CONTENT (hash precomputed once — plan canonicalization
  * hashes expressions repeatedly), and rides the plan as one reference
  * object instead of three array literals.
  */
final class CentroidModel(val cells: Array[Long], val centsFlat: Array[Double],
                          val norms: Array[Double], val dim: Int)
    extends Serializable {
  require(cells.nonEmpty, "argmax over zero centroids is undefined — guard at the call site")
  require(dim > 0 && centsFlat.length == cells.length * dim &&
    norms.length == cells.length, "centroid model shape mismatch")
  override def equals(o: Any): Boolean = o match {
    case m: CentroidModel => (m eq this) || (dim == m.dim &&
      java.util.Arrays.equals(cells, m.cells) &&
      java.util.Arrays.equals(centsFlat, m.centsFlat) &&
      java.util.Arrays.equals(norms, m.norms))
    case _ => false
  }
  override val hashCode: Int =
    ((java.util.Arrays.hashCode(cells) * 31 +
      java.util.Arrays.hashCode(centsFlat)) * 31 +
      java.util.Arrays.hashCode(norms)) * 31 + dim
}

case class ArgmaxCosine(child: Expression, model: CentroidModel)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_argmax_cell"

  override protected def withNewChildInternal(newChild: Expression): ArgmaxCosine =
    copy(child = newChild)

  override def nullSafeEval(a: Any): Any =
    ArgmaxCosine.best(a.asInstanceOf[ArrayData],
      model.cells, model.centsFlat, model.norms, model.dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.addReferenceObj("model", model,
        classOf[CentroidModel].getName)
      s"${ev.value} = graft.functions.ArgmaxCosine.best($a, " +
        s"$m.cells(), $m.centsFlat(), $m.norms(), $m.dim());"
    })
}

object ArgmaxCosine {

  /** Spark SQL's double total order (SQLOrderingUtil semantics): NaN is
    * greatest and equal to itself; -0.0 equals 0.0.
    */
  private def cmp(a: Double, b: Double): Int =
    if (a < b) -1
    else if (a > b) 1
    else if (a == b) 0
    else {
      val an = java.lang.Double.isNaN(a)
      val bn = java.lang.Double.isNaN(b)
      if (an && bn) 0 else if (an) 1 else -1
    }

  /** The fused scoring loop — also the codegen target (the generated
    * stage calls straight into this compiled method; the loop is the
    * work, per-row dispatch is noise).
    */
  def best(e: ArrayData, cells: Array[Long], flat: Array[Double],
           norms: Array[Double], dim: Int): Long = {
    val nc = cells.length
    if (e.numElements() != dim) {
      // declarative twin: every pair's cosine is null, the struct max
      // carries the max cell
      var mx = cells(0); var c = 1
      while (c < nc) { if (cells(c) > mx) mx = cells(c); c += 1 }
      return mx
    }
    val v = e.toDoubleArray()
    var sd = 0.0
    var i = 0
    while (i < dim) { sd += v(i) * v(i); i += 1 }
    val dn = math.sqrt(sd)
    var bestCell = 0L
    var bestCs = 0.0
    var c = 0
    while (c < nc) {
      var dot = 0.0
      val base = c * dim
      var j = 0
      while (j < dim) { dot += v(j) * flat(base + j); j += 1 }
      val cs = dot / (dn * norms(c))
      val d = if (c == 0) 1 else cmp(cs, bestCs)
      if (d > 0 || (d == 0 && cells(c) > bestCell)) { bestCs = cs; bestCell = cells(c) }
      c += 1
    }
    bestCell
  }

  /** Left-to-right IEEE norm of one centroid — `sqrt(graft_dot(c, c))`
    * computed driver-side at model-collect time.
    */
  def norm(c: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    math.sqrt(s)
  }
}
