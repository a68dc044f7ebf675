package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** QUERY-DIRECTED multi-probe signatures (Lv et al. 2007, VLDB): per
  * band, the identity signature followed by the `nProbes` hamming-1
  * flips with the SMALLEST hyperplane margin |dot(v, plane_i)| — the
  * bits most likely to differ for a true near neighbor. Flipping every
  * bit probes (r+1)× buckets for recall that concentrates almost
  * entirely in the low-margin flips; probing only those keeps the
  * probe fan-out CONSTANT (T+1) while r grows as log₂ n — at 1B
  * vectors that is 4× probe rows instead of ~21×.
  *
  * Output: array of `bands` arrays, each `[sig, sig^(1<<i₁), …,
  * sig^(1<<i_T)]` with T = min(nProbes, planesPerBand), picks ordered
  * by (margin ASC, plane index ASC). Every margin is a sum of
  * ±quantized-integer doubles — exact IEEE arithmetic, so the ranking
  * (and therefore the probe SET) is engine-portable: the DuckDB oracle
  * replays the identical picks with a `row_number() OVER (ORDER BY m
  * ASC NULLS LAST, i)` window over `abs(list_dot_product(...))` terms.
  *
  * Contracts shared with [[RhpSignaturesExpr]] (property-gated against
  * the composed form in `SimilaritySpec`): null elements contribute 0,
  * a NULL vector has margin 0 on every plane (picks fall to plane
  * order 0..T-1, sig 0 — matching the oracle's NULLS LAST + index
  * tie-break), planes beyond the vector length see the common prefix,
  * weights are the same flat radWeight literals the oracle inlines.
  */
case class RhpProbesExpr(child: Expression, bands: Int,
    planesPerBand: Int, dims: Int, stride: Int, nProbes: Int)
    extends UnaryExpression {

  require(bands >= 1 && planesPerBand >= 1 && planesPerBand <= stride,
    s"rhp_probes: need 1 <= planesPerBand <= stride, " +
      s"got bands=$bands ppb=$planesPerBand stride=$stride")
  require(planesPerBand <= 63, "signature bits must fit a long")
  require(nProbes >= 1, s"rhp_probes: need nProbes >= 1, got $nProbes")

  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false),
      containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "rhp_probes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double|float>, got ${dt.catalogString}")
  }

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val t = math.min(nProbes, planesPerBand)

  // flat [band·ppb + i][d] ±1 weights — same layout/constants as
  // RhpSignaturesExpr and the oracle literals
  @transient private lazy val weights: Array[Double] = {
    val w = new Array[Double](bands * planesPerBand * dims)
    var b = 0
    while (b < bands) {
      var i = 0
      while (i < planesPerBand) {
        val p = b * stride + i
        var d = 0
        while (d < dims) {
          w((b * planesPerBand + i) * dims + d) =
            graft.operators.Similarity.radWeight(p, d)
          d += 1
        }
        i += 1
      }
      b += 1
    }
    w
  }

  def compute(arr: ArrayData): ArrayData = {
    val out = new Array[ArrayData](bands)
    // NULL vector: sig 0 (the RhpSignaturesExpr/oracle contract — each
    // composed dot is NULL, each bit falls to 0) and margin 0 on every
    // plane, so picks fall to plane order — matching the oracle's
    // `ORDER BY m ASC NULLS LAST, i` window where every m is NULL.
    val isNullVec = arr == null
    val n = if (isNullVec) 0 else math.min(arr.numElements(), dims)
    val w = weights
    val margins = new Array[Double](planesPerBand)
    var b = 0
    while (b < bands) {
      var sig = 0L
      var i = 0
      while (i < planesPerBand) {
        val base = (b * planesPerBand + i) * dims
        var acc = 0.0
        var d = 0
        while (d < n) {
          if (!arr.isNullAt(d)) {
            val x = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
            acc += w(base + d) * x
          }
          d += 1
        }
        if (acc >= 0 && !isNullVec) sig |= 1L << i
        margins(i) = math.abs(acc)
        i += 1
      }
      // T smallest (margin, i) via selection — ppb <= 24, T tiny
      val probes = new Array[Long](t + 1)
      probes(0) = sig
      val taken = new Array[Boolean](planesPerBand)
      var k = 0
      while (k < t) {
        var best = -1
        var i2 = 0
        while (i2 < planesPerBand) {
          if (!taken(i2) &&
              (best < 0 || margins(i2) < margins(best))) best = i2
          i2 += 1
        }
        taken(best) = true
        probes(k + 1) = sig ^ (1L << best)
        k += 1
      }
      out(b) = new GenericArrayData(probes)
      b += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  override def eval(input: InternalRow): Any =
    compute(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("rhpProbes", this,
      classOf[RhpProbesExpr].getName)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $ref.compute(${c.isNull} ? null : ${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): RhpProbesExpr = copy(child = newChild)
}
