package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** ALL band signatures of the random-hyperplane LSH family in one loop
  * over the vector's dimensions — the signature stage of the banded ANN
  * path (reference behavior: near-dup detection over embeddings).
  *
  * Semantically identical to `bands` × `planesPerBand` compositions of
  * `when(dot_product(v, ±1-weights(p)) >= 0, 1<<i).otherwise(0)` OR'd per
  * band, with the same contracts: null elements contribute 0 to every
  * plane sum, a NULL vector yields all-zero signatures (each composed
  * dot is NULL, each bit falls to the otherwise-0 branch), extra planes
  * beyond the vector length see only the common prefix (DotProduct's
  * min-length rule), and sums accumulate in dimension order (irrelevant
  * here anyway — inputs are quantized integer-valued doubles, so every
  * partial sum is exact).
  *
  * Why not the composition: each dot is codegen'd, but 40+ of them in one
  * projection push the generated method past the JIT's size ceiling and
  * the whole stage silently drops to interpreted bytecode — measured 7.3 s
  * for 4×10 planes over 20 k vectors where 4×8 ran in 1.0 s (a 7×
  * superlinear cliff, the round-6 q41 profile). One expression = one
  * JIT-friendly method whose work grows with loop TRIP COUNT, not code
  * size: the same 4×10 case runs in the sub-second range and ppb can grow
  * to the PlaneStride=24 ceiling without touching the cliff.
  *
  * Weight layout: plane index `band·stride + i` for bit `i` (the
  * [[graft.operators.Similarity.PlaneStride]] numbering that keeps every
  * plane's ±1 pattern a static literal in the DuckDB oracle).
  * Weights are materialized once per expression instance as a flat
  * `(bands·planesPerBand)×dims` array from the same
  * [[graft.operators.Similarity.radWeight]] constants the oracle inlines.
  */
case class RhpSignaturesExpr(child: Expression, bands: Int,
    planesPerBand: Int, dims: Int, stride: Int)
    extends UnaryExpression {

  require(bands >= 1 && planesPerBand >= 1 && planesPerBand <= stride,
    s"rhp_signatures: need 1 <= planesPerBand <= stride, " +
      s"got bands=$bands ppb=$planesPerBand stride=$stride")
  require(planesPerBand <= 63, "signature bits must fit a long")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // the ARRAY is never null — a NULL vector yields all-zero signatures
  override def nullable: Boolean = false
  override def prettyName: String = "rhp_signatures"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double|float>, got ${dt.catalogString}")
  }

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // flat [band·ppb + i][d] ±1 weights, from the same plan-build constants
  // the oracle SQL inlines — one shared copy for eval and generated code
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
    val sigs = new Array[Long](bands)
    if (arr == null) return new GenericArrayData(sigs)
    val n = math.min(arr.numElements(), dims)
    val w = weights
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
        if (acc >= 0) sig |= 1L << i
        i += 1
      }
      sigs(b) = sig
      b += 1
    }
    new GenericArrayData(sigs)
  }

  override def eval(input: InternalRow): Any =
    compute(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("rhpSignatures", this,
      classOf[RhpSignaturesExpr].getName)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $ref.compute(${c.isNull} ? null : ${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): RhpSignaturesExpr = copy(child = newChild)
}
