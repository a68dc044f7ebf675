package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Perceptual aHash over a 64-element luma thumb as ONE codegen'd loop —
  * the fused form of [[graft.operators.Multimodal.aHashComposed]]:
  *
  *   total = aggregate(thumb, 0, acc + x)
  *   bits  = transform(thumb, v -> v*64 >= total ? 1 : 0)
  *   h     = (fold(bits[32..63]) << 32) | fold(bits[0..31])
  *
  * — three HigherOrderFunctions, each evaluating INTERPRETED per
  * element (the documented reason q134's decode needed a
  * materialization barrier at all). The fused loop computes the total,
  * threshold and both packed halves in one pass: bit k of the result =
  * (thumb[k]*64 >= total).
  *
  * Contracts mirrored exactly (property-gated in `AHash64Spec`):
  * NULL array → NULL; any NULL ELEMENT nulls the aggregate total, which
  * zeroes every comparison → hash 0 (the composed chain's null
  * propagation); arrays shorter/longer than 64 pack exactly like the
  * slice(1,32)/slice(33,32) folds (elements past 64 are ignored).
  */
case class AHash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "ahash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // the REAL decoder's thumbs are array<int>; the fake-decode path
    // builds array<bigint> — the composed HOF chain coerced both
    case ArrayType(LongType, _) | ArrayType(IntegerType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> or array<int>, " +
        s"got ${dt.catalogString}")
  }

  @transient private lazy val intElements: Boolean = child.dataType match {
    case ArrayType(IntegerType, _) => true
    case _ => false
  }

  def compute(arr: ArrayData): Any = {
    if (arr == null) return null
    val n = arr.numElements()
    @inline def elem(idx: Int): Long =
      if (intElements) arr.getInt(idx).toLong else arr.getLong(idx)
    var total = 0L
    var i = 0
    while (i < n) {
      // a NULL element nulls the composed form's running total, which
      // turns every v*64 >= NULL comparison NULL -> bit 0 -> hash 0
      if (arr.isNullAt(i)) return 0L
      total += elem(i)
      i += 1
    }
    var h = 0L
    val m = math.min(n, 64)
    i = 0
    while (i < m) {
      if (elem(i) * 64L >= total) h |= 1L << i
      i += 1
    }
    h
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ahash", this,
      classOf[AHash64Expr].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      Object r = $ref.compute($c);
      if (r == null) { ${ev.isNull} = true; } else {
        ${ev.value} = ((Long) r).longValue();
      }""")
  }

  override protected def withNewChildInternal(
      newChild: Expression): AHash64Expr = copy(child = newChild)
}
