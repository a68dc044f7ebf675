package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Integer-micro vector quantization as ONE codegen'd loop — the fused
  * form of [[graft.operators.Similarity.quantizeComposed]]:
  *
  *   `transform(vec, x -> CAST(floor(x * 1e6) AS DOUBLE))`
  *
  * — an interpreted HigherOrderFunction evaluated per element, paid
  * dims × corpus times under every RHP-LSH banding pass (q41 / q113 /
  * q128's recall rig). The loop replicates the composed chain exactly:
  * Spark's Floor on a double yields a LONG (Scala double→long
  * SATURATES: NaN → 0, ±Infinity → Long.Min/MaxValue) which the cast
  * widens back to double; NULL elements stay NULL; a NULL vector stays
  * NULL. Property-gated in `VectorFusionSpec`.
  */
case class QuantizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "quantize_micros"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType | FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double|float>, got ${dt.catalogString}")
  }

  @transient private lazy val floatElements: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  def compute(arr: ArrayData): Any = {
    if (arr == null) return null
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x =
          if (floatElements) arr.getFloat(i).toDouble else arr.getDouble(i)
        out(i) = java.lang.Double.valueOf(
          math.floor(x * 1e6).toLong.toDouble)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("quantize", this,
      classOf[QuantizeExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
        $ref.compute($c);""")
  }

  override protected def withNewChildInternal(
      newChild: Expression): QuantizeExpr = copy(child = newChild)
}
