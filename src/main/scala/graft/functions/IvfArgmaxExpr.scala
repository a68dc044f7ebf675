package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** The IVF assignment argmax — "which packed centroid has the highest
  * rounded cosine against this row's embedding" — in ONE fused loop,
  * replacing the `array_max(transform(cents, c => struct(round(
  * try_divide(dot(e, c.cv), norm·c.cnorm), dp), −cid, cid)))` HOF
  * composition. The composition is semantically right but runs
  * INTERPRETED (HOF lambdas never enter whole-stage codegen): ~1.6 s of
  * q110's 3.5 s at sf1 was per-element lambda evaluation over
  * n·k = 2.6 M centroid probes. This loop runs the same arithmetic at
  * native speed and also folds the row-norm staging into the same pass.
  *
  * EXACT replication of the composed form's semantics (property-gated
  * against it in `SimilaritySpec`):
  *  - dot = [[DotProduct]]'s contract: min-length prefix, NULL elements
  *    contribute 0, left-to-right IEEE sum; row norm = sqrt(dot(e, e)).
  *  - cos = round(try_divide(dot, norm·cnorm), dp): NULL when any
  *    operand is NULL or the denominator is 0; round is Spark's double
  *    round (shortest-decimal BigDecimal, HALF_UP; NaN/±Inf pass
  *    through).
  *  - argmax = Spark's struct ordering on (cos, −centroid_id): field-wise
  *    ascending with NULLS FIRST, doubles compared SQL-style (NaN
  *    greatest, −0.0 == 0.0), so ties on cos go to the SMALLEST id and
  *    a NULL id loses every tie; a NULL embedding (every cos NULL)
  *    still selects the smallest id with a NULL cos — exactly what the
  *    composed max over all-NULL-cos structs did.
  *  - empty or NULL centroid array → NULL (the caller filters, matching
  *    `array_max(empty) = NULL`).
  *
  * Output: struct<centroid_id (the packed id type), cos double>.
  */
case class IvfArgmaxExpr(left: Expression, right: Expression, roundDp: Int)
    extends BinaryExpression {

  override def prettyName: String = "ivf_argmax"
  override def nullable: Boolean = true

  private def centsType: ArrayType = right.dataType.asInstanceOf[ArrayType]
  private def centStruct: StructType =
    centsType.elementType.asInstanceOf[StructType]
  private def cidType: DataType = centStruct.fields(0).dataType
  private def cvElemIsFloat: Boolean =
    centStruct.fields(1).dataType.asInstanceOf[ArrayType]
      .elementType == FloatType
  private def embElemIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = StructType(Seq(
    StructField("centroid_id", cidType, nullable = true),
    StructField("cos", DoubleType, nullable = true)))

  override def checkInputDataTypes(): TypeCheckResult = {
    def arrOfFp(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    (left.dataType, right.dataType) match {
      case (e, ArrayType(s: StructType, _))
          if arrOfFp(e) && s.length == 3 &&
            (s.fields(0).dataType == LongType ||
              s.fields(0).dataType == IntegerType) &&
            arrOfFp(s.fields(1).dataType) &&
            s.fields(2).dataType == DoubleType =>
        TypeCheckResult.TypeCheckSuccess
      case (e, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float|double>, array<struct<" +
          s"centroid_id int|bigint, cv array<float|double>, cnorm " +
          s"double>>), got ${e.catalogString}, ${c.catalogString}")
    }
  }

  // SQL double comparison: -0.0 == 0.0, NaN greater than everything
  private def cmpD(a: Double, b: Double): Int =
    if (a == b) 0 else java.lang.Double.compare(a, b)

  private def dotMixed(a: ArrayData, aFloat: Boolean, b: ArrayData,
      bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
        s += x * y
      }
      i += 1
    }
    s
  }

  /** Spark's Round for doubles: shortest-decimal BigDecimal, HALF_UP,
    * NaN/Inf pass through.
    */
  private def roundSpark(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(roundDp, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Null for a null/empty centroid array; otherwise a 2-field row
    * (centroid_id — null only if the winning packed id was null —, cos).
    */
  def compute(embArr: ArrayData, cents: ArrayData): InternalRow = {
    if (cents == null) return null
    val k = cents.numElements()
    if (k == 0) return null
    val eFloat = embElemIsFloat
    val cFloat = cvElemIsFloat
    val cidLong = cidType == LongType
    val norm =
      if (embArr == null) -1.0 // sentinel: every cos is NULL
      else math.sqrt(dotMixed(embArr, eFloat, embArr, eFloat))
    var found = false
    var bestCosNull = true
    var bestCos = 0.0
    var bestCidNull = true
    var bestCid = 0L
    var j = 0
    while (j < k) {
      if (!cents.isNullAt(j)) {
        val c = cents.getStruct(j, 3)
        val cidNull = c.isNullAt(0)
        val cid =
          if (cidNull) 0L
          else if (cidLong) c.getLong(0) else c.getInt(0).toLong
        // cos: NULL unless every operand is non-null and denom != 0
        var cosNull = true
        var cos = 0.0
        if (embArr != null && !c.isNullAt(1) && !c.isNullAt(2)) {
          val denom = norm * c.getDouble(2)
          if (denom != 0.0) {
            cosNull = false
            cos = roundSpark(
              dotMixed(embArr, eFloat, c.getArray(1), cFloat) / denom)
          }
        }
        // lexicographic (cos, -cid) max with NULLS-FIRST field semantics
        val take =
          if (!found) true
          else {
            // field 1: cos (null smallest)
            val c1 =
              if (cosNull && bestCosNull) 0
              else if (cosNull) -1
              else if (bestCosNull) 1
              else cmpD(cos, bestCos)
            if (c1 != 0) c1 > 0
            else {
              // field 2: -cid (null smallest; smaller cid wins)
              if (cidNull && bestCidNull) false
              else if (cidNull) false
              else if (bestCidNull) true
              else -cid > -bestCid
            }
          }
        if (take) {
          found = true
          bestCosNull = cosNull; bestCos = cos
          bestCidNull = cidNull; bestCid = cid
        }
      }
      j += 1
    }
    if (!found) return null
    val row = new org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow(2)
    if (bestCidNull) row.setNullAt(0)
    else if (cidLong) row.update(0, bestCid)
    else row.update(0, bestCid.toInt)
    if (bestCosNull) row.setNullAt(1) else row.update(1, bestCos)
    row
  }

  override def eval(input: InternalRow): Any = {
    val e = left.eval(input)
    val c = right.eval(input)
    compute(e.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val ref = ctx.addReferenceObj("ivfArgmax", this,
      classOf[IvfArgmaxExpr].getName)
    ev.copy(
      code = code"""
        ${l.code}
        ${r.code}
        InternalRow ${ev.value} = $ref.compute(
          ${l.isNull} ? null : ${l.value},
          ${r.isNull} ? null : ${r.value});
        boolean ${ev.isNull} = (${ev.value} == null);
      """)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): IvfArgmaxExpr =
    copy(left = newLeft, right = newRight)
}
