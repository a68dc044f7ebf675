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
  * `constCents = true` is the CALLER's guarantee that the centroid
  * column is ROW-CONSTANT within the plan (the [[graft.operators
  * .Similarity.ivfAssign]] shape: a one-row `collect_list` aggregate,
  * broadcast-cross-joined, so every row reads the same broadcast
  * bytes). Under that contract the expression decodes the packed
  * structs to primitive arrays ONCE per JVM (k·d work) instead of once
  * per probe (n·k·d struct/array decoding — the dominant cost of every
  * assignment at corpus scale), and runs a two-pass argmax: pass 1
  * tracks the RAW cosine max (rounding to `roundDp` is monotone —
  * shortest-decimal conversion preserves double order and HALF_UP
  * setScale preserves decimal order — so round(max) == max(round));
  * pass 2 rounds only the candidates within 2·10^-dp of the raw max
  * (a rounded tie forces |cos − max| < 10^-dp + 2 ulp), taking the
  * smallest id among exact rounded ties. BigDecimal rounding then runs
  * O(ties) per row, not k — the interpreted-round storm was ~30% of an
  * n·k probe pass. Results are bit-identical to the general path (both
  * are property-gated against the composed oracle; a defensive length
  * check falls back to the general path if a row's centroid array ever
  * disagrees with the memo).
  *
  * Output: struct<centroid_id (the packed id type), cos double>.
  */
case class IvfArgmaxExpr(left: Expression, right: Expression, roundDp: Int,
    constCents: Boolean = false)
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

  // ------------------------------------------------------------------
  // constCents fast path: centroid structs decoded to primitive arrays
  // once per JVM, raw-max two-pass argmax per row.
  // ------------------------------------------------------------------

  /** Immutable primitive-array image of one packed centroid array.
    * `cvElemNull(j)` is null when cv j has no NULL elements (the tight
    * no-branch dot loop); null cv elements hold 0.0 in `cv(j)` and are
    * skipped through the mask in the branchy loop.
    */
  private final class DecodedCents(
      val k: Int,
      val structNull: Array[Boolean],
      val cidNull: Array[Boolean],
      val cid: Array[Long],
      val cvNull: Array[Boolean],
      val cnormNull: Array[Boolean],
      val cnorm: Array[Double],
      val cv: Array[Array[Double]],
      val cvElemNull: Array[Array[Boolean]])

  @transient private lazy val memo =
    new java.util.concurrent.atomic.AtomicReference[DecodedCents]()

  // per-thread raw-cosine scratch (k doubles + k state bytes), grown on
  // demand — per-row allocation of a k-sized buffer would be GC churn
  // at corpus scale
  @transient private lazy val scratch =
    new ThreadLocal[(Array[Double], Array[Byte])] {
      override def initialValue(): (Array[Double], Array[Byte]) =
        (Array.emptyDoubleArray, Array.emptyByteArray)
    }

  private def decodeCents(cents: ArrayData): DecodedCents = {
    val k = cents.numElements()
    val cFloat = cvElemIsFloat
    val cidLong = cidType == LongType
    val structNull = new Array[Boolean](k)
    val cidNull = new Array[Boolean](k)
    val cid = new Array[Long](k)
    val cvNull = new Array[Boolean](k)
    val cnormNull = new Array[Boolean](k)
    val cnorm = new Array[Double](k)
    val cv = new Array[Array[Double]](k)
    val cvElemNull = new Array[Array[Boolean]](k)
    var j = 0
    while (j < k) {
      if (cents.isNullAt(j)) structNull(j) = true
      else {
        val c = cents.getStruct(j, 3)
        cidNull(j) = c.isNullAt(0)
        if (!cidNull(j))
          cid(j) = if (cidLong) c.getLong(0) else c.getInt(0).toLong
        cvNull(j) = c.isNullAt(1)
        if (!cvNull(j)) {
          val arr = c.getArray(1)
          val d = arr.numElements()
          val vals = new Array[Double](d)
          var mask: Array[Boolean] = null
          var i = 0
          while (i < d) {
            if (arr.isNullAt(i)) {
              if (mask == null) mask = new Array[Boolean](d)
              mask(i) = true
            } else {
              vals(i) =
                if (cFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
            }
            i += 1
          }
          cv(j) = vals
          cvElemNull(j) = mask
        }
        cnormNull(j) = c.isNullAt(2)
        if (!cnormNull(j)) cnorm(j) = c.getDouble(2)
      }
      j += 1
    }
    new DecodedCents(k, structNull, cidNull, cid, cvNull, cnormNull,
      cnorm, cv, cvElemNull)
  }

  /** min-prefix dot over decoded primitives; a null mask (either side)
    * routes to the branchy loop, the common all-non-null case runs the
    * tight auto-vectorizable loop.
    */
  private def dotDecoded(a: Array[Double], aMask: Array[Boolean],
      b: Array[Double], bMask: Array[Boolean]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0
    var i = 0
    if (aMask == null && bMask == null) {
      while (i < n) { s += a(i) * b(i); i += 1 }
    } else {
      while (i < n) {
        if ((aMask == null || !aMask(i)) && (bMask == null || !bMask(i)))
          s += a(i) * b(i)
        i += 1
      }
    }
    s
  }

  private def computeFast(embArr: ArrayData, dc: DecodedCents): InternalRow = {
    val k = dc.k
    // decode the row's embedding once (d work), not once per centroid
    var eVal: Array[Double] = null
    var eMask: Array[Boolean] = null
    var norm = 0.0
    if (embArr != null) {
      val eFloat = embElemIsFloat
      val d = embArr.numElements()
      eVal = new Array[Double](d)
      var i = 0
      while (i < d) {
        if (embArr.isNullAt(i)) {
          if (eMask == null) eMask = new Array[Boolean](d)
          eMask(i) = true
        } else {
          eVal(i) =
            if (eFloat) embArr.getFloat(i).toDouble else embArr.getDouble(i)
        }
        i += 1
      }
      norm = math.sqrt(dotDecoded(eVal, eMask, eVal, eMask))
    }
    var (raw, state) = scratch.get()
    if (raw.length < k) {
      raw = new Array[Double](k)
      state = new Array[Byte](k)
      scratch.set((raw, state))
    }
    // pass 1: raw cosines; track the raw max under SQL double order
    // (NaN greatest). state: 0 = struct null (skip), 1 = cos NULL,
    // 2 = cos value in raw(j).
    var anyStruct = false
    var hasCos = false
    var rawMax = 0.0
    var j = 0
    while (j < k) {
      if (dc.structNull(j)) state(j) = 0
      else {
        anyStruct = true
        var st: Byte = 1
        if (eVal != null && !dc.cvNull(j) && !dc.cnormNull(j)) {
          val denom = norm * dc.cnorm(j)
          if (denom != 0.0) {
            val c = dotDecoded(eVal, eMask, dc.cv(j), dc.cvElemNull(j)) / denom
            raw(j) = c
            st = 2
            if (!hasCos || cmpD(c, rawMax) > 0) { hasCos = true; rawMax = c }
          }
        }
        state(j) = st
      }
      j += 1
    }
    if (!anyStruct) return null
    // pass 2: exact rounding only near the raw max. A rounded tie with
    // the max needs |cos − max| < 10^-dp + 2 ulp (HALF_UP bracket width
    // plus shortest-decimal slop) — 2·10^-dp over-covers it.
    var bestCosNull = true
    var bestCos = 0.0
    var bestCidNull = true
    var bestCid = 0L
    var found = false
    if (hasCos) {
      val target = roundSpark(rawMax)
      val floorBound =
        if (java.lang.Double.isNaN(rawMax)) 0.0
        else rawMax - 2.0 * math.pow(10.0, -roundDp)
      val maxIsNaN = java.lang.Double.isNaN(rawMax)
      j = 0
      while (j < k) {
        if (state(j) == 2) {
          val c = raw(j)
          val candidate =
            if (maxIsNaN) java.lang.Double.isNaN(c) else c >= floorBound
          if (candidate && cmpD(roundSpark(c), target) == 0) {
            // rounded tie: smallest non-null id wins (-cid NULLS-FIRST)
            if (!found) {
              found = true
              bestCosNull = false; bestCos = target
              bestCidNull = dc.cidNull(j); bestCid = dc.cid(j)
            } else if (!dc.cidNull(j) &&
                (bestCidNull || dc.cid(j) < bestCid)) {
              bestCidNull = false; bestCid = dc.cid(j)
            }
          }
        }
        j += 1
      }
    } else {
      // every participating cos is NULL: ties on the null cos field,
      // smallest non-null id wins
      j = 0
      while (j < k) {
        if (state(j) != 0) {
          if (!found) {
            found = true
            bestCidNull = dc.cidNull(j); bestCid = dc.cid(j)
          } else if (!dc.cidNull(j) && (bestCidNull || dc.cid(j) < bestCid)) {
            bestCidNull = false; bestCid = dc.cid(j)
          }
        }
        j += 1
      }
    }
    if (!found) return null
    emit(bestCidNull, bestCid, bestCosNull, bestCos)
  }

  private def emit(bestCidNull: Boolean, bestCid: Long,
      bestCosNull: Boolean, bestCos: Double): InternalRow = {
    val row = new org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow(2)
    if (bestCidNull) row.setNullAt(0)
    else if (cidType == LongType) row.update(0, bestCid)
    else row.update(0, bestCid.toInt)
    if (bestCosNull) row.setNullAt(1) else row.update(1, bestCos)
    row
  }

  /** Null for a null/empty centroid array; otherwise a 2-field row
    * (centroid_id — null only if the winning packed id was null —, cos).
    */
  def compute(embArr: ArrayData, cents: ArrayData): InternalRow = {
    if (cents == null) return null
    val k = cents.numElements()
    if (k == 0) return null
    if (constCents) {
      var dc = memo.get()
      if (dc == null) {
        dc = decodeCents(cents)
        memo.compareAndSet(null, dc)
        dc = memo.get()
      }
      // defensive: the caller's row-constant contract implies a stable
      // k; a mismatch falls back to the general per-row path
      if (dc.k == k) return computeFast(embArr, dc)
    }
    computeGeneral(embArr, cents, k)
  }

  private def computeGeneral(embArr: ArrayData, cents: ArrayData,
      k: Int): InternalRow = {
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
    emit(bestCidNull, bestCid, bestCosNull, bestCos)
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
