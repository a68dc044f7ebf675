package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** The k-probe bloom membership test as ONE loop over a referenced
  * `long[]` bitmap — `graft.operators.Bloom`'s probe primitive.
  *
  * The composed column form (`Bloom.mightContain`: k conjunctions of
  * `element_at(litLong arrayLiteral, …) & shiftleft(…) != 0`) inflates the
  * filter predicate to ~40+ non-trivial codegen'd expressions over a
  * 100k-element array literal — past the JIT method-size cliff (the q41
  * postmortem), so the whole filter stage ran interpreted: measured 7.7 s
  * to probe 6 M rows at sf1, 4.6× the cost of the plain semi-join it was
  * supposed to accelerate. This expression takes the staged (h1, h2)
  * double-hash pair and runs `numHashes` position tests in one tight
  * static call: the generated method stays tiny regardless of k, the
  * bitmap is a plain JVM array reference (no per-probe `element_at`
  * dispatch over a literal), and probes short-circuit on the first unset
  * bit.
  *
  * Position family is EXACTLY the build side's
  * (`Bloom.positions`): pos_i = floorMod(h1 + i·h2, m) with
  * m = 64·bitmap.length; h1/h2 are pre-reduced below m (low-bit mask,
  * h2 odd) by the caller, so h1 + i·h2 stays far below Long.MaxValue
  * (ANSI: overflow throws). Property-tested equal to the composed form in `BloomSpec`.
  */
case class BloomTestExpr(left: Expression, right: Expression,
    bitmap: Array[Long], numHashes: Int) extends BinaryExpression {

  require(bitmap.nonEmpty && (bitmap.length & (bitmap.length - 1)) == 0,
    "bloom_test bitmap length must be a power of two")
  require(numHashes >= 1, "bloom_test needs at least one hash")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_test"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint), got " +
          s"${l.catalogString}, ${r.catalogString}")
    }

  private def m: Long = bitmap.length.toLong * 64L

  override def nullSafeEval(a: Any, b: Any): Any =
    BloomTestExpr.test(bitmap, m, numHashes,
      a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBits", bitmap, "long[]")
    nullSafeCodeGen(ctx, ev, (h1, h2) =>
      s"${ev.value} = graft.functions.BloomTestExpr.test(" +
        s"$ref, ${m}L, $numHashes, $h1, $h2);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomTestExpr =
    copy(left = newLeft, right = newRight)
}

object BloomTestExpr {
  /** Shared by interpreted eval and the generated code — one JIT-compiled
    * method, short-circuiting on the first unset bit.
    */
  def test(bits: Array[Long], m: Long, k: Int, h1: Long, h2: Long): Boolean = {
    var i = 0
    while (i < k) {
      val pos = java.lang.Math.floorMod(h1 + i.toLong * h2, m)
      if ((bits((pos >>> 6).toInt) & (1L << (pos & 63L).toInt)) == 0L)
        return false
      i += 1
    }
    true
  }
}
