package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helpers shared by [[CharBagExpr]] / [[BagL1LeExpr]] eval and
  * their generated code (a static call keeps the enclosing stage inside
  * WholeStageCodegen without inlining the lane loop into the generated
  * method — the JIT method-size-cliff rule).
  */
object BagOps {
  /** Lane of a code point: lowercase letters 0–25 (case-folded), space
    * 26, digits 27, everything else 28.
    */
  private def lane(cp: Int): Int =
    if (cp >= 'a' && cp <= 'z') cp - 'a'
    else if (cp >= 'A' && cp <= 'Z') cp - 'A'
    else if (cp == ' ') 26
    else if (cp >= '0' && cp <= '9') 27
    else 28

  /** One 64-bit half (16 saturating 4-bit lanes) of the 29-lane char
    * bag of `s`; `half` = 0 for lanes 0–15, 1 for lanes 16–28.
    */
  def bagHalf(s: UTF8String, half: Int): Long = {
    val str = s.toString
    var bag = 0L
    val base = half * 16
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val ln = lane(cp)
      if (ln >= base && ln < base + 16) {
        val sh = (ln - base) * 4
        if (((bag >>> sh) & 15L) != 15L) bag += (1L << sh)
      }
      i += Character.charCount(cp)
    }
    bag
  }

  /** L1 distance of two packed 16×4-bit lane vectors. */
  def l1(a: Long, b: Long): Int = {
    var s = 0
    var x = a
    var y = b
    var i = 0
    while (i < 16) {
      val d = ((x & 15L) - (y & 15L)).toInt
      s += (if (d < 0) -d else d)
      x >>>= 4
      y >>>= 4
      i += 1
    }
    s
  }
}

/** One packed 64-bit half of a string's 29-lane saturating character
  * histogram ("char bag"): lanes are case-folded letters, space, digit,
  * other; counts saturate at 15. Computed ONCE per row and carried
  * through the PassJoin explodes so the per-candidate [[BagL1LeExpr]]
  * test never re-scans the string.
  *
  * The bag backs an EXACT necessary condition on edit distance (the
  * classical bag-distance bound, Bayardo et al. line of filters): one
  * edit changes at most one code point, so it moves at most one unit of
  * count out of one lane and at most one unit into another —
  * Σ|bagA − bagB| ≤ 2·lev(a, b). Saturation and lane-merging (case
  * folding, the digit/other buckets) only LOWER the left side, so the
  * bound stays sound: `bagL1 ≤ 2τ` can never reject a true pair
  * (property-gated in `DedupSpec` both directly and through the
  * [[graft.operators.Dedup.fuzzyBlockPairsNaive]] end-to-end
  * equivalence). On the sf3 corpus it rejects 95% of segment-join
  * candidates at ~1/10 the cost of the banded levenshtein they'd
  * otherwise pay.
  */
case class CharBagExpr(child: Expression, half: Int)
    extends UnaryExpression {

  require(half == 0 || half == 1, s"char_bag half must be 0/1, got $half")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "char_bag"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    BagOps.bagHalf(input.asInstanceOf[UTF8String], half)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.functions.BagOps.bagHalf($s, $half)")

  override protected def withNewChildInternal(
      newChild: Expression): CharBagExpr = copy(child = newChild)
}

/** `l1(a0,b0) + l1(a1,b1) <= limit` over two [[CharBagExpr]] halves per
  * side — the pre-levenshtein candidate reject (see [[CharBagExpr]] for
  * the soundness argument; `limit` = 2·τ).
  */
case class BagL1LeExpr(a0: Expression, a1: Expression, b0: Expression,
    b1: Expression, limit: Int) extends QuaternaryExpression {

  override def first: Expression = a0
  override def second: Expression = a1
  override def third: Expression = b0
  override def fourth: Expression = b1

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "bag_l1_le"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires four longs")

  override protected def nullSafeEval(a0v: Any, a1v: Any, b0v: Any,
      b1v: Any): Any =
    BagOps.l1(a0v.asInstanceOf[Long], b0v.asInstanceOf[Long]) +
      BagOps.l1(a1v.asInstanceOf[Long], b1v.asInstanceOf[Long]) <= limit

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x0, x1, y0, y1) =>
      s"(graft.functions.BagOps.l1($x0, $y0) + " +
        s"graft.functions.BagOps.l1($x1, $y1)) <= $limit")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): BagL1LeExpr =
    copy(a0 = newFirst, a1 = newSecond, b0 = newThird, b1 = newFourth)
}
