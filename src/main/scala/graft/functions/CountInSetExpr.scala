package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Occurrence count of a fixed small lexicon inside an `array<string>` —
  * the stopword-hit primitive behind language-ID and quality scoring
  * (reference behavior: notebook text-quality heuristics over document
  * text).
  *
  * Semantically identical to the declarative form
  * `size(filter(toks, t -> array_contains(lex, t))).cast("long")`,
  * including the pinned null contracts: a NULL array yields NULL, NULL
  * elements never match (array_contains returns NULL for them, and the
  * filter HOF keeps only TRUE). The composed form runs the lambda
  * interpreter per element and materializes the filtered array just to
  * take its size; language-ID evaluates four of these per document, which
  * made the interpreted dispatch the dominant cost of the corpus-pipeline
  * queries at sf1. This expression is one codegen'd loop over the array
  * bytes with a HashSet probe per element — no per-element interpreter
  * re-entry, no intermediate array, and the enclosing projection stays
  * inside WholeStageCodegen.
  *
  * Property-tested against the composed form in `CountInSetSpec`.
  */
case class CountInSetExpr(child: Expression, lexicon: Seq[String])
    extends UnaryExpression {

  require(lexicon.nonEmpty, "count_in_set needs a non-empty lexicon")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "count_in_set"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.catalogString}")
  }

  // one immutable probe set per expression instance, shared by eval and
  // (via addReferenceObj) the generated code
  @transient private lazy val lexSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](lexicon.size * 2)
    lexicon.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  def compute(arr: ArrayData): Long = {
    var n = 0L
    var i = 0
    val len = arr.numElements()
    while (i < len) {
      if (!arr.isNullAt(i) && lexSet.contains(arr.getUTF8String(i))) n += 1L
      i += 1
    }
    n
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("lexSet", lexSet,
      classOf[java.util.HashSet[UTF8String]].getName)
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val len = ctx.freshName("len")
      s"""
         |long $n = 0L;
         |int $len = $arr.numElements();
         |for (int $i = 0; $i < $len; $i++) {
         |  if (!$arr.isNullAt($i) && $setRef.contains($arr.getUTF8String($i))) {
         |    $n++;
         |  }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): CountInSetExpr = copy(child = newChild)
}
