package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Space-joined word n-grams as ONE codegen'd loop — the fused form of
  * [[graft.operators.TextAnalysis.ngrams]]'s declarative chain
  *
  *   `when(tk IS NULL, NULL)
  *    .when(size(tk) >= n, transform(sequence(0, size(tk)-n),
  *        i -> concat(tk[i], ' ', ..., tk[i+n-1])))
  *    .otherwise(array())`
  *
  * `transform` is a HigherOrderFunction and evaluates INTERPRETED: per
  * gram it re-enters the expression interpreter, evaluates n `get()`s
  * and a varargs `concat`, and `sequence` materializes an index array
  * per row first. The n-gram unit sits under corpus-wide explodes
  * (q86/q90 trigram counts, q143's 8-gram decontamination probe, q136's
  * DSIR bigrams, q81's repetition bigrams), so the interpreter dispatch
  * is paid tokens-per-doc × corpus times. This loop reads each token
  * once and assembles each gram's bytes directly — one allocation per
  * output gram (the result string itself), nothing else.
  *
  * Contracts mirrored exactly (property-gated in `NgramsSpec`):
  * NULL array → NULL; fewer than n tokens → EMPTY array; a NULL token
  * nulls every gram containing it (concat's null propagation); n = 1
  * copies the tokens.
  */
case class NgramsExpr(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"ngrams: n must be >= 1, got $n")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "ngrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.catalogString}")
  }

  def compute(arr: ArrayData): ArrayData = {
    if (arr == null) return null
    val sz = arr.numElements()
    if (sz < n) return new GenericArrayData(Array.empty[AnyRef])
    val toks = new Array[UTF8String](sz)
    var i = 0
    while (i < sz) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val out = new Array[AnyRef](sz - n + 1)
    var g = 0
    while (g <= sz - n) {
      var nullGram = false
      var total = n - 1 // separators
      var j = 0
      while (j < n && !nullGram) {
        val t = toks(g + j)
        if (t == null) nullGram = true else total += t.numBytes()
        j += 1
      }
      if (!nullGram) {
        val bytes = new Array[Byte](total)
        var off = Platform.BYTE_ARRAY_OFFSET.toLong
        var j2 = 0
        while (j2 < n) {
          if (j2 > 0) {
            bytes((off - Platform.BYTE_ARRAY_OFFSET).toInt) = ' '
            off += 1
          }
          val t = toks(g + j2)
          t.writeToMemory(bytes, off)
          off += t.numBytes()
          j2 += 1
        }
        out(g) = UTF8String.fromBytes(bytes)
      }
      g += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngrams", this,
      classOf[NgramsExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): NgramsExpr = copy(child = newChild)
}
