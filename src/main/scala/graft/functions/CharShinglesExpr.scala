package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character shingles as one tight loop: fixed-length codepoint windows at a
  * fixed stride, the n-gram unit for the Jaccard/MinHash/SimHash dedup family
  * (reference behavior: near-dup detection over document text;
  * dags/olddag notebooks' dedup stage).
  *
  * Semantically identical to the declarative form
  * `transform(sequence(1, greatest(length(t)-(L-1), 1), S), i -> substr(t, i, L))`
  * — including the pinned edge contracts: NULL text keeps ONE `[NULL]`
  * shingle (greatest skips the NULL length), and empty text yields `[""]`.
  * The composed form never enters whole-stage codegen: `Sequence` and
  * `ArrayTransform` evaluate interpreted, materialize an index array per
  * row, and re-enter the expression interpreter per element — at sf1 the
  * shingle *construction* alone was ~90% of the fingerprint query's wall
  * time. This expression walks the string's codepoint byte-offsets once and
  * slices windows directly off the byte array: O(bytes + windows) per
  * document, no per-element interpreter dispatch, and the enclosing
  * projection stays inside WholeStageCodegen.
  *
  * The output is exactly what `UTF8String.substringSQL` would produce per
  * window (codepoint-addressed, end-clamped), so swapping this in under an
  * existing `array_distinct`/`md5`/hash pipeline cannot change results —
  * property-tested against the composed form in `CharShinglesSpec`.
  */
case class CharShinglesExpr(child: Expression, shingleLen: Int, stride: Int)
    extends UnaryExpression {

  require(shingleLen > 0 && stride > 0,
    s"char_shingles needs positive len/stride, got ($shingleLen, $stride)")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  // the ARRAY is never null — a NULL document still yields [NULL]
  override def nullable: Boolean = false
  override def prettyName: String = "char_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${dt.catalogString}")
  }

  def compute(t: UTF8String): ArrayData = {
    if (t == null) return new GenericArrayData(Array[Any](null))
    val bytes = t.getBytes
    val nBytes = bytes.length
    // codepoint -> starting byte offset (one extra slot for the end)
    var nChars = 0
    var i = 0
    while (i < nBytes) {
      i += UTF8String.numBytesForFirstByte(bytes(i))
      nChars += 1
    }
    val offsets = new Array[Int](nChars + 1)
    i = 0
    var c = 0
    while (i < nBytes) {
      offsets(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    offsets(nChars) = nBytes

    // window starts: codepoints 0, stride, 2*stride, ... <= max(n-L, 0);
    // same index set as sequence(1, greatest(n-(L-1), 1), stride) 1-based
    val lastStart = math.max(nChars - shingleLen, 0)
    val count = lastStart / stride + 1
    val arr = new Array[AnyRef](count)
    var k = 0
    var start = 0
    while (start <= lastStart) {
      val end = math.min(start + shingleLen, nChars)
      arr(k) = UTF8String.fromBytes(bytes, offsets(start),
        offsets(end) - offsets(start))
      start += stride
      k += 1
    }
    new GenericArrayData(arr)
  }

  override def eval(input: InternalRow): Any =
    compute(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("charShingles", this,
      classOf[CharShinglesExpr].getName)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $ref.compute(${c.isNull} ? null : ${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): CharShinglesExpr =
    copy(child = newChild)
}
