package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Hashed character shingles as ONE codegen'd loop: text → the array of
  * window hashes, optionally first-occurrence-deduped — the fused form of
  *
  *   `array_distinct(transform(char_shingles(t, L, S), s -> hash(s)))`
  *
  * where `hash` is either `xxhash64` (engine-internal keys) or the
  * portable md5 fold ([[Md5FoldExpr]], oracle-replayable keys).
  *
  * Why fused (the CLAUDE.md sanctioned cases — this hits two at once):
  * `transform` is a higher-order function, which evaluates INTERPRETED
  * (HigherOrderFunction is CodegenFallback) — per element it re-enters
  * the expression interpreter, binds a lambda variable, and allocates a
  * UTF8String window wrapper; `array_distinct` then walks the result
  * with per-element type dispatch. On the shingle family's hot paths
  * (q34/q115/q36/q102/q118/q79/q130/q132: ~200 windows per document,
  * millions of documents) that interpreter dispatch dominates the
  * actual hashing work. This expression walks the string's codepoint
  * byte-offsets once (identically to [[CharShinglesExpr]]) and hashes
  * each window STRAIGHT OFF the parent byte array — zero per-window
  * allocations, no interpreter, and the enclosing projection stays
  * inside WholeStageCodegen.
  *
  * Contracts mirrored exactly from the composed chain (property-gated in
  * `ShingleHashesSpec` against the literal composed form):
  *  - NULL text: `char_shingles` yields `[NULL]`; `xxhash64(NULL)` is the
  *    seed (42), the md5 fold is NULL — so the output is `[42L]` /
  *    `[NULL]` respectively, never a NULL array.
  *  - empty text: one window hashing the empty byte string.
  *  - `distinct = true` keeps FIRST occurrences in window order, exactly
  *    like `array_distinct` over the hash array.
  */
case class ShingleHashesExpr(child: Expression, shingleLen: Int, stride: Int,
    portable: Boolean, distinct: Boolean) extends UnaryExpression {

  require(shingleLen > 0 && stride > 0,
    s"shingle_hashes needs positive len/stride, got ($shingleLen, $stride)")

  // a NULL element can only arise from NULL text in portable mode
  override def dataType: DataType =
    ArrayType(LongType, containsNull = portable)
  override def nullable: Boolean = false
  override def prettyName: String = "shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${dt.catalogString}")
  }

  /** xxhash64's fixed seed (`XxHash64` default) — a NULL input leaves the
    * hash at the seed, matching `xxhash64(NULL) = 42`.
    */
  private val XxSeed = 42L

  def compute(t: UTF8String): ArrayData = {
    if (t == null) {
      return if (portable) new GenericArrayData(Array[Any](null))
      else UnsafeArrayData.fromPrimitiveArray(Array(XxSeed))
    }
    val bytes = t.getBytes
    val nBytes = bytes.length
    // codepoint -> starting byte offset (one extra slot for the end) —
    // identical walk to CharShinglesExpr so window boundaries match
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

    val lastStart = math.max(nChars - shingleLen, 0)
    val count = lastStart / stride + 1
    val out = new Array[Long](count)
    // open-addressing long set for the first-occurrence dedup (distinct
    // mode): power-of-two capacity >= 2*count, linear probing; slot 0 is
    // ambiguous for the value 0, tracked by a flag
    var table: Array[Long] = null
    var usedBits: Array[Long] = null
    var mask = 0
    if (distinct) {
      var cap = 4
      while (cap < count * 2) cap <<= 1
      table = new Array[Long](cap)
      usedBits = new Array[Long]((cap + 63) >> 6)
      mask = cap - 1
    }
    @inline def tryAdd(h: Long): Boolean = {
      // finalizer-style mix so clustered hash values probe evenly
      var idx = (java.lang.Long.hashCode(h * 0x9E3779B97F4A7C15L)) & mask
      while (true) {
        val w = idx >> 6
        val bit = 1L << (idx & 63)
        if ((usedBits(w) & bit) == 0L) {
          usedBits(w) |= bit
          table(idx) = h
          return true
        }
        if (table(idx) == h) return false
        idx = (idx + 1) & mask
      }
      false // unreachable
    }
    var m = 0
    var start = 0
    while (start <= lastStart) {
      val end = math.min(start + shingleLen, nChars)
      val off = offsets(start)
      val len = offsets(end) - off
      val h =
        if (portable) Md5FoldExpr.hashRange(bytes, off, len)
        else XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + off,
          len, XxSeed)
      if (!distinct || tryAdd(h)) { out(m) = h; m += 1 }
      start += stride
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (m == count) out else java.util.Arrays.copyOf(out, m))
  }

  override def eval(input: InternalRow): Any =
    compute(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("shingleHashes", this,
      classOf[ShingleHashesExpr].getName)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $ref.compute(${c.isNull} ? null : ${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): ShingleHashesExpr = copy(child = newChild)
}
