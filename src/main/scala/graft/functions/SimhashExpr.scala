package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The full SimHash signature (tokenize → saturated per-token tf →
  * portable 60-bit token hash → per-bit weighted vote → bit pack) as ONE
  * projection expression — the zero-exchange form of
  * [[graft.operators.Dedup.simhashComposed]]:
  *
  *   explode(split(lower(trim(text)), "\\s+", -1))
  *     → groupBy(doc_id, token).agg(least(count(*), cap) AS w)
  *     → h = md5-fold-60(token)
  *     → groupBy(doc_id).agg(60 × sum(bit(h,b) ? w : -w))
  *     → OR over (sum > 0 ? 1<<b : 0)
  *
  * The composed pipeline pays a corpus×tokens explode and TWO exchanges
  * (the (doc_id, token) tf aggregate, then the per-doc 60-column vote
  * aggregate) to compute what is a PER-DOCUMENT reduction: every vote
  * depends only on the document's own token multiset — the same
  * observation that made MinHash signatures a projection
  * ([[MinHashSigsExpr]]). This loop tokenizes once, counts distinct
  * tokens in a local map, and accumulates the 60 vote sums in plain
  * long arithmetic (integer adds commute — partition order can never
  * change a result).
  *
  * Exact-parity notes (property-gated in `SimhashExprSpec` against the
  * composed form, and the q37 oracle replays the identical pipeline):
  *  - trim/lower run through the SAME UTF8String methods Spark's
  *    trim()/lower() call, then the split uses the identical
  *    Pattern.compile("\\s+").split(s, -1) (one compiled pattern per
  *    expression instead of per row).
  *  - token hash = [[Md5FoldExpr]] over the token's UTF-8 bytes,
  *    byte-identical to portableHash64(token).
  *  - NULL text → NULL (the composed form's explode of a NULL token
  *    array emits no rows, so the document is ABSENT — the caller
  *    filters NULL signatures to match). Empty text splits to [""] and
  *    votes like any single token, exactly as the composed form.
  */
case class SimhashExpr(child: Expression, bits: Int, cap: Int)
    extends UnaryExpression {

  require(bits >= 1 && bits <= 63, s"simhash: need 1 <= bits <= 63, got $bits")
  require(cap >= 1, s"simhash: need cap >= 1, got $cap")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash60"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${dt.catalogString}")
  }

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  def compute(t: UTF8String): Any = {
    if (t == null) return null
    // trim().toLowerCase() are the exact UTF8String methods Spark's
    // trim()/lower() evaluate; Pattern.split on the resulting String is
    // what UTF8String.split delegates to (with the pattern cached here)
    val toks = ws.split(t.trim().toLowerCase().toString, -1)
    val counts = new java.util.HashMap[String, Integer](
      math.min(toks.length * 2, 1 << 16))
    var i = 0
    while (i < toks.length) {
      counts.merge(toks(i), 1, (a: Integer, b: Integer) =>
        if (a >= cap) a else Integer.valueOf(a + b))
      i += 1
    }
    val votes = new Array[Long](bits)
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val w = math.min(e.getValue.intValue(), cap).toLong
      val h = Md5FoldExpr.hash(
        e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var b = 0
      while (b < bits) {
        votes(b) += (if (((h >>> b) & 1L) == 1L) w else -w)
        b += 1
      }
    }
    var sim = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0L) sim |= 1L << b
      b += 1
    }
    sim
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this,
      classOf[SimhashExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      Object r = $ref.compute($c);
      if (r == null) { ${ev.isNull} = true; } else {
        ${ev.value} = ((Long) r).longValue();
      }""")
  }

  override protected def withNewChildInternal(
      newChild: Expression): SimhashExpr = copy(child = newChild)
}
