package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** The portable 60-bit md5 fold — `conv(substr(md5(x), 1, 15), 16, 10)`
  * — as ONE codegen'd expression over the raw digest bytes.
  *
  * The composed form round-trips through a 32-char hex STRING (commons
  * `md5Hex` → UTF8String alloc → substring → base-16 parse) for every
  * row, and this hash keys the hottest relations in the repo: 12 M+
  * shingle rows per side in the MinHash/incremental-dedup family, every
  * token in SimHash, every window in repeated-passage detection. The
  * first 15 hex chars of a digest are exactly the first 60 BITS, so the
  * fold is the big-endian long of the first 8 digest bytes shifted
  * right 4 — no strings anywhere. `Md5FoldSpec` property-gates equality
  * with the composed form (the RhpSignaturesExpr rule: every fused
  * expression ships with its composed-form oracle), and the DedupSpec
  * bit-balance/correlation/skew gate runs against whatever
  * [[graft.operators.Dedup.portableHash64]] emits.
  */
case class Md5FoldExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_fold60"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary input, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    Md5FoldExpr.hash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5FoldExpr.hash($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Md5FoldExpr = copy(child = newChild)
}

object Md5FoldExpr {
  // MessageDigest is not thread-safe; one instance per executor thread
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Big-endian long of the digest's first 8 bytes, >>> 4: the integer
    * value of the first 15 hex characters (60 bits, always >= 0).
    */
  def hash(bytes: Array[Byte]): Long = hashRange(bytes, 0, bytes.length)

  /** [[hash]] over a byte RANGE — lets window-hashing loops
    * ([[ShingleHashesExpr]]) hash straight off a shared parent array with
    * zero per-window copies.
    */
  def hashRange(bytes: Array[Byte], off: Int, len: Int): Long = {
    val d = md.get()
    d.reset()
    d.update(bytes, off, len)
    val dig = d.digest()
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    v >>> 4
  }
}
