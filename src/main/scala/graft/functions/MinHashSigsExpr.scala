package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All k MinHash signature components in ONE loop over a document's
  * shingle-hash array — the projection form of the explode →
  * groupBy(doc_id).agg(min × k) aggregate (the composed form shuffles
  * ~shingles-per-doc rows per document with k partial mins; this runs
  * per row, costs zero exchanges, and the shingle relation never
  * explodes for signature building at all).
  *
  * Bit-identical to the aggregate form: component i is
  * min over shingle hashes h of ((h mod P)·a_i + b_i) mod P, with
  * (a_i, b_i) from [[graft.operators.Dedup.hashParams]] and
  * P = 2^31 − 1 — the same affine family the q36/q102 SQL oracles
  * replay. min is duplicate-insensitive, so the distinct step the
  * verify-side shingle relation needs stays out of this path. All
  * arithmetic is plain JVM long math: operands are pre-reduced below P,
  * so products stay under 2^62 (no ANSI overflow surface).
  *
  * NULL contract: a NULL array, empty array, or all-NULL elements yield
  * NULL (the aggregate form emits NO row for a shingle-less doc — the
  * caller filters NULL signatures to match). NULL elements are skipped,
  * as an aggregate min skips NULL inputs.
  *
  * One of the three sanctioned custom-expression cases (CLAUDE.md): a
  * many-expression hot-path computation fused under the JIT
  * method-size cliff, property-gated against the composed aggregate
  * form in `DedupSpec`.
  */
case class MinHashSigsExpr(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1 && k <= 1024, s"minhash_sigs: need 1 <= k <= 1024, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sigs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${dt.catalogString}")
  }

  private val P = graft.operators.Dedup.P

  @transient private lazy val (as: Array[Long], bs: Array[Long]) = {
    val ps = graft.operators.Dedup.hashParams(k)
    (ps.map(_._1).toArray, ps.map(_._2).toArray)
  }

  /** Null for a null/empty/all-null-element array (the aggregate form's
    * absent row); otherwise the k-long signature array.
    */
  def compute(arr: ArrayData): ArrayData = {
    if (arr == null) return null
    val n = arr.numElements()
    val sigs = new Array[Long](k)
    java.util.Arrays.fill(sigs, Long.MaxValue)
    var any = false
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        any = true
        val h = arr.getLong(j)
        val x = ((h % P) + P) % P
        var i = 0
        while (i < k) {
          val v = (x * as(i) + bs(i)) % P
          if (v < sigs(i)) sigs(i) = v
          i += 1
        }
      }
      j += 1
    }
    if (!any) null else new GenericArrayData(sigs)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("minhashSigs", this,
      classOf[MinHashSigsExpr].getName)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $ref.compute(${c.isNull} ? null : ${c.value});
        boolean ${ev.isNull} = (${ev.value} == null);
      """)
  }

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSigsExpr = copy(child = newChild)
}
