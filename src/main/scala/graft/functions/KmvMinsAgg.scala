package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded KMV state: the k smallest DISTINCT long values seen so far,
  * kept sorted ascending in a primitive array (binary-search insert, no
  * boxing). Mergeable: the k smallest distinct values of a union are
  * reachable from each side's k smallest distinct values, so map-side
  * partials are exact — the defining property that makes KMV a 100 TB
  * sketch (O(k) state per group per partition enters the shuffle, never
  * the distinct value set itself).
  */
final class KmvBuffer(val k: Int) {
  val mins: Array[Long] = new Array[Long](k)
  var size: Int = 0

  def insert(v: Long): Unit = {
    val pos = java.util.Arrays.binarySearch(mins, 0, size, v)
    if (pos >= 0) return // duplicate — a set, not a heap of rows
    val ins = -pos - 1
    if (size < k) {
      System.arraycopy(mins, ins, mins, ins + 1, size - ins)
      mins(ins) = v
      size += 1
    } else if (ins < k) { // v beats the current k-th smallest
      System.arraycopy(mins, ins, mins, ins + 1, k - ins - 1)
      mins(ins) = v
    }
  }
}

/** The k minimum DISTINCT values of a long child as ONE typed aggregate —
  * the bounded-state form of `distinct → rank ≤ k` (which shuffles the
  * whole distinct set and windows it; this shuffles ≤ k longs per group
  * per partition). NULL children contribute nothing (the COUNT(DISTINCT)
  * contract — pinned, not inherited: the windowed form ranked a NULL hash
  * nulls-FIRST on Spark and nulls-LAST on DuckDB, a latent cross-engine
  * divergence).
  *
  * Exactness (property-gated in `SketchesSpec` against the windowed
  * form): if fewer than k distinct values exist, the buffer holds ALL of
  * them (size < k ⟺ no partition ever truncated, since truncation
  * requires ≥ k distinct on that partition alone); if ≥ k exist, element
  * k is the exact k-th smallest distinct value — values below the global
  * k-th are below every partition's k-th, so no merge can lose one.
  *
  * Returns the ascending array (size ≤ k); callers derive the estimate
  * `(k-1)·2^32 / kth` or the exact count from it.
  */
case class KmvMinsAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate
      .TypedImperativeAggregate[KmvBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_mins"

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint/int child, got ${dt.catalogString}")
  }

  @transient private lazy val isInt = child.dataType == IntegerType

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null)
      buf.insert(if (isInt) v.asInstanceOf[Int].toLong
      else v.asInstanceOf[Long])
    buf
  }

  override def merge(a: KmvBuffer, b: KmvBuffer): KmvBuffer = {
    var i = 0
    while (i < b.size) { a.insert(b.mins(i)); i += 1 }
    a
  }

  override def eval(buf: KmvBuffer): Any =
    new GenericArrayData(
      java.util.Arrays.copyOfRange(buf.mins, 0, buf.size))

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) { out.writeLong(buf.mins(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new KmvBuffer(k)
    val n = in.readInt()
    var i = 0
    // serialized form is already sorted distinct ascending — append direct
    while (i < n) { buf.mins(i) = in.readLong(); i += 1 }
    buf.size = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMinsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMinsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvMinsAgg =
    copy(child = newChildren.head)
}
