package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.math.BigInteger

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-dimension quantized-mean state for [[QuantMeanAgg]]: exact
  * integer sums of floor(clamp(x)·1e6 + 0.5) per position, held in a
  * long fast path that escalates to BigInteger before it can overflow
  * (|q| ≤ 1e15 per element, so a guard band of 2e15 below Long.Max is
  * sufficient). `present` tracks positions ANY input array covered
  * (the posexplode form emits a row for every element, null or not);
  * `counts` tracks positions with a MEASURED (non-null, finite) value.
  */
final class QuantMeanBuffer {
  var sums: Array[Long] = Array.emptyLongArray
  var bigs: Array[BigInteger] = Array.empty
  var counts: Array[Long] = Array.emptyLongArray
  var present: Array[Boolean] = Array.emptyBooleanArray

  def grow(n: Int): Unit = if (n > sums.length) {
    sums = java.util.Arrays.copyOf(sums, n)
    bigs = java.util.Arrays.copyOf(bigs, n)
    counts = java.util.Arrays.copyOf(counts, n)
    present = java.util.Arrays.copyOf(present, n)
  }

  private val guard = Long.MaxValue - 2_000_000_000_000_000L

  def add(i: Int, q: Long): Unit = {
    if (math.abs(sums(i)) > guard) flush(i)
    sums(i) += q
    counts(i) += 1
  }

  def flush(i: Int): Unit = if (sums(i) != 0L) {
    val b = BigInteger.valueOf(sums(i))
    bigs(i) = if (bigs(i) == null) b else bigs(i).add(b)
    sums(i) = 0L
  }

  def total(i: Int): BigInteger = {
    flush(i)
    if (bigs(i) == null) BigInteger.ZERO else bigs(i)
  }
}

/** Element-wise quantized mean of an embedding column, ONE typed
  * aggregate per group — the explode-free form of the engine-exact
  * centroid accumulation (`posexplode` → per-(group, pos) DECIMAL(38,0)
  * sums): bit-identical output, but the corpus rows never fan out
  * dims×, the quantization loop runs native instead of per-exploded-row
  * expression evaluation, and the shuffled state is one buffer per
  * group per partition instead of dims partial-agg rows.
  *
  * EXACT replication of the composed form (property-gated in
  * `SimilaritySpec`):
  *  - q = floor(min(max(x, −1e9), 1e9)·1e6 + 0.5) for finite non-null
  *    x; NaN/±Inf/null elements are unmeasured (excluded from sum and
  *    count) but still mark their position PRESENT, as posexplode rows
  *    do.
  *  - a position is emitted iff SOME input array covered it; its mean
  *    is CAST(sum AS DOUBLE) / (count·1e6) with Decimal→Double cast
  *    semantics (BigDecimal.doubleValue), NULL when count = 0 (the
  *    null-sum / zero-count division the composed form produced).
  *  - sums are exact integers at ANY count (long fast path escalating
  *    to BigInteger — the composed form's DECIMAL(38,0) headroom).
  *
  * Output: array<struct<pos int, centroid double>> in position order;
  * callers explode it (k·dims rows — group-sized, never corpus-sized).
  */
case class QuantMeanAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantMeanBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "quant_mean_agg"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("centroid", DoubleType, nullable = true))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double|float>, got ${dt.catalogString}")
  }

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def createAggregationBuffer(): QuantMeanBuffer =
    new QuantMeanBuffer

  override def update(buf: QuantMeanBuffer,
      input: InternalRow): QuantMeanBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      buf.grow(n)
      var i = 0
      while (i < n) {
        buf.present(i) = true
        if (!arr.isNullAt(i)) {
          val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          if (!x.isNaN && !x.isInfinite) {
            val c = math.min(math.max(x, -1e9), 1e9)
            buf.add(i, math.floor(c * 1e6 + 0.5).toLong)
          }
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: QuantMeanBuffer,
      b: QuantMeanBuffer): QuantMeanBuffer = {
    val n = b.sums.length
    a.grow(n)
    var i = 0
    while (i < n) {
      if (b.present(i)) a.present(i) = true
      if (b.counts(i) > 0) {
        b.flush(i); a.flush(i)
        val t = b.bigs(i)
        if (t != null)
          a.bigs(i) = if (a.bigs(i) == null) t else a.bigs(i).add(t)
        a.counts(i) += b.counts(i)
      }
      i += 1
    }
    a
  }

  override def eval(buf: QuantMeanBuffer): Any = {
    val n = buf.sums.length
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var i = 0
    while (i < n) {
      if (buf.present(i)) {
        val row = new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(2)
        row.update(0, i)
        if (buf.counts(i) == 0L) row.setNullAt(1)
        else row.update(1,
          new java.math.BigDecimal(buf.total(i)).doubleValue() /
            (buf.counts(i).toDouble * 1e6))
        out += row
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override def serialize(buf: QuantMeanBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val n = buf.sums.length
    out.writeInt(n)
    var i = 0
    while (i < n) {
      out.writeBoolean(buf.present(i))
      out.writeLong(buf.counts(i))
      val t = buf.total(i)
      val bytes = t.toByteArray
      out.writeInt(bytes.length)
      out.write(bytes)
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): QuantMeanBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new QuantMeanBuffer
    val n = in.readInt()
    buf.grow(n)
    var i = 0
    while (i < n) {
      buf.present(i) = in.readBoolean()
      buf.counts(i) = in.readLong()
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val big = new BigInteger(b)
      if (big.signum() != 0) buf.bigs(i) = big
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(
      newOffset: Int): QuantMeanAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): QuantMeanAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantMeanAgg =
    copy(child = newChildren.head)
}
