package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Typed (ObjectHashAggregate-eligible) spellings of Spark's fixed-4 KB
  * bitmap aggregates.
  *
  * WHY THESE EXIST: the built-in `bitmap_construct_agg` / `bitmap_or_agg`
  * are plain `ImperativeAggregate`s over a BinaryType buffer — a buffer
  * shape `HashAggregateExec` cannot hold (it needs mutable fixed-width
  * fields), and `ObjectHashAggregateExec` only accepts aggregates when at
  * least one function is a `TypedImperativeAggregate`. A bitmap-only
  * aggregate therefore plans as **SortAggregate**, whose required child
  * ordering inserts a per-partition Sort of the ENTIRE fact input below
  * the partial aggregate (q49 at sf10: a 60 M-row sort on (grp, b0, b1)
  * before a ~700-group aggregation — measured 5.4 s where the identical
  * bucketed-bitmap shape with an ObjectHash plan runs ~2 s; q70's level-1
  * aggregate escapes only because its `hll_sketch_agg` rider happens to be
  * typed). These classes keep the exact byte layout of the built-ins
  * (4096-byte buffer, bit v at `byte v/8`, mask `1 << (v%8)` — verified
  * against the decompiled `BitmapExpressionUtils` and property-gated
  * byte-for-byte in `DistinctCountsSpec`) so `bitmap_count` /
  * `bitmap_or_agg` downstream consume them unchanged, while hashing
  * group keys instead of sorting the scan.
  */
object BitmapTyped {
  final val NumBytes = 4096
  final val NumBits = NumBytes * 8
}

/** `bitmap_construct_agg` as a TypedImperativeAggregate: child is a bit
  * position in [0, 32768) (from `bitmap_bit_position`), buffer the 4 KB
  * bitmap, NULL children set no bit (the count-DISTINCT exclusion
  * contract).
  */
case class BitmapConstructTypedAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bitmap_construct_typed_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint/int bit position, got ${dt.catalogString}")
  }

  @transient private lazy val isInt = child.dataType == IntegerType

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](BitmapTyped.NumBytes)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val pos = if (isInt) v.asInstanceOf[Int].toLong else v.asInstanceOf[Long]
      if (pos < 0L || pos >= BitmapTyped.NumBits)
        throw new ArrayIndexOutOfBoundsException(
          s"bitmap position $pos out of [0, ${BitmapTyped.NumBits})")
      val i = (pos >> 3).toInt
      buf(i) = (buf(i) | (1 << (pos & 7L).toInt)).toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < BitmapTyped.NumBytes) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(n: Int): BitmapConstructTypedAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BitmapConstructTypedAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapConstructTypedAgg =
    copy(child = newChildren.head)
}

/** `bitmap_or_agg` as a TypedImperativeAggregate: child is a 4 KB bitmap
  * (BinaryType), buffer the byte-wise OR. NULL bitmaps contribute nothing.
  */
case class BitmapOrTypedAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bitmap_or_typed_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary bitmap child, got ${dt.catalogString}")
  }

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](BitmapTyped.NumBytes)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val bm = v.asInstanceOf[Array[Byte]]
      val n = math.min(bm.length, BitmapTyped.NumBytes)
      var i = 0
      while (i < n) { buf(i) = (buf(i) | bm(i)).toByte; i += 1 }
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < BitmapTyped.NumBytes) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(n: Int): BitmapOrTypedAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BitmapOrTypedAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapOrTypedAgg =
    copy(child = newChildren.head)
}
