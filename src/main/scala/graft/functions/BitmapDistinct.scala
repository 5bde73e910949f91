package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** Exact, mergeable distinct counting over non-negative integer keys
  * via a paged bitmap (the groupBitmap / roaring-bitmap idea from
  * public OLAP engines, in plain pages): one bit per key, pages of
  * 2^16 bits allocated only where keys exist, merge = page-wise OR.
  *
  * Why this beats `count(DISTINCT k)` at 100 TB: exact distinct forces
  * a shuffle of every distinct KEY (expand + regroup); a bitmap buffer
  * is a few KB per dense 65k-key region, merges associatively
  * map-side, and ships bits, not keys. Unlike HyperLogLog it is EXACT
  * — which also makes it hash-gateable against the DuckDB
  * count(DISTINCT) oracle — at the price of requiring an integer key
  * domain (ids), not arbitrary strings.
  *
  * SQL surface ([[GraftExtensions]]): `graft_bitmap_distinct(id)` →
  * bigint. Negative ids raise (documented domain contract).
  */
final class BitmapState {
  // page index (key >>> 16) → 1024-word bitmap (2^16 bits, 8 KiB)
  val pages = scala.collection.mutable.HashMap.empty[Long, Array[Long]]

  def add(v: Long): Unit = {
    require(v >= 0, s"graft_bitmap_distinct: key must be >= 0, got $v")
    val page = pages.getOrElseUpdate(v >>> 16, new Array[Long](1024))
    val bit = (v & 0xFFFF).toInt
    page(bit >>> 6) |= 1L << (bit & 63)
  }

  def merge(other: BitmapState): Unit =
    other.pages.foreach { case (idx, words) =>
      pages.get(idx) match {
        case Some(mine) =>
          var i = 0
          while (i < 1024) { mine(i) |= words(i); i += 1 }
        case None => pages.update(idx, words.clone())
      }
    }

  def cardinality: Long = {
    var n = 0L
    pages.valuesIterator.foreach { words =>
      var i = 0
      while (i < 1024) { n += java.lang.Long.bitCount(words(i)); i += 1 }
    }
    n
  }
}

private[functions] object BitmapWire {
  def write(st: BitmapState): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + st.pages.size * (8 + 8192))
    bb.putInt(st.pages.size)
    st.pages.foreach { case (idx, words) =>
      bb.putLong(idx)
      words.foreach(bb.putLong)
    }
    bb.array()
  }
  def read(bytes: Array[Byte]): BitmapState = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val st = new BitmapState
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val idx = bb.getLong
      val words = new Array[Long](1024)
      var j = 0
      while (j < 1024) { words(j) = bb.getLong; j += 1 }
      st.pages.update(idx, words)
      i += 1
    }
    st
  }
}

/** `graft_bitmap_distinct(key)` — see [[BitmapState]]. */
case class BitmapDistinct(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BitmapState] {

  override lazy val resolved: Boolean =
    childrenResolved && child.dataType == LongType

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bitmap_distinct"

  override def createAggregationBuffer(): BitmapState = new BitmapState

  override def update(buffer: BitmapState, input: InternalRow): BitmapState = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: BitmapState, input: BitmapState): BitmapState = {
    buffer.merge(input)
    buffer
  }

  override def eval(buffer: BitmapState): Any = buffer.cardinality

  override def serialize(buffer: BitmapState): Array[Byte] = BitmapWire.write(buffer)
  override def deserialize(bytes: Array[Byte]): BitmapState = BitmapWire.read(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapDistinct =
    copy(child = newChildren(0))
}

/** `graft_bitmap_bytes(key)` → binary: the serialized bitmap, for
  * persistence and set algebra across slices (see [[BitmapAndCount]]).
  */
case class BitmapBytes(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BitmapState] {

  override lazy val resolved: Boolean =
    childrenResolved && child.dataType == LongType

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "graft_bitmap_bytes"

  override def createAggregationBuffer(): BitmapState = new BitmapState
  override def update(buffer: BitmapState, input: InternalRow): BitmapState = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }
  override def merge(buffer: BitmapState, input: BitmapState): BitmapState = {
    buffer.merge(input)
    buffer
  }
  override def eval(buffer: BitmapState): Any = BitmapWire.write(buffer)
  override def serialize(buffer: BitmapState): Array[Byte] = BitmapWire.write(buffer)
  override def deserialize(bytes: Array[Byte]): BitmapState = BitmapWire.read(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapBytes =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapBytes =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapBytes =
    copy(child = newChildren(0))
}

/** `graft_bitmap_merge_count(bitmap)` → bigint: OR-merge serialized
  * bitmaps and count — rolling / sliced distinct (DAU→WAU→MAU) from
  * persisted per-slice bitmaps without rescanning raw rows.
  */
case class BitmapMergeCount(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BitmapState] {

  override lazy val resolved: Boolean =
    childrenResolved && child.dataType == org.apache.spark.sql.types.BinaryType

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bitmap_merge_count"

  override def createAggregationBuffer(): BitmapState = new BitmapState
  override def update(buffer: BitmapState, input: InternalRow): BitmapState = {
    val v = child.eval(input)
    if (v != null) buffer.merge(BitmapWire.read(v.asInstanceOf[Array[Byte]]))
    buffer
  }
  override def merge(buffer: BitmapState, input: BitmapState): BitmapState = {
    buffer.merge(input)
    buffer
  }
  override def eval(buffer: BitmapState): Any = buffer.cardinality
  override def serialize(buffer: BitmapState): Array[Byte] = BitmapWire.write(buffer)
  override def deserialize(bytes: Array[Byte]): BitmapState = BitmapWire.read(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapMergeCount =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapMergeCount =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapMergeCount =
    copy(child = newChildren(0))
}

/** `graft_bitmap_and_count(a, b)` → bigint: cardinality of the
  * intersection of two serialized bitmaps — audience overlap ("users
  * who did BOTH") as pure page-wise AND over KB-sized binaries, no
  * re-touch of the raw rows. Scalar expression over tiny inputs;
  * interpreted eval is fine off the hot path (CodegenFallback).
  */
case class BitmapAndCount(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override lazy val resolved: Boolean = childrenResolved &&
    left.dataType == org.apache.spark.sql.types.BinaryType &&
    right.dataType == org.apache.spark.sql.types.BinaryType

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bitmap_and_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = BitmapWire.read(a.asInstanceOf[Array[Byte]])
    val y = BitmapWire.read(b.asInstanceOf[Array[Byte]])
    var n = 0L
    x.pages.foreach { case (idx, words) =>
      y.pages.get(idx).foreach { other =>
        var i = 0
        while (i < 1024) {
          n += java.lang.Long.bitCount(words(i) & other(i)); i += 1
        }
      }
    }
    n
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitmapAndCount =
    copy(left = newLeft, right = newRight)
}
