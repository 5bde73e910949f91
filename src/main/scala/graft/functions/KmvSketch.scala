package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, IntegerType, StringType}

/** Mergeable KMV ("k minimum values" / bottom-k) distinct sketch
  * (Bar-Yossef et al., "Counting distinct elements in a data stream",
  * RANDOM 2002; Beyer et al., SIGMOD 2007 — public literature) as a
  * native Catalyst [[TypedImperativeAggregate]].
  *
  * What it adds over [[HllSketch]]: a KMV sketch is a uniform SAMPLE
  * of the key set's hash space, so two sketches support SET-OVERLAP
  * estimation — Jaccard(A, B) ≈ |U_k ∩ A ∩ B| / |U_k| where U_k is
  * the k smallest hashes of the union (the standard KMV coincidence
  * estimator). That answers "how much do these two corpora overlap?"
  * (cross-source dedup planning, slice similarity) from two KB-sized
  * sketches, where HLL registers can only union, never intersect
  * reliably. Merge = set-union-then-truncate, which equals the sketch
  * of the union exactly (bottom-k of A ∪ B = bottom-k of
  * bottom-k(A) ∪ bottom-k(B)), so partials combine map-side and
  * persisted shards roll up losslessly.
  *
  * Determinism contract: hashes come from [[SketchHash]] (md5-derived
  * u32), so sketch CONTENTS — and therefore estimates — replay exactly
  * in DuckDB SQL (row_number over ordered distinct hashes).
  *
  * SQL surface ([[GraftExtensions]]):
  * `graft_kmv_count(key, k)` → double (distinct estimate; exact when
  * fewer than k distinct hashes were seen);
  * `graft_kmv_bytes(key, k)` → binary (persistable sketch);
  * `graft_kmv_merge_count(sketch)` → double (union roll-up);
  * `graft_kmv_jaccard(a, b)` → double (overlap estimate).
  */
final class KmvState(val k: Int) {
  require(k >= 2, s"graft_kmv: k must be >= 2, got $k")
  // ascending set of the k smallest distinct u32 hashes seen so far
  val hashes = new java.util.TreeSet[java.lang.Long]()

  private val md = MessageDigest.getInstance("MD5")

  def addKey(key: String): Unit = addHash(SketchHash.u32(md, key))

  def addHash(h: Long): Unit =
    if (hashes.size < k) { hashes.add(h); () }
    else if (h < hashes.last && !hashes.contains(h)) {
      hashes.add(h)
      hashes.remove(hashes.last)
    }

  def merge(other: KmvState): Unit = {
    require(other.k == k, s"graft_kmv: cannot merge k=$k with k=${other.k}")
    other.hashes.forEach(h => addHash(h))
  }

  /** n < k → the sketch saw every distinct hash: exact. Otherwise the
    * classic estimator (k−1) · 2³² / h_(k) — h_(k) is the largest kept
    * hash, i.e. the k-th smallest overall.
    */
  def estimate: Double = {
    val n = hashes.size
    if (n < k) n.toDouble
    else (k - 1) * 4294967296.0 / hashes.last
  }
}

private[functions] object KmvWire {
  def write(st: KmvState): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + st.hashes.size * 8)
    bb.putInt(st.k)
    bb.putInt(st.hashes.size)
    st.hashes.forEach(h => { bb.putLong(h); () })
    bb.array()
  }
  def read(bytes: Array[Byte]): KmvState = {
    val bb = ByteBuffer.wrap(bytes)
    val st = new KmvState(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { st.addHash(bb.getLong); i += 1 }
    st
  }
}

private[functions] trait KmvAggBase extends TypedImperativeAggregate[KmvState] {
  def child: Expression
  def capacity: Expression

  protected lazy val k: Int = {
    require(capacity.foldable, s"$prettyName: k must be a literal")
    capacity.eval(null).asInstanceOf[Int]
  }

  override lazy val resolved: Boolean =
    childrenResolved && child.dataType == StringType &&
      capacity.dataType == IntegerType

  override def children: Seq[Expression] = Seq(child, capacity)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KmvState = new KmvState(k)

  override def update(buffer: KmvState, input: InternalRow): KmvState = {
    val v = child.eval(input)
    if (v != null) buffer.addKey(v.toString)
    buffer
  }

  override def merge(buffer: KmvState, input: KmvState): KmvState = {
    buffer.merge(input)
    buffer
  }

  override def serialize(buffer: KmvState): Array[Byte] = KmvWire.write(buffer)
  override def deserialize(bytes: Array[Byte]): KmvState = KmvWire.read(bytes)
}

/** `graft_kmv_count(key, k)` → double. */
case class KmvCount(
    child: Expression,
    capacity: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends KmvAggBase {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_kmv_count"
  override def eval(buffer: KmvState): Any = buffer.estimate

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvCount =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvCount =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvCount =
    copy(child = newChildren(0), capacity = newChildren(1))
}

/** `graft_kmv_bytes(key, k)` → binary: persistable bottom-k sketch. */
case class KmvBytes(
    child: Expression,
    capacity: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends KmvAggBase {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_kmv_bytes"
  override def eval(buffer: KmvState): Any = KmvWire.write(buffer)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvBytes =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvBytes =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvBytes =
    copy(child = newChildren(0), capacity = newChildren(1))
}

/** `graft_kmv_merge_count(sketch)` → double: union-merge persisted
  * sketches and estimate (bottom-k truncation is union-exact).
  */
case class KmvMergeCount(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvState] {

  override lazy val resolved: Boolean =
    childrenResolved && child.dataType == BinaryType

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_kmv_merge_count"

  // capacity discovered from the first sketch merged in (seed k=2 is
  // only ever replaced while still empty)
  override def createAggregationBuffer(): KmvState = new KmvState(2)

  private def mergeInto(buffer: KmvState, in: KmvState): KmvState =
    if (buffer.k == in.k) { buffer.merge(in); buffer }
    else {
      require(buffer.hashes.isEmpty,
        s"graft_kmv_merge_count: mixed capacities k=${buffer.k} and k=${in.k}")
      in
    }

  override def update(buffer: KmvState, input: InternalRow): KmvState = {
    val v = child.eval(input)
    if (v == null) buffer
    else mergeInto(buffer, KmvWire.read(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(buffer: KmvState, input: KmvState): KmvState =
    mergeInto(buffer, input)

  override def eval(buffer: KmvState): Any = buffer.estimate
  override def serialize(buffer: KmvState): Array[Byte] = KmvWire.write(buffer)
  override def deserialize(bytes: Array[Byte]): KmvState = KmvWire.read(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMergeCount =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMergeCount =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvMergeCount =
    copy(child = newChildren(0))
}

/** `graft_kmv_merge_bytes(sketch)` → binary: union-merge and
  * RE-PERSIST — the compaction path; the merged sketch keeps the full
  * KMV algebra (counts AND jaccard) downstream because truncation is
  * union-exact.
  */
case class KmvMergeBytes(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvState] {

  override lazy val resolved: Boolean =
    childrenResolved && child.dataType == BinaryType

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_kmv_merge_bytes"

  override def createAggregationBuffer(): KmvState = new KmvState(2)

  private def mergeInto(buffer: KmvState, in: KmvState): KmvState =
    if (buffer.k == in.k) { buffer.merge(in); buffer }
    else {
      require(buffer.hashes.isEmpty,
        s"graft_kmv_merge_bytes: mixed capacities k=${buffer.k} and k=${in.k}")
      in
    }

  override def update(buffer: KmvState, input: InternalRow): KmvState = {
    val v = child.eval(input)
    if (v == null) buffer
    else mergeInto(buffer, KmvWire.read(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(buffer: KmvState, input: KmvState): KmvState =
    mergeInto(buffer, input)

  override def eval(buffer: KmvState): Any = KmvWire.write(buffer)
  override def serialize(buffer: KmvState): Array[Byte] = KmvWire.write(buffer)
  override def deserialize(bytes: Array[Byte]): KmvState = KmvWire.read(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMergeBytes =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMergeBytes =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvMergeBytes =
    copy(child = newChildren(0))
}

/** `graft_kmv_jaccard(a, b)` → double: the KMV coincidence estimator.
  * U_k = k smallest of the union of the two sketch sets; the estimate
  * is the fraction of U_k present in BOTH sketches. Scalar over two
  * KB binaries — interpreted eval off the hot path (CodegenFallback),
  * like [[BitmapAndCount]].
  */
case class KmvJaccard(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override lazy val resolved: Boolean = childrenResolved &&
    left.dataType == BinaryType && right.dataType == BinaryType

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_kmv_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = KmvWire.read(a.asInstanceOf[Array[Byte]])
    val y = KmvWire.read(b.asInstanceOf[Array[Byte]])
    require(x.k == y.k,
      s"graft_kmv_jaccard: mixed capacities k=${x.k} and k=${y.k}")
    val union = new java.util.TreeSet[java.lang.Long](x.hashes)
    union.addAll(y.hashes)
    val kk = math.min(x.k, union.size)
    var both = 0L
    val it = union.iterator()
    var taken = 0
    while (taken < kk && it.hasNext) {
      val h = it.next()
      if (x.hashes.contains(h) && y.hashes.contains(h)) both += 1
      taken += 1
    }
    if (kk == 0) 0.0 else both / kk.toDouble
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvJaccard =
    copy(left = newLeft, right = newRight)
}
