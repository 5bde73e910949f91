package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType}

/** Mergeable Count-Min sketch (Cormode & Muthukrishnan, "An improved
  * data stream summary: the count-min sketch and its applications",
  * J. Algorithms 2005 — public literature) as a native Catalyst
  * [[TypedImperativeAggregate]] plus a point-query expression.
  *
  * The missing piece between the exact count table and the SpaceSaving
  * top-k sketch ([[TopKSketch]]): SpaceSaving keeps only the heavy
  * hitters; Count-Min answers a frequency UPPER BOUND for ANY item in
  * d·w counters (ε = e/w over-estimate with probability 1−e^−d),
  * merge = element-wise add — so per-shard d·w·8-byte grids combine
  * map-side and persisted daily grids roll up by addition. At 100 TB
  * that answers "roughly how often does THIS token/url/user appear"
  * without shuffling a billion-key count table.
  *
  * Determinism contract: row-i position = (h1 + i·h2) mod w with the
  * md5-derived (h1, h2) pair — counters and point estimates (hash
  * collisions included) replay exactly in DuckDB position-set SQL.
  *
  * SQL surface ([[GraftExtensions]]):
  * `graft_cms_bytes(item, d, w)` → binary;
  * `graft_cms_merge_bytes(cms)` → binary (add-merge roll-up);
  * `graft_cms_estimate(cms, item)` → bigint.
  */
final class CmsState(val d: Int, val w: Int) {
  require(d >= 1 && d <= 16, s"graft_cms: depth d must be in [1,16], got $d")
  require(w >= 16, s"graft_cms: width w must be >= 16, got $w")
  val counts: Array[Long] = new Array[Long](d * w)

  private val md = MessageDigest.getInstance("MD5")

  private def hashPair(key: String): (Long, Long) = {
    md.reset()
    val dg = md.digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val h1 = ((dg(0) & 0xFFL) << 24) | ((dg(1) & 0xFFL) << 16) |
      ((dg(2) & 0xFFL) << 8) | (dg(3) & 0xFFL)
    val h2 = ((dg(4) & 0xFFL) << 24) | ((dg(5) & 0xFFL) << 16) |
      ((dg(6) & 0xFFL) << 8) | (dg(7) & 0xFFL)
    (h1, h2)
  }

  def add(key: String): Unit = {
    val (h1, h2) = hashPair(key)
    var i = 0
    while (i < d) {
      counts(i * w + ((h1 + i * h2) % w).toInt) += 1L
      i += 1
    }
  }

  def estimate(key: String): Long = {
    val (h1, h2) = hashPair(key)
    var min = Long.MaxValue
    var i = 0
    while (i < d) {
      val c = counts(i * w + ((h1 + i * h2) % w).toInt)
      if (c < min) min = c
      i += 1
    }
    min
  }

  def merge(other: CmsState): Unit = {
    require(other.d == d && other.w == w,
      s"graft_cms: cannot merge (d=$d,w=$w) with (d=${other.d},w=${other.w})")
    var i = 0
    while (i < counts.length) { counts(i) += other.counts(i); i += 1 }
  }
}

private[functions] object CmsWire {
  def write(st: CmsState): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + st.counts.length * 8)
    bb.putInt(st.d)
    bb.putInt(st.w)
    st.counts.foreach(bb.putLong)
    bb.array()
  }
  def read(bytes: Array[Byte]): CmsState = {
    val bb = ByteBuffer.wrap(bytes)
    val st = new CmsState(bb.getInt, bb.getInt)
    var i = 0
    while (i < st.counts.length) { st.counts(i) = bb.getLong; i += 1 }
    st
  }
}

/** `graft_cms_bytes(item, d, w)` → binary. */
case class CmsBytes(
    child: Expression,
    depth: Expression,
    width: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsState] {

  private lazy val d: Int = {
    require(depth.foldable && width.foldable,
      "graft_cms_bytes: d and w must be literals")
    depth.eval(null).asInstanceOf[Int]
  }
  private lazy val w: Int = width.eval(null).asInstanceOf[Int]

  override lazy val resolved: Boolean =
    childrenResolved && child.dataType == StringType &&
      depth.dataType == IntegerType && width.dataType == IntegerType

  override def children: Seq[Expression] = Seq(child, depth, width)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_cms_bytes"

  override def createAggregationBuffer(): CmsState = new CmsState(d, w)

  override def update(buffer: CmsState, input: InternalRow): CmsState = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.toString)
    buffer
  }

  override def merge(buffer: CmsState, input: CmsState): CmsState = {
    buffer.merge(input)
    buffer
  }

  override def eval(buffer: CmsState): Any = CmsWire.write(buffer)
  override def serialize(buffer: CmsState): Array[Byte] = CmsWire.write(buffer)
  override def deserialize(bytes: Array[Byte]): CmsState = CmsWire.read(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsBytes =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsBytes =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsBytes =
    copy(child = newChildren(0), depth = newChildren(1), width = newChildren(2))
}

/** `graft_cms_merge_bytes(cms)` → binary: add-merge persisted grids. */
case class CmsMergeBytes(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsState] {

  override lazy val resolved: Boolean =
    childrenResolved && child.dataType == BinaryType

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_cms_merge_bytes"

  // dims discovered from the first grid merged in (seed replaced while empty)
  override def createAggregationBuffer(): CmsState = new CmsState(1, 16)

  private def mergeInto(buffer: CmsState, in: CmsState): CmsState =
    if (buffer.d == in.d && buffer.w == in.w) { buffer.merge(in); buffer }
    else {
      require(buffer.counts.forall(_ == 0L),
        s"graft_cms_merge_bytes: mixed dimensions (${buffer.d},${buffer.w}) " +
          s"and (${in.d},${in.w})")
      in
    }

  override def update(buffer: CmsState, input: InternalRow): CmsState = {
    val v = child.eval(input)
    if (v == null) buffer
    else mergeInto(buffer, CmsWire.read(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(buffer: CmsState, input: CmsState): CmsState =
    mergeInto(buffer, input)

  override def eval(buffer: CmsState): Any = CmsWire.write(buffer)
  override def serialize(buffer: CmsState): Array[Byte] = CmsWire.write(buffer)
  override def deserialize(bytes: Array[Byte]): CmsState = CmsWire.read(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMergeBytes =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMergeBytes =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsMergeBytes =
    copy(child = newChildren(0))
}

/** `graft_cms_estimate(cms, item)` → bigint: min over rows. The grid
  * operand repeats across probe rows (broadcast join), so the parsed
  * state is memoized like [[BloomContains]].
  */
case class CmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override lazy val resolved: Boolean = childrenResolved &&
    left.dataType == BinaryType && right.dataType == StringType

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_estimate"

  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedState: CmsState = _

  override def nullSafeEval(a: Any, b: Any): Any = {
    val bytes = a.asInstanceOf[Array[Byte]]
    if (!(bytes eq cachedBytes) && !java.util.Arrays.equals(bytes, cachedBytes)) {
      cachedState = CmsWire.read(bytes)
      cachedBytes = bytes
    }
    cachedState.estimate(b.toString)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}
