package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, IntegerType, StringType}

/** Mergeable HyperLogLog distinct-count sketch (Flajolet, Fusy,
  * Gandouet, Meunier, "HyperLogLog: the analysis of a near-optimal
  * cardinality estimation algorithm", AofA 2007 — public literature)
  * as a native Catalyst [[TypedImperativeAggregate]].
  *
  * Complements the EXACT paged-bitmap family ([[BitmapDistinct]]):
  * the bitmap needs an integer key domain and ~1 bit per possible key;
  * HLL takes ANY key type at a FIXED 2^p bytes per group (4 KiB at
  * p=12) with ~1.04/sqrt(2^p) relative error. At 100 TB that is the
  * difference between shipping kilobytes and shipping key sets for
  * high-cardinality string keys (URLs, session ids); merge is
  * register-wise max, so partials combine map-side and the registers
  * of a merged sketch are IDENTICAL to a sketch built over the union —
  * daily snapshots roll up to weekly/monthly with zero re-scan.
  *
  * Determinism contract (what makes this DuckDB-hash-gateable where
  * library HLLs are not): the 32-bit hash is the first 8 hex digits of
  * md5 of the key's string rendering — both engines compute the same
  * md5 of the same string, so buckets, ranks, registers, and the
  * final float arithmetic replay exactly in SQL. bucket = top p hash
  * bits; rank = leading-zero count of the remaining (32−p) bits + 1;
  * estimate = alpha(m)·m²/Σ 2^−reg[j] (register-order sum) with the
  * canonical small-range (linear counting) and large-range branches.
  *
  * SQL surface ([[GraftExtensions]]):
  * `graft_hll_count(key, p)` → double (estimate);
  * `graft_hll_bytes(key, p)` → binary (registers, for persistence);
  * `graft_hll_merge_count(sketch)` → double (max-merge + estimate).
  */
/** Shared deterministic sketch hash: u32 = first 8 hex digits of
  * md5(key's string rendering) — matches Spark's
  * `conv(substring(md5(k), 1, 8), 16, 10)` and DuckDB's hex Horner
  * fold over `substring(md5(k), i, 1)`, so sketch contents replay
  * exactly in oracle SQL on both engines.
  */
private[functions] object SketchHash {
  def u32(md: MessageDigest, key: String): Long = {
    md.reset()
    val digest = md.digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 4 digest bytes == first 8 hex chars, big-endian
    ((digest(0) & 0xFFL) << 24) | ((digest(1) & 0xFFL) << 16) |
      ((digest(2) & 0xFFL) << 8) | (digest(3) & 0xFFL)
  }
}

final class HllState(val p: Int) {
  require(p >= 4 && p <= 18, s"graft_hll: precision p must be in [4,18], got $p")
  val m: Int = 1 << p
  val registers: Array[Byte] = new Array[Byte](m)

  private val md = MessageDigest.getInstance("MD5")

  def add(key: String): Unit = {
    val u = SketchHash.u32(md, key)
    val tail = 32 - p
    val bucket = (u >>> tail).toInt
    val rem = u & ((1L << tail) - 1)
    // floor(log2(rem)) = 63 - nlz(rem); rank counts leading zeros of
    // the (32-p)-bit remainder, +1 (all-zeros remainder → tail+1)
    val rank =
      if (rem == 0L) tail + 1
      else tail - (63 - java.lang.Long.numberOfLeadingZeros(rem))
    if (rank > registers(bucket)) registers(bucket) = rank.toByte
  }

  def merge(other: HllState): Unit = {
    require(other.p == p, s"graft_hll: cannot merge p=$p with p=${other.p}")
    var j = 0
    while (j < m) {
      if (other.registers(j) > registers(j)) registers(j) = other.registers(j)
      j += 1
    }
  }

  /** Canonical HLL estimator; op order mirrored in the oracle SQL. */
  def estimate: Double = {
    var sum = 0.0
    var zeros = 0L
    var j = 0
    while (j < m) {
      sum += math.pow(2.0, -registers(j).toDouble)
      if (registers(j) == 0) zeros += 1
      j += 1
    }
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val raw = alpha * m * m / sum
    val two32 = 4294967296.0
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
    else if (raw <= two32 / 30.0) raw
    else -two32 * math.log(1.0 - raw / two32)
  }
}

private[functions] object HllWire {
  def write(st: HllState): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + st.m)
    bb.putInt(st.p)
    bb.put(st.registers)
    bb.array()
  }
  def read(bytes: Array[Byte]): HllState = {
    val bb = ByteBuffer.wrap(bytes)
    val st = new HllState(bb.getInt)
    bb.get(st.registers)
    st
  }
}

private[functions] trait HllAggBase extends TypedImperativeAggregate[HllState] {
  def child: Expression
  def precision: Expression

  protected lazy val p: Int = {
    require(precision.foldable, s"$prettyName: p must be a literal")
    precision.eval(null).asInstanceOf[Int]
  }

  override lazy val resolved: Boolean =
    childrenResolved && child.dataType == StringType &&
      precision.dataType == IntegerType

  override def children: Seq[Expression] = Seq(child, precision)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): HllState = new HllState(p)

  override def update(buffer: HllState, input: InternalRow): HllState = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.toString)
    buffer
  }

  override def merge(buffer: HllState, input: HllState): HllState = {
    buffer.merge(input)
    buffer
  }

  override def serialize(buffer: HllState): Array[Byte] = HllWire.write(buffer)
  override def deserialize(bytes: Array[Byte]): HllState = HllWire.read(bytes)
}

/** `graft_hll_count(key, p)` → double. */
case class HllCount(
    child: Expression,
    precision: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends HllAggBase {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_hll_count"
  override def eval(buffer: HllState): Any = buffer.estimate

  override def withNewMutableAggBufferOffset(newOffset: Int): HllCount =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllCount =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllCount =
    copy(child = newChildren(0), precision = newChildren(1))
}

/** `graft_hll_bytes(key, p)` → binary: serialized registers for
  * persistence (daily snapshot columns) and later max-merge roll-up.
  */
case class HllBytes(
    child: Expression,
    precision: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends HllAggBase {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_hll_bytes"
  override def eval(buffer: HllState): Any = HllWire.write(buffer)

  override def withNewMutableAggBufferOffset(newOffset: Int): HllBytes =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllBytes =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllBytes =
    copy(child = newChildren(0), precision = newChildren(1))
}

/** Shared merge machinery for the sketch-roll-up aggregates: the
  * buffer adopts the first sketch's precision (the k=4 seed is only
  * ever replaced while still empty).
  */
private[functions] trait HllMergeBase extends TypedImperativeAggregate[HllState] {
  def child: Expression

  override lazy val resolved: Boolean =
    childrenResolved && child.dataType == BinaryType

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): HllState = new HllState(4)

  protected def mergeInto(buffer: HllState, in: HllState): HllState =
    if (buffer.p == in.p) { buffer.merge(in); buffer }
    else {
      // empty seed buffer adopting the sketches' true precision
      require(buffer.registers.forall(_ == 0),
        s"$prettyName: mixed precisions p=${buffer.p} and p=${in.p}")
      in
    }

  override def update(buffer: HllState, input: InternalRow): HllState = {
    val v = child.eval(input)
    if (v == null) buffer
    else mergeInto(buffer, HllWire.read(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(buffer: HllState, input: HllState): HllState =
    mergeInto(buffer, input)

  override def serialize(buffer: HllState): Array[Byte] = HllWire.write(buffer)
  override def deserialize(bytes: Array[Byte]): HllState = HllWire.read(bytes)
}

/** `graft_hll_merge_count(sketch)` → double: max-merge persisted
  * sketches and estimate — the roll-up read path. Register-wise max is
  * exactly the registers of a sketch built over the union, so merged
  * estimates equal direct estimates (spec-pinned).
  */
case class HllMergeCount(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends HllMergeBase {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_hll_merge_count"
  override def eval(buffer: HllState): Any = buffer.estimate

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMergeCount =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMergeCount =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllMergeCount =
    copy(child = newChildren(0))
}

/** `graft_hll_merge_bytes(sketch)` → binary: max-merge and RE-PERSIST
  * — the compaction path (daily sketches → one monthly sketch on
  * disk, estimates still available later via merge_count).
  */
case class HllMergeBytes(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends HllMergeBase {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_hll_merge_bytes"
  override def eval(buffer: HllState): Any = HllWire.write(buffer)

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMergeBytes =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMergeBytes =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllMergeBytes =
    copy(child = newChildren(0))
}
