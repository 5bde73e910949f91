package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, IntegerType, StringType}

/** Mergeable Bloom filter (Bloom, CACM 1970; double hashing per
  * Kirsch & Mitzenmacher, ESA 2006 — public literature) as a native
  * Catalyst [[TypedImperativeAggregate]] plus a membership expression.
  *
  * The 100 TB decontamination shape: the EXACT eval-overlap check
  * ([[graft.llmops.DedupOps.contaminationPairs]]) broadcasts the eval
  * shingle set itself; when the protected set grows to billions of
  * n-grams, the exact broadcast stops fitting, but a Bloom filter
  * compresses it to m bits at a chosen false-positive rate and keeps
  * the corpus-side plan identical: one scan, no shuffle of corpus
  * text, membership tested executor-side against a broadcast blob.
  * Merge = bitwise OR, so per-shard eval filters combine map-side.
  *
  * Determinism contract: bit positions come from the md5-derived pair
  * (h1 = first 8 md5 hex digits, h2 = next 8), position_i =
  * (h1 + i·h2) mod m — integer arithmetic both engines replay, so
  * even the false positives are identical in the DuckDB oracle.
  *
  * SQL surface ([[GraftExtensions]]):
  * `graft_bloom_bytes(key, mBits, kHashes)` → binary;
  * `graft_bloom_contains(bloom, key)` → boolean.
  */
final class BloomState(val mBits: Int, val kHashes: Int) {
  require(mBits > 0 && mBits % 64 == 0,
    s"graft_bloom: mBits must be a positive multiple of 64, got $mBits")
  require(kHashes >= 1 && kHashes <= 16,
    s"graft_bloom: kHashes must be in [1,16], got $kHashes")
  val words: Array[Long] = new Array[Long](mBits / 64)

  private val md = MessageDigest.getInstance("MD5")

  private def hashPair(key: String): (Long, Long) = {
    md.reset()
    val d = md.digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val h1 = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
      ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
    val h2 = ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
      ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)
    (h1, h2)
  }

  def add(key: String): Unit = {
    val (h1, h2) = hashPair(key)
    var i = 0
    while (i < kHashes) {
      val pos = ((h1 + i * h2) % mBits).toInt
      words(pos >>> 6) |= 1L << (pos & 63)
      i += 1
    }
  }

  def contains(key: String): Boolean = {
    val (h1, h2) = hashPair(key)
    var i = 0
    while (i < kHashes) {
      val pos = ((h1 + i * h2) % mBits).toInt
      if ((words(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def merge(other: BloomState): Unit = {
    require(other.mBits == mBits && other.kHashes == kHashes,
      s"graft_bloom: cannot merge (m=$mBits,k=$kHashes) with " +
        s"(m=${other.mBits},k=${other.kHashes})")
    var i = 0
    while (i < words.length) { words(i) |= other.words(i); i += 1 }
  }
}

private[functions] object BloomWire {
  def write(st: BloomState): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + st.words.length * 8)
    bb.putInt(st.mBits)
    bb.putInt(st.kHashes)
    st.words.foreach(bb.putLong)
    bb.array()
  }
  def read(bytes: Array[Byte]): BloomState = {
    val bb = ByteBuffer.wrap(bytes)
    val st = new BloomState(bb.getInt, bb.getInt)
    var i = 0
    while (i < st.words.length) { st.words(i) = bb.getLong; i += 1 }
    st
  }
}

/** `graft_bloom_bytes(key, mBits, kHashes)` → binary. */
case class BloomBytes(
    child: Expression,
    bits: Expression,
    hashes: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomState] {

  private lazy val m: Int = {
    require(bits.foldable && hashes.foldable,
      "graft_bloom_bytes: mBits and kHashes must be literals")
    bits.eval(null).asInstanceOf[Int]
  }
  private lazy val k: Int = hashes.eval(null).asInstanceOf[Int]

  override lazy val resolved: Boolean =
    childrenResolved && child.dataType == StringType &&
      bits.dataType == IntegerType && hashes.dataType == IntegerType

  override def children: Seq[Expression] = Seq(child, bits, hashes)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_bloom_bytes"

  override def createAggregationBuffer(): BloomState = new BloomState(m, k)

  override def update(buffer: BloomState, input: InternalRow): BloomState = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.toString)
    buffer
  }

  override def merge(buffer: BloomState, input: BloomState): BloomState = {
    buffer.merge(input)
    buffer
  }

  override def eval(buffer: BloomState): Any = BloomWire.write(buffer)
  override def serialize(buffer: BloomState): Array[Byte] = BloomWire.write(buffer)
  override def deserialize(bytes: Array[Byte]): BloomState = BloomWire.read(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBytes =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBytes =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomBytes =
    copy(child = newChildren(0), bits = newChildren(1), hashes = newChildren(2))
}

/** `graft_bloom_contains(bloom, key)` → boolean. The bloom operand is
  * normally a broadcast one-row blob repeated across millions of probe
  * rows, so the deserialized state is memoized by array identity —
  * probing costs k bit tests, not a re-parse per row. Interpreted eval
  * (CodegenFallback) keeps the blob handling simple; the probe itself
  * is off the codegen hot path by construction (a boolean filter over
  * an already-scanned column).
  */
case class BloomContains(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override lazy val resolved: Boolean = childrenResolved &&
    left.dataType == BinaryType && right.dataType == StringType

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedState: BloomState = _

  override def nullSafeEval(a: Any, b: Any): Any = {
    val bytes = a.asInstanceOf[Array[Byte]]
    // UnsafeRow getters copy, so identity alone would miss; an
    // Arrays.equals memo still beats re-parsing the word array per row
    if (!(bytes eq cachedBytes) && !java.util.Arrays.equals(bytes, cachedBytes)) {
      cachedState = BloomWire.read(bytes)
      cachedBytes = bytes
    }
    cachedState.contains(b.toString)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}
