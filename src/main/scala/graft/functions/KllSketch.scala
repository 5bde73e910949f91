package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Mergeable rank/quantile sketch in the KLL family (Karnin, Lang,
  * Liberty, "Optimal Quantile Approximation in Streams", FOCS 2016 —
  * public literature), re-expressed as a native Catalyst
  * [[TypedImperativeAggregate]] so `groupBy(...).agg(...)` computes
  * quantiles in ONE pass with map-side partial aggregation.
  *
  * Why this exists at 100 TB: exact `percentile()` needs every value of
  * a group materialized on one task (a global sort or a giant
  * collect_list); this sketch is a few KB per group regardless of group
  * size, and `merge` is associative, so partials combine map-side and
  * only sketches cross the shuffle. That is the only quantile shape
  * that survives a 1000-executor scan of a 100 TB table.
  *
  * Structure: a stack of levels; level i holds items each standing for
  * `2^i` original rows. Updates append to level 0. A full level is
  * sorted and "compacted": alternate items survive with doubled weight
  * and move one level up, the rest are discarded. The surviving parity
  * ALTERNATES per level (deterministic — no RNG, so results are
  * reproducible run-to-run; the textbook variant flips a coin, which
  * only matters against adversarial input orders). Every level gets the
  * same capacity `k`, a simplification of the paper's geometrically
  * decaying capacities: rank error stays O(levels/k) and the state
  * bound O(k · log(n/k)), both fine for the k≈256+ regime used here.
  *
  * EXACT mode (what the DuckDB hash-gate pins): while total n ≤ k no
  * compaction ever fires, every item has weight 1, and quantile() is
  * exactly "the ceil(q·n)-th smallest value" — the same arithmetic the
  * oracle SQL expresses with row_number(). The approximation path is
  * spec-covered separately with rank-error bounds (KllSketchSpec).
  *
  * SQL surface (registered by [[GraftExtensions]]):
  * `graft_kll_quantiles(value, array(0.25d, 0.5d), k)` → array<double>,
  * one estimate per requested quantile, in request order.
  */
object KllState {
  /** One resizable level of doubles (avoids boxing; growth by doubling). */
  final class Level(initialCapacity: Int) {
    var items: Array[Double] = new Array[Double](initialCapacity)
    var size: Int = 0
    def add(v: Double): Unit = {
      if (size == items.length) {
        items = java.util.Arrays.copyOf(items, items.length * 2)
      }
      items(size) = v
      size += 1
    }
    def addAll(vs: Array[Double], n: Int): Unit = {
      var i = 0
      while (i < n) { add(vs(i)); i += 1 }
    }
  }
}

final class KllState(val k: Int) {
  import KllState.Level

  // levels(i): items of weight 2^i. Level 0 sized to k up front (it is
  // the hot append path); higher levels start small and grow on demand.
  val levels = scala.collection.mutable.ArrayBuffer(new Level(math.max(k, 8)))
  // Per-level surviving parity for the next compaction (deterministic
  // alternation replaces the paper's coin flip).
  val parity = scala.collection.mutable.ArrayBuffer(0)
  var totalN: Long = 0L

  private def ensureLevel(i: Int): Unit =
    while (levels.length <= i) { levels += new Level(8); parity += 0 }

  def update(v: Double): Unit = {
    levels(0).add(v)
    totalN += 1
    if (levels(0).size >= k) compact(0)
  }

  /** Sort level i, promote alternate items to level i+1, drop the rest.
    * Cascades if the promotion overfills the level above.
    */
  private def compact(i: Int): Unit = {
    val lvl = levels(i)
    java.util.Arrays.sort(lvl.items, 0, lvl.size)
    ensureLevel(i + 1)
    val up = levels(i + 1)
    var j = parity(i)
    while (j < lvl.size) { up.add(lvl.items(j)); j += 2 }
    parity(i) = 1 - parity(i)
    lvl.size = 0
    if (up.size >= k) compact(i + 1)
  }

  /** Mergeable by construction: concatenate level-wise, then re-compact
    * any overfull level bottom-up. Only sketches (≤ k·levels doubles)
    * ever move — this is what crosses Spark's partial-agg shuffle.
    */
  def merge(other: KllState): Unit = {
    var i = 0
    while (i < other.levels.length) {
      ensureLevel(i)
      levels(i).addAll(other.levels(i).items, other.levels(i).size)
      i += 1
    }
    totalN += other.totalN
    i = 0
    while (i < levels.length) {
      if (levels(i).size >= k) compact(i)
      i += 1
    }
  }

  /** Quantile estimates at the requested fractions: sort the weighted
    * items once, then answer each q as "first value whose cumulative
    * weight ≥ ceil(q·n)" (lower/disc semantics — exact-rank arithmetic
    * in exact mode; both sides of the gate compute ceil in IEEE double).
    */
  def quantiles(qs: Array[Double]): Array[Double] = {
    if (totalN == 0) return qs.map(_ => Double.NaN)
    var m = 0
    levels.foreach(l => m += l.size)
    val vals = new Array[Double](m)
    val wts = new Array[Long](m)
    var p = 0
    var i = 0
    while (i < levels.length) {
      val l = levels(i)
      var j = 0
      while (j < l.size) { vals(p) = l.items(j); wts(p) = 1L << i; p += 1; j += 1 }
      i += 1
    }
    // indirect sort by value, carrying weights
    val idx = Array.range(0, m).sortBy(vals)
    qs.map { q =>
      val target = math.max(1L, math.ceil(q * totalN.toDouble).toLong)
      var cum = 0L
      var r = 0
      var out = vals(idx(m - 1))
      var done = false
      while (r < m && !done) {
        cum += wts(idx(r))
        if (cum >= target) { out = vals(idx(r)); done = true }
        r += 1
      }
      out
    }
  }

  def serializedSize: Int = {
    var n = 4 + 8 + 4 // k, totalN, numLevels
    levels.foreach(l => n += 8 + 8 * l.size) // size+parity, items
    n
  }
}

/** `graft_kll_quantiles(child, quantiles, k)` — see [[KllState]].
  * `quantiles` and `k` must be foldable (literals).
  */
case class KllQuantiles(
    child: Expression,
    quantilesExpr: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllState] {

  override lazy val resolved: Boolean = {
    childrenResolved &&
      child.dataType == DoubleType &&
      quantilesExpr.foldable && kExpr.foldable &&
      (quantilesExpr.dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      })
  }

  private lazy val qs: Array[Double] = {
    val arr = quantilesExpr.eval().asInstanceOf[ArrayData].toDoubleArray()
    require(arr.nonEmpty && arr.forall(q => q >= 0.0 && q <= 1.0),
      "graft_kll_quantiles: quantiles must be within [0, 1]")
    arr
  }
  private lazy val k: Int = {
    val v = kExpr.eval().asInstanceOf[Number].intValue()
    require(v >= 8, s"graft_kll_quantiles: k must be >= 8, got $v")
    v
  }

  override def children: Seq[Expression] = Seq(child, quantilesExpr, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_kll_quantiles"

  override def createAggregationBuffer(): KllState = new KllState(k)

  override def update(buffer: KllState, input: InternalRow): KllState = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: KllState, input: KllState): KllState = {
    buffer.merge(input)
    buffer
  }

  override def eval(buffer: KllState): Any =
    new GenericArrayData(buffer.quantiles(qs))

  override def serialize(buffer: KllState): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.serializedSize)
    bb.putInt(buffer.k)
    bb.putLong(buffer.totalN)
    bb.putInt(buffer.levels.length)
    var i = 0
    while (i < buffer.levels.length) {
      val l = buffer.levels(i)
      bb.putInt(l.size)
      bb.putInt(buffer.parity(i))
      var j = 0
      while (j < l.size) { bb.putDouble(l.items(j)); j += 1 }
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KllState = {
    val bb = ByteBuffer.wrap(bytes)
    val st = new KllState(bb.getInt)
    st.totalN = bb.getLong
    val nLevels = bb.getInt
    var i = 0
    while (i < nLevels) {
      val size = bb.getInt
      val par = bb.getInt
      while (st.levels.length <= i) {
        st.levels += new KllState.Level(math.max(size, 8))
        st.parity += 0
      }
      st.parity(i) = par
      var j = 0
      while (j < size) { st.levels(i).add(bb.getDouble); j += 1 }
      i += 1
    }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllQuantiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllQuantiles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllQuantiles =
    copy(child = newChildren(0), quantilesExpr = newChildren(1), kExpr = newChildren(2))
}

/** Shared wire format for persisted sketches (the [[KllQuantiles]]
  * serde, byte-for-byte): build per-shard sketches with
  * [[KllSketchBytes]], store the binary column anywhere (parquet, a
  * stream sink, a metrics table), and answer quantiles over any slice
  * later with [[KllMergeQuantiles]] — no re-scan of the raw data. This
  * is the 100 TB monitoring loop: profile each ingest shard once,
  * merge profiles forever.
  */
private[graft] object KllWire {
  def write(st: KllState): Array[Byte] =
    KllQuantiles(Literal0, Literal0, Literal0).serialize(st)
  def read(bytes: Array[Byte]): KllState =
    KllQuantiles(Literal0, Literal0, Literal0).deserialize(bytes)
  // serde never touches the children; any literal works as placeholder
  private val Literal0 =
    org.apache.spark.sql.catalyst.expressions.Literal(0)
}

/** `graft_kll_sketch(value, k)` → binary: the serialized sketch. */
case class KllSketchBytes(
    child: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllState] {

  override lazy val resolved: Boolean =
    childrenResolved && child.dataType == DoubleType && kExpr.foldable

  private lazy val k: Int = {
    val v = kExpr.eval().asInstanceOf[Number].intValue()
    require(v >= 8, s"graft_kll_sketch: k must be >= 8, got $v")
    v
  }

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_kll_sketch"

  override def createAggregationBuffer(): KllState = new KllState(k)
  override def update(buffer: KllState, input: InternalRow): KllState = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }
  override def merge(buffer: KllState, input: KllState): KllState = {
    buffer.merge(input)
    buffer
  }
  override def eval(buffer: KllState): Any = KllWire.write(buffer)
  override def serialize(buffer: KllState): Array[Byte] = KllWire.write(buffer)
  override def deserialize(bytes: Array[Byte]): KllState = KllWire.read(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchBytes =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchBytes =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllSketchBytes =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

/** Mutable holder: the merge buffer adopts the k of the first sketch it
  * sees (persisted sketches carry their own k).
  */
final class KllMergeBuffer(var st: KllState)

/** `graft_kll_merge(sketch_binary, quantiles)` → array<double>:
  * merge persisted sketches, then answer the quantiles.
  */
case class KllMergeQuantiles(
    child: Expression,
    quantilesExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllMergeBuffer] {

  override lazy val resolved: Boolean =
    childrenResolved && child.dataType == BinaryType &&
      quantilesExpr.foldable &&
      (quantilesExpr.dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      })

  private lazy val qs: Array[Double] = {
    val arr = quantilesExpr.eval().asInstanceOf[ArrayData].toDoubleArray()
    require(arr.nonEmpty && arr.forall(q => q >= 0.0 && q <= 1.0),
      "graft_kll_merge: quantiles must be within [0, 1]")
    arr
  }

  override def children: Seq[Expression] = Seq(child, quantilesExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_kll_merge"

  override def createAggregationBuffer(): KllMergeBuffer = new KllMergeBuffer(null)

  private def absorb(buffer: KllMergeBuffer, st: KllState): KllMergeBuffer = {
    if (st != null) {
      if (buffer.st == null) buffer.st = st else buffer.st.merge(st)
    }
    buffer
  }

  override def update(buffer: KllMergeBuffer, input: InternalRow): KllMergeBuffer = {
    val v = child.eval(input)
    if (v == null) buffer
    else absorb(buffer, KllWire.read(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(buffer: KllMergeBuffer, input: KllMergeBuffer): KllMergeBuffer =
    absorb(buffer, input.st)

  override def eval(buffer: KllMergeBuffer): Any =
    new GenericArrayData(
      if (buffer.st == null) qs.map(_ => Double.NaN) else buffer.st.quantiles(qs))

  override def serialize(buffer: KllMergeBuffer): Array[Byte] =
    if (buffer.st == null) Array.emptyByteArray else KllWire.write(buffer.st)
  override def deserialize(bytes: Array[Byte]): KllMergeBuffer =
    new KllMergeBuffer(if (bytes.isEmpty) null else KllWire.read(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeQuantiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeQuantiles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllMergeQuantiles =
    copy(child = newChildren(0), quantilesExpr = newChildren(1))
}
