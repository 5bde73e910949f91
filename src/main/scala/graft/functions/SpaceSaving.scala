package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving frequent-items sketch (Metwally, Agrawal, El Abbadi,
  * "Efficient Computation of Frequent and Top-k Elements in Data
  * Streams", ICDT 2005 — public literature) as a native Catalyst
  * [[TypedImperativeAggregate]]: mergeable top-k with at most
  * `capacity` counters per state, so heavy hitters over a 100 TB key
  * space cost O(capacity) memory per group and only counter maps cross
  * the shuffle — the shape `GROUP BY key ORDER BY count LIMIT k`
  * cannot take when the key cardinality itself is huge.
  *
  * Counter semantics: `cnt` overestimates a tracked item's true
  * frequency by at most its recorded `err` (the evicted minimum at
  * adoption time). EXACT mode — what the DuckDB gate pins — is
  * `capacity ≥ distinct items`: no eviction ever fires, every err is
  * 0, and the result is the literal exact top-k (count desc, item asc
  * tie-break). Approximation guarantees are spec-covered
  * (SpaceSavingSpec): any item with true frequency > n/capacity is
  * guaranteed present (the classic heavy-hitter bound).
  *
  * Merge (Berinde et al. 2010 combination): sum counts/errors of
  * matching items; an item absent from one side picks up that side's
  * maximum possible hidden count (its minimum counter) as additional
  * error; then the combined table is re-truncated to `capacity` by
  * estimated count, folding evicted minima into the survivors' view of
  * min. In exact mode both sides are complete so this degenerates to
  * plain counter addition.
  *
  * SQL surface ([[GraftExtensions]]):
  * `graft_topk(item, k, capacity)` → array<struct<item, cnt>> — the k
  * heaviest counters, (cnt desc, item asc)-ordered.
  */
final class SpaceSavingState(val capacity: Int) {
  // item → (count, err). Deterministic eviction: min count, then max
  // item string (the reverse of the output tie-break, so the KEPT set
  // is the lexicographically smallest among equals).
  val counters = scala.collection.mutable.HashMap.empty[String, (Long, Long)]
  var n: Long = 0L

  def update(item: String): Unit = {
    n += 1
    counters.get(item) match {
      case Some((c, e)) => counters.update(item, (c + 1, e))
      case None if counters.size < capacity => counters.update(item, (1L, 0L))
      case None =>
        // evict the minimum counter; adopt its count as this item's error
        val (evicted, (minC, _)) = minEntryDet()
        counters.remove(evicted)
        counters.update(item, (minC + 1, minC))
    }
  }

  /** Deterministic min: smallest count, ties broken toward evicting the
    * lexicographically LARGEST item (so kept sets are reproducible).
    */
  private def minEntryDet(): (String, (Long, Long)) = {
    var best: (String, (Long, Long)) = null
    counters.foreach { e =>
      if (best == null) best = e
      else {
        val cmp = java.lang.Long.compare(e._2._1, best._2._1)
        if (cmp < 0 || (cmp == 0 && e._1.compareTo(best._1) > 0)) best = e
      }
    }
    best
  }

  def merge(other: SpaceSavingState): Unit = {
    n += other.n
    // a side's minimum counter bounds the count any UNTRACKED item may
    // have accumulated there (0 if the side never filled = never evicted)
    def hidden(st: SpaceSavingState): Long =
      if (st.counters.size < st.capacity) 0L
      else st.counters.valuesIterator.map(_._1).min
    val hideSelf = hidden(this)
    val hideOther = hidden(other)
    val items = counters.keySet ++ other.counters.keySet
    val combined = items.iterator.map { item =>
      val (c1, e1) = counters.getOrElse(item, (hideSelf, hideSelf))
      val (c2, e2) = other.counters.getOrElse(item, (hideOther, hideOther))
      item -> (c1 + c2, e1 + e2)
    }.toSeq
    counters.clear()
    // keep the `capacity` heaviest (count desc, item asc — deterministic)
    combined.sortBy { case (item, (c, _)) => (-c, item) }
      .take(capacity).foreach { case (item, ce) => counters.update(item, ce) }
  }

  /** Top-k by (count desc, item asc). */
  def topK(k: Int): Seq[(String, Long)] =
    counters.toSeq.sortBy { case (item, (c, _)) => (-c, item) }
      .take(k).map { case (item, (c, _)) => (item, c) }
}

/** `graft_topk(item, k, capacity)` — see [[SpaceSavingState]]. */
case class TopKSketch(
    child: Expression,
    kExpr: Expression,
    capacityExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingState] {

  override lazy val resolved: Boolean =
    childrenResolved && child.dataType == StringType &&
      kExpr.foldable && capacityExpr.foldable

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()
  private lazy val capacity: Int = {
    val c = capacityExpr.eval().asInstanceOf[Number].intValue()
    require(c >= 1 && k >= 1 && c >= k,
      s"graft_topk: need capacity >= k >= 1, got k=$k capacity=$c")
    c
  }

  override def children: Seq[Expression] = Seq(child, kExpr, capacityExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType), StructField("cnt", LongType))),
    containsNull = false)
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): SpaceSavingState =
    new SpaceSavingState(capacity)

  override def update(buffer: SpaceSavingState, input: InternalRow): SpaceSavingState = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.toString)
    buffer
  }

  override def merge(buffer: SpaceSavingState, input: SpaceSavingState): SpaceSavingState = {
    buffer.merge(input)
    buffer
  }

  override def eval(buffer: SpaceSavingState): Any =
    new GenericArrayData(buffer.topK(k).map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c)
    })

  override def serialize(buffer: SpaceSavingState): Array[Byte] = {
    val entries = buffer.counters.toSeq
    val encoded = entries.map { case (s, _) => s.getBytes(StandardCharsets.UTF_8) }
    val size = 4 + 8 + 4 + encoded.map(_.length + 4 + 16).sum
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putInt(buffer.capacity)
    bb.putLong(buffer.n)
    bb.putInt(entries.size)
    entries.zip(encoded).foreach { case ((_, (c, e)), bytes) =>
      bb.putInt(bytes.length)
      bb.put(bytes)
      bb.putLong(c)
      bb.putLong(e)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingState = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val st = new SpaceSavingState(bb.getInt)
    st.n = bb.getLong
    val sz = bb.getInt
    var i = 0
    while (i < sz) {
      val len = bb.getInt
      val buf = new Array[Byte](len)
      bb.get(buf)
      val item = new String(buf, StandardCharsets.UTF_8)
      val c = bb.getLong
      val e = bb.getLong
      st.counters.update(item, (c, e))
      i += 1
    }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKSketch =
    copy(child = newChildren(0), kExpr = newChildren(1), capacityExpr = newChildren(2))
}
