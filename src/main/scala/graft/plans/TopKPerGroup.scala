package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Cast, Expression, GenericInternalRow, JoinedRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Per-group top-k as a FIRST-CLASS physical operator — the whole
  * custom-plan stack (LogicalPlan node → SparkStrategy → SparkPlan),
  * registered through SparkSessionExtensions.injectPlannerStrategy.
  *
  * Why Spark's built-ins can't express this efficiently: the standard
  * formulation — `row_number() OVER (PARTITION BY g ORDER BY v) <= k`
  * — plans a WindowExec, which SORTS every partition's full contents
  * (O(n log n) per partition, plus sort spill pressure) only to throw
  * away everything past rank k. This operator keeps a bounded k-entry
  * selection per group (O(n log k), memory O(groups·k) independent of
  * group size) after the same single ClusteredDistribution shuffle the
  * window needs — at 100 TB the difference is "sort a terabyte
  * partition" vs "stream it through 3-entry heaps".
  *
  * Scope (deliberate): order column cast to double, a caller-named
  * unique tie-break column cast to long (total order ⇒ deterministic
  * output, same contract the gate oracles use), rank appended 1..k.
  * Rows with a NULL order value are dropped (they cannot rank).
  * Equality with the window formulation — including tie behavior —
  * is spec-pinned, and the `topk_native` gate hash-checks it against
  * the DuckDB oracle.
  */
case class TopKPerGroupNode(
    groupExprs: Seq[Expression],
    orderExpr: Expression,
    tieExpr: Expression,
    k: Int,
    desc: Boolean,
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rank is born here, not derived from the child
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

/** Planner strategy: one logical node, one exec node. */
object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: TopKPerGroupNode =>
      TopKPerGroupExec(n.groupExprs, n.orderExpr, n.tieExpr, n.k, n.desc,
        n.rankAttr, planLater(n.child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    orderExpr: Expression,
    tieExpr: Expression,
    k: Int,
    desc: Boolean,
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)

  /** The same distribution a window would demand — and because the
    * operator only needs co-location, Catalyst reuses an existing
    * hash partitioning on the group key instead of re-shuffling.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    if (groupExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override def outputPartitioning = child.outputPartitioning

  private final class Entry(val ord: Double, val tie: Long, val row: InternalRow)

  override protected def doExecute(): RDD[InternalRow] = {
    val (groupE, ordE, tieE, kk, isDesc) = (groupExprs, orderExpr, tieExpr, k, desc)
    val childOutput = child.output
    val outputAttrs = output
    // (mapPartitions, not the spark-private mapPartitionsInternal —
    // closure cleaning on this static closure is a one-time cost)
    child.execute().mapPartitions { iter =>
      val groupProj = UnsafeProjection.create(groupE, childOutput)
      // codegen'd projection for (ord, tie): primitive reads off an
      // UnsafeRow, no per-row boxing in the hot loop
      val ordTieProj = UnsafeProjection.create(Seq(ordE, tieE), childOutput)
      // "worst kept entry first" ordering: PriorityQueue surfaces the
      // entry a better candidate should evict. sortVal folds asc/desc
      // into one comparison (asc = negated values).
      val worstFirst: Ordering[Entry] = (a: Entry, b: Entry) => {
        val c = java.lang.Double.compare(b.ord, a.ord) // smaller ord = worse = higher priority
        if (c != 0) c else java.lang.Long.compare(a.tie, b.tie) // larger tie = worse
      }
      val heaps = scala.collection.mutable.HashMap.empty[UnsafeRow, scala.collection.mutable.PriorityQueue[Entry]]
      while (iter.hasNext) {
        val row = iter.next()
        val ot = ordTieProj(row)
        if (!ot.isNullAt(0)) { // NULL order can't rank; drop (documented)
          val ord0 = ot.getDouble(0)
          val ord = if (isDesc) ord0 else -ord0
          val tie = ot.getLong(1)
          val key = groupProj(row)
          var heap = heaps.getOrElse(key, null)
          if (heap == null) {
            heap = scala.collection.mutable.PriorityQueue.empty[Entry](worstFirst)
            heaps.put(key.copy(), heap) // the projection buffer is reused — copy on insert
          }
          if (heap.size < kk) {
            heap.enqueue(new Entry(ord, tie, row.copy()))
          } else {
            val worst = heap.head
            if (ord > worst.ord || (ord == worst.ord && tie < worst.tie)) {
              heap.dequeue()
              heap.enqueue(new Entry(ord, tie, row.copy()))
            }
          }
        }
      }
      val toUnsafe = UnsafeProjection.create(outputAttrs.map(_.dataType).toArray)
      heaps.iterator.flatMap { case (_, heap) =>
        val best = heap.dequeueAll.reverse // dequeueAll = worst→best; reverse
        val joined = new JoinedRow
        best.iterator.zipWithIndex.map { case (e, i) =>
          toUnsafe(joined(e.row, new GenericInternalRow(Array[Any](i + 1))))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Public entry: `TopKPerGroup(df, groups, order, tie, k)` — resolves
  * columns against the analyzed child and wraps the custom node back
  * into a DataFrame (the one `private[sql]` crossing, via Bridge).
  */
object TopKPerGroup {
  def apply(df: DataFrame, groupCols: Seq[String], orderCol: String,
            tieCol: String, k: Int, desc: Boolean = true,
            rankName: String = "rank"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute = analyzed.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"TopKPerGroup: no column '$n' in ${analyzed.output.map(_.name).mkString(", ")}"))
    val node = TopKPerGroupNode(
      groupCols.map(attr),
      Cast(attr(orderCol), DoubleType),
      Cast(attr(tieCol), LongType),
      k, desc,
      AttributeReference(rankName, IntegerType, nullable = false)(),
      analyzed)
    org.apache.spark.sql.graft.Bridge.ofRows(df.sparkSession, node)
  }
}
