package graft.streaming

import graft.llmops.DedupOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Incremental connected components over an EDGE STREAM — the
  * streaming twin of the batch large-star/small-star CC
  * ([[DedupOps.connectedComponents]]), on the persisted-index shape
  * every other streaming dedup stage here uses ([[StreamDedup]]): the
  * corpus-scale state lives in a parquet assignment index, and each
  * micro-batch touches only batch-bounded frames.
  *
  * Per batch, inside `foreachBatch`:
  *  1. CONTRACT the batch's edges through the current index — each
  *     endpoint replaced by its component id (itself if unseen). Two
  *     batch-side lookups against the index; the index never
  *     reshuffles beyond these equi-joins, and a bucketed/broadcast
  *     layout serves them at corpus scale.
  *  2. Run BATCH CC on the contracted edges. The contracted graph is
  *     tiny: its nodes are the touched component ids plus the batch's
  *     new nodes — O(batch), never O(corpus).
  *  3. REMAP: old component ids fold to the merged minimum (component
  *     ids are min node ids, so the min over contracted ids IS the
  *     global min of the merged component — contraction is exact, not
  *     approximate), and new nodes append. The remap table is
  *     O(batch); [[componentsDelta]] returns the (changed, fresh) row
  *     sets so a merge-on-read sink appends only them —
  *     O(batch + touched components) per trigger, never O(corpus).
  *
  * Associativity of component merging makes the fold order-insensitive:
  * after any partition of the edge stream into batches, the final
  * index equals batch CC over the full edge set.
  */
object StreamGraph {

  val indexSchema: StructType = StructType(Seq(
    StructField("id", LongType), StructField("cid", LongType)))

  def emptyIndex(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      indexSchema)

  /** The batch's effect on the index, split for merge-on-read sinks
    * (r13 verdict #4): `changed` = EXISTING index rows whose component
    * id folded into a smaller one (bounded by the touched components'
    * sizes — empty when the batch merges nothing), `fresh` = the
    * batch's genuinely new nodes (O(batch)). A sink appends
    * `changed ∪ fresh` tagged with the batch version and reads back
    * latest-version-per-id — the corpus-sized index is never rewritten.
    */
  final case class IndexDelta(changed: DataFrame, fresh: DataFrame)

  /** One micro-batch fold → [[IndexDelta]]. Columns: index (id, cid);
    * edges (aCol, bCol) castable to long.
    */
  def componentsDelta(index: DataFrame, edges: DataFrame,
      aCol: String, bCol: String): IndexDelta = {
    val idx = index.select(col("id").cast("long").as("id"),
      col("cid").cast("long").as("cid"))
    val e = edges.select(col(aCol).cast("long").as("x"),
      col(bCol).cast("long").as("y"))
    // 1. contract endpoints through the index (unseen → themselves)
    val contracted = e
      .join(idx.select(col("id").as("x"), col("cid").as("cx")), Seq("x"), "left")
      .join(idx.select(col("id").as("y"), col("cid").as("cy")), Seq("y"), "left")
      .select(coalesce(col("cx"), col("x")).as("id_a"),
        coalesce(col("cy"), col("y")).as("id_b"))
    // 2. batch CC on the contracted (batch-bounded) graph
    val merged = DedupOps.connectedComponents(contracted, "id_a", "id_b")
      .select(col("id").as("mid"), col("cluster_id").as("mcid"))
      .localCheckpoint()
    // 3a. existing rows whose component id folded into a smaller one —
    // identity folds (mid == mcid) drop out first, so an all-new or
    // no-merge batch produces an EMPTY changed frame; new-node ids are
    // never index cids (component min-ids are always index members),
    // so the inner join keeps exactly the relabeled corpus rows
    val remap = merged.where(col("mid") =!= col("mcid"))
      .select(col("mid").as("cid"), col("mcid"))
    val changed = idx.join(broadcast(remap), Seq("cid"), "inner")
      .select(col("id"), col("mcid").as("cid"))
    // 3b. the batch's genuinely new nodes (their contracted id is the
    // raw node id; id-not-in-index ⇔ new node)
    val fresh = merged.select(col("mid").as("id"), col("mcid").as("cid"))
      .join(idx.select("id"), Seq("id"), "left_anti")
    IndexDelta(changed, fresh)
  }

  /** One micro-batch fold: assignment index + batch edges → the FULL
    * updated index (id, cid) — the rewrite-everything view, derived
    * from [[componentsDelta]] for sinks without merge-on-read (and for
    * the exactness specs, which compare whole indexes). Scale path:
    * use [[componentsDelta]] and append.
    */
  def componentsBatch(index: DataFrame, edges: DataFrame,
      aCol: String, bCol: String): DataFrame = {
    val idx = index.select(col("id").cast("long").as("id"),
      col("cid").cast("long").as("cid"))
    val d = componentsDelta(idx, edges, aCol, bCol)
    // plain equi-join, NOT broadcast: `changed` is bounded by the
    // touched components' sizes, which a giant-component relabel can
    // push to corpus scale
    val overridden = idx.join(
        d.changed.select(col("id"), col("cid").as("ncid")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("ncid"), col("cid")).as("cid"))
    overridden.unionByName(d.fresh)
  }
}
