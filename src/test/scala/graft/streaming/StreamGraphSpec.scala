package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental CC folds: contraction through the index must merge
  * components across batch boundaries exactly, including the
  * new-node-becomes-the-minimum relabel.
  */
class StreamGraphSpec extends SparkSpec {
  import spark.implicits._

  private def fold(batches: Seq[Seq[(Long, Long)]]) =
    batches.foldLeft(StreamGraph.emptyIndex(spark)) { (idx, edges) =>
      StreamGraph.componentsBatch(idx, edges.toDF("a", "b"), "a", "b")
        .localCheckpoint()
    }.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("components merge across micro-batch boundaries") {
    // (1-2) and (3-4) arrive first as separate components; the bridge
    // (2-3) lands later and must fold both into min-id 1
    val out = fold(Seq(Seq((1L, 2L)), Seq((3L, 4L)), Seq((2L, 3L))))
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("a later new node smaller than the component id relabels it") {
    val out = fold(Seq(Seq((5L, 3L)), Seq((1L, 5L))))
    assert(out == Map(1L -> 1L, 3L -> 1L, 5L -> 1L))
  }

  test("disjoint batches stay disjoint; duplicate edges are no-ops") {
    val out = fold(Seq(Seq((1L, 2L), (10L, 11L)), Seq((1L, 2L), (11L, 10L))))
    assert(out == Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("delta writes are O(batch): untouched corpus rows never rewrite") {
    // batch 1: a 6-node chain — all fresh, nothing changed
    val b1 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val d1 = StreamGraph.componentsDelta(
      StreamGraph.emptyIndex(spark), b1.toDF("a", "b"), "a", "b")
    assert(d1.changed.count() == 0 && d1.fresh.count() == 6)
    val idx1 = StreamGraph.componentsBatch(
      StreamGraph.emptyIndex(spark), b1.toDF("a", "b"), "a", "b").localCheckpoint()

    // batch 2: a DISJOINT pair — 2 fresh rows, the 6-row component
    // untouched (the old full-rewrite path wrote all 8)
    val d2 = StreamGraph.componentsDelta(idx1, Seq((10L, 11L)).toDF("a", "b"), "a", "b")
    assert(d2.changed.count() == 0 && d2.fresh.count() == 2)
    val idx2 = StreamGraph.componentsBatch(idx1, Seq((10L, 11L)).toDF("a", "b"), "a", "b")
      .localCheckpoint()

    // batch 3: a duplicate edge — a complete no-op, ZERO rows written
    val d3 = StreamGraph.componentsDelta(idx2, Seq((2L, 1L)).toDF("a", "b"), "a", "b")
    assert(d3.changed.count() == 0 && d3.fresh.count() == 0)

    // batch 4: a bridge folding {10,11} into component 1 — exactly the
    // 2 rows of the RELABELED component change, nothing else
    val d4 = StreamGraph.componentsDelta(idx2, Seq((6L, 10L)).toDF("a", "b"), "a", "b")
    assert(d4.changed.count() == 2 && d4.fresh.count() == 0)
    assert(d4.changed.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      == Map(10L -> 1L, 11L -> 1L))
  }

  test("append-only delta log (last-write-wins) reconstructs the full index") {
    val batches = Seq(
      Seq((5L, 3L)), Seq((1L, 5L)), Seq((10L, 11L)), Seq((11L, 3L)))
    var log = Seq.empty[((Long, Long), Int)] // ((id, cid), version)
    var full = StreamGraph.emptyIndex(spark)
    batches.zipWithIndex.foreach { case (edges, v) =>
      val d = StreamGraph.componentsDelta(full, edges.toDF("a", "b"), "a", "b")
      log ++= d.changed.unionByName(d.fresh).collect()
        .map(r => (r.getLong(0) -> r.getLong(1)) -> v)
      full = StreamGraph.componentsBatch(full, edges.toDF("a", "b"), "a", "b")
        .localCheckpoint()
    }
    val lww = log.groupBy(_._1._1).map { case (_, vs) => vs.maxBy(_._2)._1 }.toMap
    val direct = full.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lww == direct)
    assert(direct.values.toSet == Set(1L)) // everything folded to min id 1
  }

  test("fold order never changes the final assignment") {
    val edges = Seq((1L, 2L), (2L, 3L), (7L, 8L), (8L, 9L), (3L, 7L), (20L, 21L))
    val a = fold(Seq(edges.take(2), edges.slice(2, 4), edges.drop(4)))
    val b = fold(Seq(edges.drop(4), edges.take(2), edges.slice(2, 4)))
    val c = fold(Seq(edges)) // single batch ≡ pure batch CC
    assert(a == c && b == c)
    assert(c(9L) == 1L && c(21L) == 20L)
  }
}
