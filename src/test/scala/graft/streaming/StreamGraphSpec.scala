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

  test("fold order never changes the final assignment") {
    val edges = Seq((1L, 2L), (2L, 3L), (7L, 8L), (8L, 9L), (3L, 7L), (20L, 21L))
    val a = fold(Seq(edges.take(2), edges.slice(2, 4), edges.drop(4)))
    val b = fold(Seq(edges.drop(4), edges.take(2), edges.slice(2, 4)))
    val c = fold(Seq(edges)) // single batch ≡ pure batch CC
    assert(a == c && b == c)
    assert(c(9L) == 1L && c(21L) == 20L)
  }
}
