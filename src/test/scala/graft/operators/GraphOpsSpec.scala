package graft.operators

import graft.SparkSpec

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(String, String, Long)], iters: Int = 50) =
    GraphOps.pagerank(edges.toDF("s", "d", "w"), "s", "d", "w", iters = iters)
      .as[(String, Double)].collect().toMap

  test("symmetric cycle converges to the uniform distribution") {
    val r = ranks(Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L)))
    r.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-9, r))
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  test("a sink hub accumulates more mass than its spokes") {
    // Star: three spokes point at hub; hub points back at one spoke.
    val r = ranks(Seq(("s1", "hub", 1L), ("s2", "hub", 1L), ("s3", "hub", 1L),
      ("hub", "s1", 1L)))
    assert(r("hub") > r("s1") && r("s1") > r("s2"))
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  test("dangling mass redistributes (ranks still sum to 1)") {
    // b has no outgoing edges: its mass must teleport, not vanish.
    val r = ranks(Seq(("a", "b", 1L)))
    assert(math.abs(r.values.sum - 1.0) < 1e-9, r)
    assert(r("b") > r("a"))
  }

  test("edge weights shift mass proportionally") {
    val r = ranks(Seq(("a", "b", 9L), ("a", "c", 1L),
      ("b", "a", 1L), ("c", "a", 1L)))
    assert(r("b") > r("c"))
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  // --- connected components / BFS / triangles / degrees ---

  private def edf(edges: Seq[(Long, Long)]) = edges.toDF("s", "d")

  test("connectedComponents: two components, canonical min labels") {
    // path 1-2-3, edge 7-9 (plus direction noise and a self-loop)
    val cc = GraphOps.connectedComponents(
        edf(Seq((2L, 1L), (2L, 3L), (9L, 7L), (3L, 2L), (5L, 5L))), "s", "d")
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("connectedComponents: long chain needs diameter rounds, converges") {
    val chain = (1L until 30L).map(i => (i, i + 1))
    val cc = GraphOps.connectedComponents(edf(chain), "s", "d")
      .as[(Long, Long)].collect().toMap
    assert(cc.size == 30 && cc.values.forall(_ == 1L))
  }

  test("bfsLevels: rank distance on a path, unreached nodes absent") {
    // path 1..6 with seed 3; separate edge 10-11 never reached
    val lv = GraphOps.bfsLevels(
        edf(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (10L, 11L))),
        "s", "d", Seq(3L).toDF("n"), "n")
      .as[(Long, Int)].collect().toMap
    assert(lv == Map(3L -> 0, 2L -> 1, 4L -> 1, 1L -> 2, 5L -> 2, 6L -> 3))
  }

  test("bfsLevels: multi-source takes the nearer seed") {
    val lv = GraphOps.bfsLevels(
        edf(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))),
        "s", "d", Seq(1L, 5L).toDF("n"), "n")
      .as[(Long, Int)].collect().toMap
    assert(lv == Map(1L -> 0, 5L -> 0, 2L -> 1, 4L -> 1, 3L -> 2))
  }

  test("triangleCount: K4 has 4 triangles; adding a pendant changes nothing") {
    val k4 = for {
      a <- 1L to 4L; b <- 1L to 4L if a < b
    } yield (a, b)
    val n = GraphOps.triangleCount(edf(k4 :+ (4L, 99L)), "s", "d")
      .as[Long].head()
    assert(n == 4L)
  }

  test("triangleCount: triangle-free bipartite graph counts zero") {
    val bip = for { a <- 1L to 3L; b <- 10L to 12L } yield (a, b)
    assert(GraphOps.triangleCount(edf(bip), "s", "d").as[Long].head() == 0L)
  }

  test("degreeHistogram on a star") {
    val star = (2L to 6L).map(i => (1L, i))
    val h = GraphOps.degreeHistogram(edf(star), "s", "d")
      .as[(Long, Long)].collect().toMap
    assert(h == Map(5L -> 1L, 1L -> 5L))
  }
}
