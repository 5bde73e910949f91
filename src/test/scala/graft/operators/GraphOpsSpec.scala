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
}
