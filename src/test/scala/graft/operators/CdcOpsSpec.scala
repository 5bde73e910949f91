package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Warehouse-maintenance verbs (operators/CdcOps.scala): MERGE-style
  * changeset application and the SCD2 interval build.
  */
class CdcOpsSpec extends SparkSpec {
  import spark.implicits._

  test("applyChanges: delete drops, update replaces, insert adds") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (2L, "B", "U"), // update
      (3L, "c", "D"), // delete
      (4L, "d", "I")  // insert
    ).toDF("k", "v", "op")
    val out = CdcOps.applyChanges(base, changes, Seq("k"), "op")
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "a"), (2L, "B"), (4L, "d")))
  }

  test("applyChanges: empty changeset is identity") {
    val base = Seq((1L, "a")).toDF("k", "v")
    val empty = Seq.empty[(Long, String, String)].toDF("k", "v", "op")
    val out = CdcOps.applyChanges(base, empty, Seq("k"), "op")
      .as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "a")))
  }

  test("scd2: runs collapse to versioned intervals, open tail") {
    // key A: attr x,x,y,x over days 1..4 → 3 runs; key B: single run
    val rows = Seq(
      ("A", 1L, "x"), ("A", 2L, "x"), ("A", 3L, "y"), ("A", 4L, "x"),
      ("B", 1L, "z"))
      .toDF("k", "d", "attr")
    val out = CdcOps.scd2(rows, Seq("k"), "d", "attr")
      .orderBy("k", "version")
      .select("k", "version", "attr", "valid_from", "valid_to")
      .as[(String, Long, String, Long, Option[Long])].collect().toSeq
    assert(out == Seq(
      ("A", 1L, "x", 1L, Some(3L)),
      ("A", 2L, "y", 3L, Some(4L)),
      ("A", 3L, "x", 4L, None),
      ("B", 1L, "z", 1L, None)))
  }

  test("incrementalAgg: deltas land on the recompute, groups can die") {
    // base view over {A:(1,10),(2,20)}, {B:(3,30)}
    val baseRows = Seq(("A", 1L, 10L), ("A", 2L, 20L), ("B", 3L, 30L))
      .toDF("g", "k", "v")
    val base = baseRows.groupBy("g")
      .agg(count(lit(1)).as("n"), sum("v").cast("long").as("v"))
    // change: update A/1 to 15, delete B/3 entirely, insert C/4 = 5
    val before = Seq(("A", 10L), ("B", 30L)).toDF("g", "v")
    val after = Seq(("A", 15L), ("C", 5L)).toDF("g", "v")
    val out = CdcOps.incrementalAgg(base, before, after, Seq("g"), "n", Seq("v"))
      .orderBy("g").as[(String, Long, Long)].collect().toSeq
    // recompute over merged rows {A:(15,20)},{C:(5)} — B died
    assert(out == Seq(("A", 2L, 35L), ("C", 1L, 5L)))
  }

  test("theilSen: median slope ignores a single outlier") {
    // y = 2x exactly except one wild point; median pairwise slope = 2
    val pts = Seq((0L, 0L), (1L, 2L), (2L, 4L), (3L, 6L), (4L, 100L))
      .map { case (x, y) => ("s", x, y) }.toDF("k", "x", "y")
    val r = SeriesMiningOps.theilSen(pts, Seq("k"), "x", "y")
      .select("n_pairs", "med_slope").as[(Long, Double)].head()
    assert(r._1 == 10L)
    assert(math.abs(r._2 - 2.0) < 1e-12)
  }
}
