package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Binned range join (operators/RangeJoin.scala): equality with the
  * brute-force cross-filter on adversarial axes, and the plan contract
  * — an equi-join on the bin key, never a CartesianProduct.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("matches brute force incl. negative axes, boundaries, empty intervals") {
    // points across zero; width 10 exercises negative-floor binning
    val points = (-25L to 25L).map(p => (p, s"p$p")).toDF("x", "pv")
    val intervals = Seq(
      (-22L, -3L, "a"),   // negative span
      (-5L, 7L, "b"),     // crosses zero
      (7L, 7L, "empty"),  // empty: end == start → matches nothing
      (10L, 11L, "tiny"), // single point: only x = 10
      (20L, 40L, "tail")).toDF("s", "e", "iv")
    val got = RangeJoin.binnedRangeJoin(
      points, intervals, col("x"), col("s"), col("e"), width = 10L)
      .select("x", "iv").as[(Long, String)].collect().toSet
    val want = (for {
      p <- -25L to 25L
      (s, e, n) <- Seq((-22L, -3L, "a"), (-5L, 7L, "b"), (7L, 7L, "empty"),
        (10L, 11L, "tiny"), (20L, 40L, "tail"))
      if p >= s && p < e
    } yield (p, n)).toSet
    assert(got == want)
    assert(!got.exists(_._2 == "empty"))
  }

  test("epoch-ns axis stays integer-exact (beyond double precision)") {
    // 2024 epoch ns ≈ 1.7e18: a double-rounded floor-div would misbin
    val t0 = 1705276800L * 1000000000L
    val points = Seq((t0 + 1L, "in"), (t0 - 1L, "before"),
      (t0 + 3600L * 1000000000L, "at-end")).toDF("t", "pv")
    val intervals = Seq((t0, t0 + 3600L * 1000000000L, "hour")).toDF("s", "e", "iv")
    val got = RangeJoin.binnedRangeJoin(
      points, intervals, col("t"), col("s"), col("e"),
      width = 60L * 1000000000L)
      .select("pv").as[String].collect().toSet
    assert(got == Set("in")) // end is exclusive; before-start excluded
  }

  test("plans an equi-join on the bin key, never a cartesian") {
    val points = spark.range(0, 1000).select(col("id").as("x"))
    val intervals = spark.range(0, 100)
      .select((col("id") * 10).as("s"), (col("id") * 10 + 5).as("e"))
    val joined = RangeJoin.binnedRangeJoin(
      points, intervals, col("x"), col("s"), col("e"), width = 10L)
    val plan = joined.queryExecution.executedPlan.toString
    assert(graft.tools.PlanGate.cartesianProducts(plan) == 0, plan)
    assert(joined.count() == 500) // 5 of every 10 ids fall in an interval
  }

  test("width contract raises") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      RangeJoin.binnedRangeJoin(df, df, col("a"), col("a"), col("b"), 0L)
    }
  }
}
