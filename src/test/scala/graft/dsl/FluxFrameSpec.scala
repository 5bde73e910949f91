package graft.dsl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Algebraic properties + hand-checks for the Flux verb surface. */
class FluxFrameSpec extends SparkSpec {
  import spark.implicits._

  private def frame(rows: (String, Long, Double)*) =
    FluxFrame(rows.toDF("m", "t", "v"), Seq("m"), "t", "v")

  test("difference ∘ cumulativeSum = identity (from row 2)") {
    val vals = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0)
    val f = frame(vals.zipWithIndex.map { case (v, i) => ("a", i.toLong, v) }: _*)
    val back = f.cumulativeSum(as = "cs")
      .difference(as = "d")
      .toDF.orderBy("t").select("d").as[Double].collect()
    assert(back.toSeq == vals.drop(1))
  }

  test("movingAverage(n) emits only complete windows") {
    val f = frame(("a", 1, 1.0), ("a", 2, 2.0), ("a", 3, 3.0), ("a", 4, 4.0))
    val out = f.movingAverage(3, as = "ma").toDF.orderBy("t").select("ma").as[Double].collect()
    assert(out.toSeq == Seq(2.0, 3.0))
  }

  test("derivative drops first row and honors nonNegative") {
    val f = frame(("a", 0, 10.0), ("a", 10, 20.0), ("a", 20, 5.0))
    val d = f.derivative(1.0, nonNegative = false, as = "d")
      .toDF.orderBy("t").select("d").as[Double].collect()
    assert(d.toSeq == Seq(1.0, -1.5))
    val dn = f.derivative(1.0, nonNegative = true, as = "d")
      .toDF.orderBy("t").select("d").as[Option[Double]].collect()
    assert(dn.toSeq == Seq(Some(1.0), None))
  }

  test("stateCount counts true-runs and resets") {
    val f = frame(("a", 1, 1.0), ("a", 2, 5.0), ("a", 3, 6.0), ("a", 4, 1.0), ("a", 5, 7.0))
    val out = f.stateCount(col("v") > 4, as = "sc").toDF.orderBy("t").select("sc").as[Long].collect()
    assert(out.toSeq == Seq(-1L, 1L, 2L, -1L, 1L))
  }

  test("top/bottom per group with deterministic ties") {
    val f = FluxFrame(
      Seq(("a", 1L, 5.0), ("a", 2L, 9.0), ("a", 3L, 1.0), ("b", 1L, 7.0), ("b", 2L, 2.0))
        .toDF("m", "t", "v"), Seq("m"), "t", "v")
    val top = f.top(1).toDF.select("m", "v").as[(String, Double)].collect().toSet
    assert(top == Set(("a", 9.0), ("b", 7.0)))
    val bot = f.bottom(1).toDF.select("m", "v").as[(String, Double)].collect().toSet
    assert(bot == Set(("a", 1.0), ("b", 2.0)))
  }

  test("aggregateWindow createEmpty emits empty windows, fill plugs them") {
    val rows = Seq(
      ("a", java.sql.Timestamp.valueOf("2024-01-01 00:00:30"), 2.0),
      ("a", java.sql.Timestamp.valueOf("2024-01-01 03:00:30"), 4.0))
    val f = FluxFrame(rows.toDF("m", "ts", "v"), Seq("m"), "ts", "v")
    val out = f.aggregateWindow("1 hour", sum, createEmpty = true, as = "s")
      .fill(0.0)
      .toDF.orderBy("ts").select("s").as[Double].collect()
    assert(out.toSeq == Seq(2.0, 0.0, 0.0, 4.0)) // 4 windows, 2 empty
  }

  test("unique keeps rows whose column value occurs once in the group") {
    val f = FluxFrame(
      Seq(("a", 1L, 1.0), ("a", 2L, 1.0), ("a", 3L, 2.0)).toDF("m", "t", "v"),
      Seq("m"), "t", "v")
    val out = f.unique("v").toDF.select("v").as[Double].collect()
    assert(out.toSeq == Seq(2.0))
  }

  test("calendar windows bucket on epoch-aligned month boundaries") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      ("a", ts("2024-01-15 12:00:00"), 1.0), ("a", ts("2024-02-02 00:00:00"), 2.0),
      ("a", ts("2024-03-31 23:59:59"), 4.0), ("a", ts("2024-04-01 00:00:00"), 8.0))
    val f = FluxFrame(rows.toDF("m", "ts", "v"), Seq("m"), "ts", "v")
    // 1mo: one bucket per calendar month, label = month end (_stop)
    val monthly = f.aggregateWindow("1 months", sum, as = "s").toDF.orderBy("ts")
      .collect().map(r => (r.getAs[java.sql.Timestamp]("ts").toString, r.getAs[Double]("s")))
    assert(monthly.toSeq == Seq(
      ("2024-02-01 00:00:00.0", 1.0), ("2024-03-01 00:00:00.0", 2.0),
      ("2024-04-01 00:00:00.0", 4.0), ("2024-05-01 00:00:00.0", 8.0)))
    // 3mo: epoch-aligned quarters (Jan-Mar / Apr-Jun), not relative to
    // the data's first point
    val quarterly = f.aggregateWindow("3 months", sum, as = "s").toDF.orderBy("ts")
      .collect().map(r => (r.getAs[java.sql.Timestamp]("ts").toString, r.getAs[Double]("s")))
    assert(quarterly.toSeq == Seq(
      ("2024-04-01 00:00:00.0", 7.0), ("2024-07-01 00:00:00.0", 8.0)))
    // unsupported combinations fail loudly, not silently
    intercept[IllegalArgumentException](f.aggregateWindow("1 months", sum, offset = "6 hours"))
    intercept[IllegalArgumentException](f.aggregateWindow("1 months", sum, createEmpty = true))
  }

  test("window offset accepts compound and abbreviated interval spellings") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      ("a", ts("2024-01-01 00:10:00"), 1.0), ("a", ts("2024-01-01 00:40:00"), 2.0),
      ("a", ts("2024-01-01 01:10:00"), 4.0), ("a", ts("2024-01-01 01:40:00"), 8.0))
    val f = FluxFrame(rows.toDF("m", "ts", "v"), Seq("m"), "ts", "v")
    def sums(offset: String): Seq[Double] =
      f.aggregateWindow("1 hour", sum, as = "s", offset = offset).toDF
        .orderBy("ts").select("s").as[Double].collect().toSeq
    val canonical = sums("30 minutes")
    assert(canonical == Seq(1.0, 6.0, 8.0)) // 30m-shifted hour tiles
    // offsets congruent mod every, in spellings Spark's window() itself
    // accepts, must all normalize to the same tiling
    assert(sums("1 hour 30 minutes") == canonical)
    assert(sums("90 min") == canonical)
    assert(sums("30m") == canonical)
    assert(sums("-30 minutes") == canonical) // floorMod: -30m ≡ 30m (mod 1h)
    intercept[IllegalArgumentException](f.aggregateWindow("1 hour", sum, offset = "half past"))
  }

  test("interpolateLinear inserts midpoints on the grid") {
    val rows = Seq(
      ("a", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 0.0),
      ("a", java.sql.Timestamp.valueOf("2024-01-01 00:00:20"), 20.0))
    val f = FluxFrame(rows.toDF("m", "ts", "v"), Seq("m"), "ts", "v")
    val out = f.interpolateLinear(10, as = "iv").toDF.orderBy("ts")
      .collect().map(r => (r.getAs[java.sql.Timestamp]("ts").toString, r.getAs[Double]("iv"))).toSeq
    assert(out == Seq(
      ("2024-01-01 00:00:00.0", 0.0),
      ("2024-01-01 00:00:10.0", 10.0),
      ("2024-01-01 00:00:20.0", 20.0)))
  }

  test("sessionize splits on gap > maxGap, keeps gap == maxGap, per series") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      ("u1", t("2024-01-01 00:00:00"), 1.0),
      ("u1", t("2024-01-01 01:00:00"), 2.0), // gap == 3600s: SAME session
      ("u1", t("2024-01-01 02:00:01"), 3.0), // gap 3601s: NEW session
      ("u2", t("2024-01-01 00:30:00"), 4.0)) // other series: own index
    val f = FluxFrame(rows.toDF("u", "ts", "v"), Seq("u"), "ts", "v")
    val out = f.sessionize(3600, as = "sess").toDF
      .orderBy("u", "ts")
      .collect().map(r => (r.getString(0), r.getAs[Long]("sess"))).toSeq
    assert(out == Seq(("u1", 1L), ("u1", 1L), ("u1", 2L), ("u2", 1L)))
  }

  test("sessionize + per-session aggregate plans exactly one exchange") {
    val df = (1 to 100).map(i => (s"u${i % 5}",
      java.sql.Timestamp.valueOf(s"2024-01-01 00:${i % 60}:00"), i.toDouble))
      .toDF("u", "ts", "v")
    val agg = FluxFrame(df, Seq("u"), "ts", "v").sessionize(600).toDF
      .groupBy("u", "session").agg(count(lit(1)).as("n"))
    // grouping on a superset of the window's partition key must reuse
    // the window's hash partitioning — one shuffle total
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(agg.queryExecution.executedPlan.toString).size
    assert(exchanges == 1, agg.queryExecution.executedPlan.toString)
  }

  test("decompose recovers exact trend/seasonal/residual on planted seasonality") {
    // x_t = 10 + effect[t mod 7], effects sum to zero → a full-period
    // centered MA is EXACTLY 10, seasonal means are EXACTLY the
    // effects, residuals are EXACTLY zero
    val eff = Array(3.0, -1.0, 0.5, -2.0, 1.5, -1.5, -0.5)
    assert(math.abs(eff.sum) == 0.0)
    val rows = (0 until 28).map(t => ("a", t.toLong, 10.0 + eff(t % 7)))
    val out = FluxFrame.of(rows.toDF("k", "t", "v"), "t", "v", "k")
      .decompose(7).toDF
      .orderBy("t")
      .select("t", "trend", "seasonal", "resid")
      .collect()
    // edges (first/last 3 rows) have no full window → null trend/resid
    assert((0 until 3).forall(i => out(i).isNullAt(1)))
    assert((25 until 28).forall(i => out(i).isNullAt(1)))
    (3 until 25).foreach { i =>
      assert(out(i).getDouble(1) == 10.0, s"trend at $i")
      assert(math.abs(out(i).getDouble(3)) < 1e-9, s"resid at $i")
    }
    out.foreach(r =>
      assert(math.abs(r.getDouble(2) - eff((r.getLong(0) % 7).toInt)) < 1e-9))
    // period must be odd
    assertThrows[IllegalArgumentException](
      FluxFrame.of(rows.toDF("k", "t", "v"), "t", "v", "k").decompose(6))
  }
}
