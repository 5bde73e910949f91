package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Semantic checks for SeriesMiningOps against hand-computable
  * fixtures (the DuckDB hash gates cover the events-table scale; here
  * we pin the math on series small enough to verify by hand).
  */
class SeriesMiningSpec extends SparkSpec {
  import spark.implicits._

  test("acf of a constant-increment ramp matches the closed form") {
    // v = 0..9: acf(k) = sum((v_t-mu)(v_{t-k}-mu)) / sum((v-mu)^2),
    // computable directly; cross-check the operator's exact-sum form.
    val n = 10
    val vs = (0 until n).map(_.toDouble)
    val df = vs.zipWithIndex.map { case (v, i) => ("s", i.toLong, v) }
      .toDF("k", "t", "v")
    val got = SeriesMiningOps.acf(df, Seq("k"), Seq("t"), "v", maxLag = 3)
      .orderBy("lag").select("lag", "acf").as[(Int, Double)].collect()
    val mu = vs.sum / n
    val denom = vs.map(v => (v - mu) * (v - mu)).sum
    for (k <- 1 to 3) {
      val numer = (k until n).map(t => (vs(t) - mu) * (vs(t - k) - mu)).sum
      assert(math.abs(got(k - 1)._2 - numer / denom) < 1e-9,
        s"acf($k): got ${got(k - 1)._2}, want ${numer / denom}")
    }
    // Ramp autocorrelation decays with lag but stays positive.
    assert(got.map(_._2).sliding(2).forall(p => p(0) > p(1)) && got.last._2 > 0)
  }

  test("crossCorrelation finds the planted lag") {
    // y is x shifted by +2 steps: ccf peaks (exactly 1.0) at lag 2.
    val xs = (0 until 50).map(i => (i.toLong, math.sin(i * 0.7) * 10))
    val x = xs.toDF("i", "v")
    val y = xs.map { case (i, v) => (i + 2, v) }.toDF("i", "v")
    val got = SeriesMiningOps.crossCorrelation(x, y, "i", "v", Seq(-2, 0, 2, 4))
      .select("lag", "ccf").as[(Long, Double)].collect().toMap
    assert(math.abs(got(2L) - 1.0) < 1e-9, s"planted lag: ${got(2L)}")
    // A sinusoid's ccf is itself sinusoidal (≈cos(0.7·(L−2))): other
    // lags stay strictly below the perfect-alignment peak.
    assert(got.filterNot(_._1 == 2L).values.forall(_ < 1.0 - 1e-6))
  }

  test("sax maps a two-level series to the extreme symbols") {
    // First half at -1, second half at +1 (after z-norm): segments of
    // the low half are all 'a'..'b' region, high half 'c'..'d'.
    val df = (0 until 64).map(i => ("s", i.toLong, if (i < 32) 0.0 else 10.0))
      .toDF("k", "p", "v")
    val rows = SeriesMiningOps.sax(df, Seq("k"), "p", "v", segments = 8)
      .orderBy("segment").select("symbol", "paa").as[(String, Double)].collect()
    assert(rows.length == 8)
    assert(rows.take(4).forall(_._1 == "a"), rows.mkString(","))
    assert(rows.drop(4).forall(_._1 == "d"), rows.mkString(","))
    // z-scores of a ±1 two-level series are exactly ∓1.
    rows.foreach { case (_, paa) => assert(math.abs(math.abs(paa) - 1.0) < 1e-9) }
  }

  test("linearForecast recovers an exact linear trend") {
    val df = (0 until 20).map(i => ("s", (100 + i).toLong, 3.0 * i + 7.0))
      .toDF("k", "h", "v")
    val rows = SeriesMiningOps.linearForecast(df, Seq("k"), "h", "v", horizon = 3)
      .orderBy("step").select("step", "slope", "intercept", "yhat")
      .as[(Long, Double, Double, Double)].collect()
    assert(rows.length == 3)
    rows.foreach { case (s, slope, icept, yhat) =>
      assert(math.abs(slope - 3.0) < 1e-9)
      assert(math.abs(icept - 7.0) < 1e-9)
      assert(math.abs(yhat - (3.0 * (19 + s) + 7.0)) < 1e-9)
    }
  }

  test("changepoints finds planted level shifts at depth 1 and 2") {
    // 0..29 at level 0, 30..59 at 100, 60..89 at 200: the global best
    // split is one of the two shift points, and depth 2 finds the other.
    val df = (0 until 90).map { i =>
      ("s", i.toLong, if (i < 30) 0L else if (i < 60) 100L else 200L)
    }.toDF("k", "p", "v")
    val rows = SeriesMiningOps.changepoints(df, Seq("k"), "p", "v")
      .select("depth", "t", "cost").as[(Long, Long, Double)].collect()
    val ts = rows.map(_._2).toSet
    assert(ts.contains(30L) && ts.contains(60L), s"splits: ${rows.mkString(",")}")
    // Depth-1 split on piecewise-constant data has zero within-segment
    // variance on one side; total cost strictly decreases with depth.
    val d1 = rows.find(_._1 == 1L).get
    assert(rows.filter(_._1 == 2L).forall(_._3 <= d1._3 + 1e-9))
  }

  test("changepoints argmin tie-break is the smallest t") {
    // A flat series: every split has identical (zero) cost; the
    // deterministic contract picks t = 1 everywhere.
    val df = (0 until 10).map(i => ("s", i.toLong, 5L)).toDF("k", "p", "v")
    val d1 = SeriesMiningOps.changepoints(df, Seq("k"), "p", "v")
      .where(col("depth") === 1).select("t").as[Long].head()
    assert(d1 == 1L)
  }

  test("iqrOutliers flags exactly the planted extremes") {
    val base = (1 to 100).map(_.toDouble) // q1=25.75, q3=75.25, iqr=49.5
    val data = base ++ Seq(-100.0, 500.0, 501.0)
    val df = data.map(("s", _)).toDF("k", "v")
    val r = SeriesMiningOps.iqrOutliers(df, Seq("k"), "v")
      .select("n", "n_low", "n_high", "lo", "hi")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(r._1 == 103 && r._2 >= 1 && r._3 >= 2)
    assert(r._4 < 1.0 && r._5 > 100.0 && r._5 < 500.0)
  }

  test("olsBacktest: perfect linear series scores zero error, MASE = 0") {
    // y = 10x on positions 0..11, train 8, eval 4 → exact fit
    val pts = (0L until 12L).map(i => ("s", i, 10L * i)).toDF("k", "p", "v")
    val r = SeriesMiningOps.olsBacktest(pts, Seq("k"), "p", "v", 8, 4)
      .select("n_eval", "mae", "smape", "mase")
      .as[(Long, Double, Double, Double)].head()
    assert(r._1 == 4L)
    assert(math.abs(r._2) < 1e-9 && math.abs(r._3) < 1e-9 && math.abs(r._4) < 1e-9)
  }

  test("olsBacktest: constant-with-jump eval gives the jump as MAE") {
    // train flat 100 (naive MAE 0? no — deltas all 0 → naive_mae 0 →
    // MASE div0; use a train with one step so naive_mae = 2)
    val train = Seq(0L, 1L, 2L, 3L).map(i => ("s", i, 100L + (i % 2) * 4L))
    // train values 100,104,100,104: OLS slope ~0.8 — compute expected
    // directly from the closed form instead of hand-waving
    val ev = Seq(4L, 5L).map(i => ("s", i, 200L))
    val df = (train ++ ev).toDF("k", "p", "v")
    val out = SeriesMiningOps.olsBacktest(df, Seq("k"), "p", "v", 4, 2)
      .select("n_eval", "mae", "mase").as[(Long, Double, Double)].head()
    // closed form on train: n=4, sx=6, sy=408, sxy=616, sxx=14
    val slope = (4.0 * 616 - 6 * 408) / (4.0 * 14 - 36)
    val icept = (408 - slope * 6) / 4
    val mae = (math.abs(200 - (icept + slope * 4)) + math.abs(200 - (icept + slope * 5))) / 2
    val naive = (4.0 + 4.0 + 4.0) / 3
    assert(out._1 == 2L)
    assert(math.abs(out._2 - mae) < 1e-9)
    assert(math.abs(out._3 - mae / naive) < 1e-9)
  }

  test("dtwBanded: known alignments, band cutoff, disconnection") {
    // identical series → 0
    assert(SeriesMiningOps.dtwBanded(Array(1L, 2L, 3L), Array(1L, 2L, 3L), 2) == 0L)
    // A=[1,2,3] vs B=[1,3]: optimal warp cost 1 (classic toy)
    assert(SeriesMiningOps.dtwBanded(Array(1L, 2L, 3L), Array(1L, 3L), 2) == 1L)
    // time-shifted copy aligns at cost of the two edge cells only:
    // A=[0,0,5,5], B=[0,5,5,5] → dtw 0? path exists matching all equal
    assert(SeriesMiningOps.dtwBanded(Array(0L, 0L, 5L, 5L), Array(0L, 5L, 5L, 5L), 3) == 0L)
    // band too narrow for the length gap → disconnected
    assert(SeriesMiningOps.dtwBanded(Array(1L, 2L, 3L, 4L, 5L), Array(1L), 2) == -1L)
    // band 0 = lockstep (L1 distance)
    assert(SeriesMiningOps.dtwBanded(Array(1L, 5L), Array(2L, 3L), 0) == 3L)
  }

  test("dtwPairs: frame surface matches the scalar DP") {
    val rows = Seq(
      ("a", 0L, 1L), ("a", 1L, 2L), ("a", 2L, 3L),
      ("b", 0L, 1L), ("b", 1L, 3L), ("b", 2L, 3L),
      ("c", 0L, 9L), ("c", 1L, 9L), ("c", 2L, 9L))
      .toDF("k", "pos", "cents")
    val out = SeriesMiningOps.dtwPairs(rows, "k", "pos", "cents", band = 2)
      .orderBy("key_a", "key_b")
      .as[(String, String, Long)].collect().toSeq
    val ab = SeriesMiningOps.dtwBanded(Array(1L, 2L, 3L), Array(1L, 3L, 3L), 2)
    val ac = SeriesMiningOps.dtwBanded(Array(1L, 2L, 3L), Array(9L, 9L, 9L), 2)
    val bc = SeriesMiningOps.dtwBanded(Array(1L, 3L, 3L), Array(9L, 9L, 9L), 2)
    assert(out == Seq(("a", "b", ab), ("a", "c", ac), ("b", "c", bc)))
  }
}
