package graft.dsl

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, lag}

/** Hand-computed checks for the order-sensitive per-series scans. */
class SeriesScanSpec extends SparkSpec {
  import spark.implicits._

  private def series(rows: (String, Long, Double)*) =
    rows.toDF("key", "t", "v")

  test("ema: SMA seed then exponential (n=3, alpha=0.5)") {
    val df = series(("a", 1, 1.0), ("a", 2, 2.0), ("a", 3, 3.0), ("a", 4, 4.0), ("a", 5, 5.0))
    val out = SeriesScan.ema(df, Seq("key"), "t", "v", 3, "ema")
      .orderBy("t").select("ema").as[Option[Double]].collect()
    assert(out.toSeq == Seq(None, None, Some(2.0), Some(3.0), Some(4.0)))
  }

  test("ema resets per series key") {
    val df = series(("a", 1, 1.0), ("a", 2, 2.0), ("b", 1, 10.0), ("b", 2, 20.0))
    val out = SeriesScan.ema(df, Seq("key"), "t", "v", 2, "ema")
      .orderBy("key", "t").select("key", "ema").collect()
    // n=2: seed at row 2 of each series = mean of first two
    assert(out.map(r => (r.getString(0), Option(r.get(1)))).toSeq ==
      Seq(("a", None), ("a", Some(1.5)), ("b", None), ("b", Some(15.0))))
  }

  test("rsi: all-gains series pins at 100, mixed matches Wilder") {
    val df = series(("a", 1, 1.0), ("a", 2, 2.0), ("a", 3, 4.0), ("a", 4, 3.0))
    val out = SeriesScan.rsi(df, Seq("key"), "t", "v", 2, "rsi")
      .orderBy("t").select("rsi").as[Option[Double]].collect()
    // deltas +1,+2,-1; seed at 3rd row: ag=1.5, al=0 -> 100
    // 4th row: ag=(1.5*1+0)/2=0.75, al=(0+1)/2=0.5 -> 100-100/(1+1.5)=60
    assert(out.toSeq == Seq(None, None, Some(100.0), Some(60.0)))
  }

  test("chande momentum: sliding gain/loss sums") {
    val df = series(("a", 1, 1.0), ("a", 2, 2.0), ("a", 3, 1.0), ("a", 4, 3.0))
    val out = SeriesScan.chandeMomentum(df, Seq("key"), "t", "v", 2, "cmo")
      .orderBy("t").select("cmo").as[Option[Double]].collect()
    // deltas: +1, -1, +2. window2 at row3: (1-1)/(1+1)=0; row4: (2-1)/(2+1)*100
    assert(out(0).isEmpty && out(1).isEmpty)
    assert(out(2).contains(0.0))
    assert(math.abs(out(3).get - 100.0 / 3) < 1e-12)
  }

  test("holt-winters: constant series fits and forecasts exactly") {
    val df = series((0 until 12).map(t => ("a", t.toLong, 7.0)): _*)
    val out = SeriesScan.holtWinters(df, Seq("key"), "t", "v", forecast = 3, m = 4)
      .orderBy("t").collect()
    assert(out.length == 8 + 3) // fitted from row m=4, plus 3 forecasts
    assert(out.forall(_.getDouble(3) == 7.0)) // fitted == constant
    val fc = out.filter(_.getBoolean(4))
    assert(fc.map(_.getLong(1)).toSeq == Seq(12L, 13L, 14L)) // grid continues
    assert(fc.forall(r => r.isNullAt(2))) // forecasts carry no observed value
  }

  test("holt-winters: seasonal+trend forecast tracks the pattern") {
    val season = Array(3.0, -1.0, -2.0, 0.0)
    def v(t: Int) = 10.0 + 0.5 * t + season(t % 4)
    val df = series((0 until 24).map(t => ("a", t.toLong, v(t))): _*)
    val out = SeriesScan.holtWinters(df, Seq("key"), "t", "v",
      forecast = 4, m = 4, alpha = 0.6, beta = 0.3, gamma = 0.4)
      .orderBy("t").collect()
    val fc = out.filter(_.getBoolean(4)).map(r => (r.getLong(1), r.getDouble(3)))
    assert(fc.map(_._1).toSeq == Seq(24L, 25L, 26L, 27L))
    // after 20 fitted steps the model should track the exact pattern closely
    fc.foreach { case (t, f) => assert(math.abs(f - v(t.toInt)) < 0.7, s"t=$t f=$f expected=${v(t.toInt)}") }
    // deterministic across runs
    val again = SeriesScan.holtWinters(df, Seq("key"), "t", "v",
      forecast = 4, m = 4, alpha = 0.6, beta = 0.3, gamma = 0.4)
      .orderBy("t").collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("holt-winters fit: recovers a strongly seasonal series and beats the defaults") {
    // high-α/γ-favoring series: strong season, mild noise-free trend
    val season = Array(5.0, -3.0, -4.0, 2.0)
    def v(t: Int) = 20.0 + 0.25 * t + season(t % 4)
    val df = series((0 until 40).map(t => ("a", t.toLong, v(t))): _*)
    val fit = SeriesScan.holtWintersFit(df, Seq("key"), "t", "v", forecast = 4, m = 4)
      .orderBy("t").collect()
    assert(fit.length == 4)
    assert(fit.map(_.getLong(1)).toSeq == Seq(40L, 41L, 42L, 43L))
    val (a, b, g) = (fit.head.getDouble(3), fit.head.getDouble(4), fit.head.getDouble(5))
    // fitted params sit on the 0.05 lattice within (0, 1)
    Seq(a, b, g).foreach { p =>
      assert(p > 0 && p < 1 && math.abs(p * 100 - math.round(p * 100)) < 1e-9)
      assert(math.round(p * 100) % 5 == 0)
    }
    // the forecast should track the exact generator closely
    fit.foreach { r =>
      assert(math.abs(r.getDouble(2) - v(r.getLong(1).toInt)) < 0.5,
        s"t=${r.getLong(1)} fc=${r.getDouble(2)} expected=${v(r.getLong(1).toInt)}")
    }
    // fitted SSE must not exceed the fixed-default (0.5, 0.1, 0.1) SSE:
    // the default triple is reachable by the schedule (stage1 50 / ±...),
    // and argmin only ever improves on evaluated candidates — recompute
    // the default SSE via the public scan for an independent bound
    val sse = fit.head.getDouble(6)
    val fittedDefault = SeriesScan.holtWinters(df, Seq("key"), "t", "v",
      forecast = 0, m = 4).collect()
    val sseDefault = fittedDefault.map { r =>
      val d = r.getDouble(2) - r.getDouble(3); d * d
    }.sum
    assert(sse <= sseDefault + 1e-9, s"fit sse=$sse default=$sseDefault")
    // deterministic across runs
    val again = SeriesScan.holtWintersFit(df, Seq("key"), "t", "v", forecast = 4, m = 4)
      .orderBy("t").collect()
    assert(fit.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("holt-winters m=0 (Holt linear trend): exact on a linear series") {
    // v(t) = 3 + 2t: level/trend lock on immediately and never drift
    val df = series((0 until 10).map(t => ("a", t.toLong, 3.0 + 2.0 * t)): _*)
    val out = SeriesScan.holtWinters(df, Seq("key"), "t", "v", forecast = 3, m = 0)
      .orderBy("t").collect()
    assert(out.length == 9 + 3) // fitted from row 1, plus 3 forecasts
    out.filterNot(_.getBoolean(4)).foreach { r =>
      assert(r.getDouble(3) == 3.0 + 2.0 * r.getLong(1)) // fitted == truth
    }
    val fc = out.filter(_.getBoolean(4))
    assert(fc.map(_.getLong(1)).toSeq == Seq(10L, 11L, 12L))
    fc.foreach(r => assert(math.abs(r.getDouble(3) - (3.0 + 2.0 * r.getLong(1))) < 1e-9))
  }

  test("holt-winters fit: series shorter than two seasons emits nothing") {
    val df = series((0 until 7).map(t => ("a", t.toLong, t.toDouble)): _*)
    assert(SeriesScan.holtWintersFit(df, Seq("key"), "t", "v", 3, 4).count() == 0)
  }

  test("ungroupedLag matches the global window across many partitions (property)") {
    val rnd = new scala.util.Random(9)
    // deliberately many more partitions than natural splits, with
    // clumped keys so some range partitions come out empty
    val rows = (0 until 500).map(i => (i.toLong * 10 + rnd.nextInt(3), rnd.nextGaussian()))
      .toDF("t", "v").repartition(13)
    val got = SeriesScan.ungroupedLag(rows, "t", Seq("v", "t"), 17)
      .select("t", "v", "_prev_v", "_prev_t")
      .as[(Long, Double, Option[Double], Option[Long])].collect().sortBy(_._1)
    val w = org.apache.spark.sql.expressions.Window.orderBy("t")
    val expect = rows
      .withColumn("_prev_v", lag(col("v"), 1).over(w))
      .withColumn("_prev_t", lag(col("t"), 1).over(w))
      .select("t", "v", "_prev_v", "_prev_t")
      .as[(Long, Double, Option[Double], Option[Long])].collect().sortBy(_._1)
    assert(got.toSeq == expect.toSeq)
    assert(got.head._3.isEmpty) // global first row has no predecessor
  }

  test("ungroupedPrefixSum matches the running window across partitions (property)") {
    val rnd = new scala.util.Random(21)
    val rows = (0 until 400).map(i => (i.toLong, rnd.nextInt(100).toDouble))
      .toDF("t", "v").repartition(9)
    val got = SeriesScan.ungroupedPrefixSum(rows, "t", "v", "cs", 7)
      .select("t", "cs").as[(Long, Double)].collect().sortBy(_._1)
    val w = org.apache.spark.sql.expressions.Window.orderBy("t")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val expect = rows.withColumn("cs", org.apache.spark.sql.functions.sum(col("v")).over(w))
      .select("t", "cs").as[(Long, Double)].collect().sortBy(_._1)
    // integer-valued doubles: exact equality holds despite the
    // boundary-regrouped additions
    assert(got.toSeq == expect.toSeq)
  }

  test("ungroupedEma matches the single-task scan across partitions (property)") {
    val rnd = new scala.util.Random(33)
    // nulls interleaved; n=25 makes the SMA warm-up span several of the
    // 17 range partitions, exercising the driver's cross-partition seed
    // replay; affine re-association may differ by ulps, so compare at 1e-9
    val rows = (0 until 400).map(i =>
      (i.toLong, if (rnd.nextInt(10) == 0) None else Some(rnd.nextGaussian() * 50)))
      .toDF("t", "v").repartition(13)
    for (n <- Seq(1, 3, 25)) {
      val got = SeriesScan.ungroupedEma(rows, "t", "v", n, "ema", 17)
        .select("t", "ema").as[(Long, Option[Double])].collect().sortBy(_._1)
      val expect = SeriesScan.emaSingleSeries(rows, Nil, "t", "v", n, "ema")
        .select("t", "ema").as[(Long, Option[Double])].collect().sortBy(_._1)
      assert(got.length == expect.length, s"n=$n")
      got.zip(expect).foreach { case ((t1, g), (t2, e)) =>
        assert(t1 == t2, s"n=$n")
        (g, e) match {
          case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-9, s"n=$n t=$t1: $a vs $b")
          case (a, b) => assert(a == b, s"n=$n t=$t1")
        }
      }
    }
  }

  test("ungroupedEma: series shorter than n emits only nulls") {
    val rows = (0 until 5).map(i => (i.toLong, i.toDouble)).toDF("t", "v")
    val got = SeriesScan.ungroupedEma(rows, "t", "v", 9, "ema", 4)
      .select("ema").as[Option[Double]].collect()
    assert(got.forall(_.isEmpty) && got.length == 5)
  }

  test("ungroupedMovingAvg matches the global window across partitions (property)") {
    val rnd = new scala.util.Random(44)
    val rows = (0 until 400).map(i =>
      (i.toLong, if (rnd.nextInt(8) == 0) None else Some(rnd.nextInt(100).toDouble)))
      .toDF("t", "v").repartition(11)
    for ((n, strict) <- Seq((1, true), (4, true), (4, false), (30, false))) {
      val got = SeriesScan.ungroupedMovingAvg(rows, "t", "v", n, "ma",
        requireAllNonNull = strict, 17)
        .select("t", "ma").as[(Long, Option[Double])].collect().sortBy(_._1)
      val w = org.apache.spark.sql.expressions.Window.orderBy("t").rowsBetween(-(n - 1), 0)
      val base = rows
        .withColumn("ma", org.apache.spark.sql.functions.avg(col("v")).over(w))
        .withColumn("_rows", org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).over(w))
        .withColumn("_nn", org.apache.spark.sql.functions.count(col("v")).over(w))
      val filtered = if (strict) base.filter(col("_nn") === n) else base.filter(col("_rows") === n)
      val expect = filtered.select("t", "ma")
        .as[(Long, Option[Double])].collect().sortBy(_._1)
      assert(got.length == expect.length, s"n=$n strict=$strict")
      got.zip(expect).foreach { case ((t1, g), (t2, e)) =>
        assert(t1 == t2 && ((g.isEmpty && e.isEmpty) ||
          math.abs(g.get - e.get) < 1e-9), s"n=$n strict=$strict t=$t1: $g vs $e")
      }
    }
  }

  test("null values pass through without touching state") {
    val df = Seq(("a", 1L, Some(1.0)), ("a", 2L, None), ("a", 3L, Some(2.0)), ("a", 4L, Some(3.0)))
      .toDF("key", "t", "v")
    val out = SeriesScan.ema(df, Seq("key"), "t", "v", 2, "ema")
      .orderBy("t").select("ema").as[Option[Double]].collect()
    assert(out.toSeq == Seq(None, None, Some(1.5), Some(2.5)))
  }
}
