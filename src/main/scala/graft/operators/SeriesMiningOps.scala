package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical series-mining verbs over the canonical long table — the
  * layer a monitoring/forecasting dashboard sits on: autocorrelation
  * (ACF), lagged cross-correlation (CCF), SAX symbolization
  * (Lin et al. 2003), least-squares trend + h-step forecast, and
  * binary-segmentation changepoint detection (Scott & Knott 1974
  * lineage; the CROPS/PELT family's depth-bounded ancestor).
  *
  * Determinism discipline (the property every hash gate rests on):
  * every statistic here is derived from SUMS THAT ARE EXACT IN
  * DOUBLES — the test values live on a 10⁻⁴ grid and hourly/series
  * sums stay far below 2⁵³ in grid units, so Σv, Σv², Σv·v_lag are
  * the same bit pattern regardless of Spark's partition-order
  * summation vs DuckDB's sequential fold. The few floating divisions
  * (means, normalizations) are written as the SAME expression shape
  * in engine and oracle, so both engines execute identical IEEE op
  * sequences on identical inputs. Changepoints additionally quantize
  * the series to integers so squared-sum prefixes stay exact.
  *
  * Scale shape: everything is one map-side-combinable aggregation per
  * series (ACF explodes a bounded lag set first — a constant ×maxLag
  * row inflation, not a join), so output rows = series × lags/segments,
  * never corpus rows. The per-series model frames (stats, splits) are
  * broadcast-sized by construction and joined back with broadcast()
  * where a second pass over rows is needed.
  */
object SeriesMiningOps {

  /** Autocorrelation function per series at lags 1..maxLag, computed
    * from exact cross-sums: for lag k, over the m_k overlapping pairs
    * (v_t, v_{t−k}),
    *   acf(k) = (Σ v·v_lag − μ·(Σv + Σv_lag) + m_k·μ²) / (Σv² − (Σv)²/n)
    * with μ = full-series mean — the standard biased estimator
    * normalized by total variance, the form whose every sum is exact
    * on grid data (no per-row FP deviation products whose addition
    * order could differ across engines).
    *
    * One window pass builds the lag columns (bounded: maxLag of them),
    * one explode tags each pair with its k, one groupBy(key, k)
    * aggregates — rows shuffled once, inflation factor = maxLag.
    */
  def acf(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      valueCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val v = col(valueCol)
    val lagged = df.withColumn("__lags", array((1 to maxLag).map(k =>
      struct(lit(k).as("k"), lag(v, k).over(w).as("pv"))): _*))
    val pairs = lagged
      .select((keyCols.map(col) :+ v.as("v") :+ explode(col("__lags")).as("kp")): _*)
      .select((keyCols.map(col) :+ col("v") :+ col("kp.k").as("lag") :+
        col("kp.pv").as("pv")): _*)
      .where(col("pv").isNotNull)
    val cross = pairs.groupBy((keyCols.map(col) :+ col("lag")): _*)
      .agg(sum(col("v") * col("pv")).as("sxy"), sum(col("v")).as("sv"),
        sum(col("pv")).as("spv"), count(lit(1)).as("m"))
    val stats = df.groupBy(keyCols.map(col): _*)
      .agg(count(v).as("n"), sum(v).as("s1"), sum(v * v).as("s2"))
      .withColumn("mu", col("s1") / col("n"))
      .withColumn("denom", col("s2") - col("s1") * col("s1") / col("n"))
    cross.join(broadcast(stats), keyCols)
      .select((keyCols.map(col) :+ col("lag") :+
        ((col("sxy") - col("mu") * (col("sv") + col("spv")) +
          col("m") * col("mu") * col("mu")) / col("denom")).as("acf")): _*)
  }

  /** Lagged cross-correlation between two integer-indexed series
    * (e.g. hourly rollups): for each lag L, Pearson r over the pairs
    * (x_i, y_{i+L}), from the exact-sum closed form
    *   r = (mΣxy − ΣxΣy) / √((mΣx² − (Σx)²)(mΣy² − (Σy)²)).
    * The lag set is a literal array crossed in (constant inflation),
    * the alignment is an equi-join on the shifted index — never a
    * window over an assembled global series.
    */
  def crossCorrelation(x: DataFrame, y: DataFrame, idxCol: String,
      valCol: String, lags: Seq[Int]): DataFrame = {
    val xs = x.select(col(idxCol).as("i"), col(valCol).as("xv"))
    val ys = y.select(col(idxCol).as("j"), col(valCol).as("yv"))
    val lagDf = x.sparkSession.range(1)
      .select(explode(array(lags.map(l => lit(l.toLong)): _*)).as("lag"))
    val pairs = xs
      .crossJoin(broadcast(lagDf))
      .join(ys, col("j") === col("i") + col("lag"))
    pairs.groupBy("lag")
      .agg(count(lit(1)).as("m"), sum("xv").as("sx"), sum("yv").as("sy"),
        sum(col("xv") * col("yv")).as("sxy"),
        sum(col("xv") * col("xv")).as("sxx"),
        sum(col("yv") * col("yv")).as("syy"))
      .select(col("lag"), col("m"),
        ((col("m") * col("sxy") - col("sx") * col("sy")) /
          sqrt((col("m") * col("sxx") - col("sx") * col("sx")) *
            (col("m") * col("syy") - col("sy") * col("sy")))).as("ccf"))
  }

  /** SAX symbolization (Lin et al. 2003): per series, z-normalize, PAA
    * into `segments` equal-count pieces, map each piece mean to a
    * 4-letter alphabet by the standard normal breakpoints ±0.6745, 0
    * (equiprobable under N(0,1)). The z-scored piece mean is computed
    * as ((Σ_seg v)/len − μ)/σ — exact segment sums, one shared μ/σ per
    * series from exact moments — never per-row z-scores averaged (the
    * FP-order-sensitive form).
    *
    * Expects an integer position column `posCol` 0..n−1 per series
    * (callers rank once); segment = floor(pos·segments/n).
    */
  def sax(df: DataFrame, keyCols: Seq[String], posCol: String,
      valueCol: String, segments: Int): DataFrame = {
    require(segments >= 1, s"segments must be >= 1, got $segments")
    val v = col(valueCol)
    val stats = df.groupBy(keyCols.map(col): _*)
      .agg(count(v).as("n"), sum(v).as("s1"), sum(v * v).as("s2"))
      .withColumn("mu", col("s1") / col("n"))
      .withColumn("sigma",
        sqrt((col("s2") - col("s1") * col("s1") / col("n")) / col("n")))
    val seg = df.join(broadcast(stats), keyCols)
      .withColumn("segment",
        floor(col(posCol) * lit(segments.toLong) / col("n")).cast("long"))
      .groupBy((keyCols.map(col) :+ col("segment")): _*)
      .agg(sum(v).as("ss"), count(v).as("len"),
        first(col("mu")).as("mu"), first(col("sigma")).as("sigma"))
      .withColumn("paa", (col("ss") / col("len") - col("mu")) / col("sigma"))
    seg.select((keyCols.map(col) :+ col("segment") :+ col("paa") :+
      when(col("paa") < -0.6745, lit("a"))
        .when(col("paa") < 0.0, lit("b"))
        .when(col("paa") < 0.6745, lit("c"))
        .otherwise(lit("d")).as("symbol")): _*)
  }

  /** Least-squares trend per series over an integer index, plus an
    * h-step-ahead forecast. Slope/intercept come from the exact-sum
    * closed form (x is the index re-based to the series minimum, so
    * Σx, Σx², Σxy are exact integers / grid sums):
    *   slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)
    *   intercept = (Σy − slope·Σx)/n
    * Forecast rows: ŷ(maxx+s) = intercept + slope·(maxx+s), s=1..h.
    * The per-series minimum joins back broadcast (series-count-sized).
    */
  def linearForecast(df: DataFrame, keyCols: Seq[String], idxCol: String,
      valueCol: String, horizon: Int): DataFrame = {
    require(horizon >= 1, s"horizon must be >= 1, got $horizon")
    val mins = df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idxCol)).as("minx"))
    val based = df.join(broadcast(mins), keyCols)
      .withColumn("x", (col(idxCol) - col("minx")).cast("long"))
    val fit = based.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum(col(valueCol)).as("sy"), sum(col("x") * col(valueCol)).as("sxy"),
        sum(col("x") * col("x")).as("sxx"), max("x").as("maxx"))
      .withColumn("slope",
        (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")))
      .withColumn("intercept", (col("sy") - col("slope") * col("sx")) / col("n"))
    fit.withColumn("step", explode(array((1 to horizon).map(lit): _*)))
      .select((keyCols.map(col) :+ col("step").cast("long").as("step") :+
        col("slope") :+ col("intercept") :+
        (col("intercept") + col("slope") * (col("maxx") + col("step"))).as("yhat")): _*)
  }

  /** Depth-2 binary-segmentation changepoints per series: find the
    * split t₁ minimizing SSE([0,t)) + SSE([t,n)), then the best split
    * inside each half — up to 3 changepoints. SSE over [a,b) comes
    * from integer prefix sums (callers pass an INTEGER value column —
    * quantize first):
    *   SSE = (C₂(b)−C₂(a)) − (C₁(b)−C₁(a))²/(b−a)
    * so candidate costs are two exact integer differences and one FP
    * division — bit-identical across engines, making the per-series
    * argmin (ordered by (cost, t)) deterministic without tolerance
    * tricks.
    *
    * Shape: one window pass for prefixes (the series shuffle), then
    * candidate evaluation is a per-row expression; each argmin is a
    * per-series aggregate. The split-1 frame (one row per series)
    * broadcasts back for the depth-2 pass. No pairwise anything.
    * Expects `posCol` = 0-based integer position per series.
    */
  def changepoints(df: DataFrame, keyCols: Seq[String], posCol: String,
      valueCol: String): DataFrame = {
    val kcols = keyCols.map(col)
    val w = Window.partitionBy(kcols: _*).orderBy(col(posCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val v = col(valueCol).cast("long")
    val pre = df
      .withColumn("c1", sum(v).over(w))
      .withColumn("c2", sum(v * v).over(w))
    // Totals from a plain aggregate (NOT max of the prefix — a series
    // with negative values has a non-monotone cumulative sum).
    val tot = df.groupBy(kcols: _*)
      .agg(count(lit(1)).as("n"), sum(v).as("s1"), sum(v * v).as("s2"))
    // Row at pos p proposes split t = p+1 (left = first p+1 rows).
    val cand = pre.join(broadcast(tot), keyCols)
      .withColumn("t", col(posCol) + lit(1L))
      .where(col("t") < col("n"))
    def sse(c2b: Column, c2a: Column, c1b: Column, c1a: Column, len: Column): Column =
      (c2b - c2a) - (c1b - c1a) * (c1b - c1a) / len.cast("double")
    val cost1 = cand.withColumn("cost",
      sse(col("c2"), lit(0L), col("c1"), lit(0L), col("t")) +
        sse(col("s2"), col("c2"), col("s1"), col("c1"), col("n") - col("t")))
    val w1 = Window.partitionBy(kcols: _*).orderBy(col("cost"), col("t"))
    val split1 = cost1.withColumn("rk", row_number().over(w1))
      .where(col("rk") === 1)
      .select((kcols :+ col("t").as("t1") :+ col("c1").as("c1t") :+
        col("c2").as("c2t") :+ col("n").as("n") :+ col("s1").as("s1") :+
        col("s2").as("s2") :+ col("cost").as("cost1")): _*)
    // Depth 2: segments (0,t1) and (t1,n) with their prefix anchors.
    val segs = split1.select((kcols :+ explode(array(
      struct(lit(0L).as("a"), col("t1").as("b"), lit(0L).as("c1a"),
        lit(0L).as("c2a"), col("c1t").as("c1b"), col("c2t").as("c2b")),
      struct(col("t1").as("a"), col("n").as("b"), col("c1t").as("c1a"),
        col("c2t").as("c2a"), col("s1").as("c1b"), col("s2").as("c2b"))))
      .as("seg")): _*)
      .select((kcols :+ col("seg.a") :+ col("seg.b") :+ col("seg.c1a") :+
        col("seg.c2a") :+ col("seg.c1b") :+ col("seg.c2b")): _*)
    val cand2 = pre.join(broadcast(segs), keyCols)
      .withColumn("t", col(posCol) + lit(1L))
      .where(col("t") > col("a") && col("t") < col("b"))
      .withColumn("cost",
        sse(col("c2"), col("c2a"), col("c1"), col("c1a"), col("t") - col("a")) +
          sse(col("c2b"), col("c2"), col("c1b"), col("c1"), col("b") - col("t")))
    val w2 = Window.partitionBy((kcols :+ col("a")): _*).orderBy(col("cost"), col("t"))
    val split2 = cand2.withColumn("rk", row_number().over(w2))
      .where(col("rk") === 1)
      .select((kcols :+ lit(2L).as("depth") :+ col("t") :+ col("cost")): _*)
    split1.select((kcols :+ lit(1L).as("depth") :+ col("t1").as("t") :+
      col("cost1").as("cost")): _*)
      .unionByName(split2)
  }

  /** Tukey-fence outlier summary per series: exact interpolated
    * quartiles (the same linear-interpolation definition Spark's
    * `percentile` and DuckDB's `quantile_cont` share), fences at
    * 1.5·IQR, and counts either side. Two passes: a quartile
    * aggregate (series-count-sized, broadcast back) and a count pass.
    */
  /** Walk-forward backtest of the OLS trend fit: fit on positions
    * [0, trainN), predict [trainN, trainN + evalN), and score with the
    * standard point-forecast metrics — MAE, sMAPE, and MASE (MAE scaled
    * by the IN-SAMPLE one-step naive MAE, Hyndman & Koehler 2006), so a
    * model is judged against "predict yesterday's value" on the data it
    * trained on. Callers pass an INTEGER value column (quantize first):
    * every fit sum and every naive-walk delta is then exact, and the
    * only FP is the fit division, the per-point error arithmetic, and
    * the final averages (identical shapes in the oracle).
    *
    * Shape: one aggregate per series for the fit (exact long sums), one
    * partitioned window pass for the naive deltas, one broadcast join
    * of the series-count-sized model onto the eval slice. No global
    * anything.
    */
  def olsBacktest(df: DataFrame, keyCols: Seq[String], posCol: String,
      valueCol: String, trainN: Int, evalN: Int): DataFrame = {
    val kc = keyCols.map(col)
    val train = df.where(col(posCol) < trainN)
    val fit = train.groupBy(kc: _*)
      .agg(count(lit(1)).as("n"), sum(col(posCol)).as("sx"),
        sum(col(valueCol)).as("sy"),
        sum(col(posCol) * col(valueCol)).as("sxy"),
        sum(col(posCol) * col(posCol)).as("sxx"))
      .withColumn("slope",
        (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")))
      .withColumn("intercept",
        (col("sy") - col("slope") * col("sx")) / col("n"))
      .select(kc :+ col("slope") :+ col("intercept"): _*)
    val w = Window.partitionBy(kc: _*).orderBy(col(posCol))
    val naive = train
      .withColumn("_pv", lag(col(valueCol), 1).over(w))
      .where(col("_pv").isNotNull)
      .groupBy(kc: _*)
      .agg((sum(abs(col(valueCol) - col("_pv"))).cast("double") /
        count(lit(1))).as("naive_mae"))
    val ev = df
      .where(col(posCol) >= trainN && col(posCol) < trainN + evalN)
      .join(broadcast(fit), keyCols)
      .withColumn("yhat", col("intercept") + col("slope") * col(posCol))
      .withColumn("err", col(valueCol) - col("yhat"))
    ev.groupBy(kc: _*)
      .agg(count(lit(1)).as("n_eval"),
        (sum(abs(col("err"))) / count(lit(1))).as("mae"),
        (sum(lit(2.0) * abs(col("err")) /
          (abs(col(valueCol)) + abs(col("yhat")))) / count(lit(1)))
          .as("smape"))
      .join(broadcast(naive), keyCols)
      .withColumn("mase", col("mae") / col("naive_mae"))
  }

  /** Theil–Sen robust trend estimator: the median of all pairwise
    * slopes (y_b − y_a)/(x_b − x_a) per series — the outlier-immune
    * companion of [[linearForecast]]'s OLS slope (breakdown point
    * ~29% vs OLS's 0).
    *
    * O(n²/2) pairs per series, generated INSIDE a per-key equi-join so
    * the shuffle moves series rows, not pairs; the caller bounds n by
    * its series granularity (daily rollups here). Integer-quantized y
    * keeps each slope a single exact division; the only estimator FP
    * is the median interpolation.
    */
  def theilSen(df: DataFrame, keyCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    val kc = keyCols.map(col)
    val a = df.select(kc :+ col(xCol).as("xa") :+ col(yCol).as("ya"): _*)
    val b = df.select(kc :+ col(xCol).as("xb") :+ col(yCol).as("yb"): _*)
    a.join(b, keyCols)
      .where(col("xa") < col("xb"))
      .select(kc :+ ((col("yb") - col("ya")).cast("double") /
        (col("xb") - col("xa"))).as("slope"): _*)
      .groupBy(kc: _*)
      .agg(count(lit(1)).as("n_pairs"),
        percentile(col("slope"), lit(0.5)).as("med_slope"))
  }

  /** Banded dynamic-time-warping distance on integer (cents-quantized)
    * series: classic O(n·band) DP with the Sakoe–Chiba band
    * |i − j| ≤ band. Integer arithmetic end to end, so the distance is
    * EXACT — no FP accumulation anywhere (the changepoint
    * quantization discipline applied to an alignment DP).
    * Returns -1 when the band disconnects the endpoints
    * (|len(a) − len(b)| > band).
    */
  def dtwBanded(a: Array[Long], b: Array[Long], band: Int): Long = {
    val (la, lb) = (a.length, b.length)
    if (la == 0 || lb == 0 || math.abs(la - lb) > band) return -1L
    val INF = Long.MaxValue / 4
    var prev = Array.fill(lb)(INF)
    var cur = Array.fill(lb)(INF)
    var i = 0
    while (i < la) {
      java.util.Arrays.fill(cur, INF)
      val jLo = math.max(0, i - band)
      val jHi = math.min(lb - 1, i + band)
      var j = jLo
      while (j <= jHi) {
        val cost = math.abs(a(i) - b(j))
        val best =
          if (i == 0 && j == 0) 0L
          else {
            val up = if (i > 0) prev(j) else INF
            val left = if (j > 0) cur(j - 1) else INF
            val diag = if (i > 0 && j > 0) prev(j - 1) else INF
            math.min(up, math.min(left, diag))
          }
        cur(j) = best + cost
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(lb - 1)
  }

  /** All-pairs banded DTW between the keyed series of a long frame
    * whose values are ALREADY integer-quantized (`centsCol` long).
    *
    * Scale shape: one groupBy(key) collapses the long table to one
    * array row per series (the caller bounds series length by its
    * position filter — per-row state is O(len)); the pair frame is
    * |keys|²/2 rows, each carrying two bounded arrays, and the DP maps
    * over those rows in executors — nothing touches the driver. The
    * key domain is the caller's contract (event types here, not users).
    */
  def dtwPairs(df: DataFrame, keyCol: String, posCol: String,
      centsCol: String, band: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val arrs = df.groupBy(col(keyCol).as("k"))
      .agg(array_sort(collect_list(struct(col(posCol).cast("long").as("p"),
        col(centsCol).cast("long").as("v")))).as("pv"))
      .select(col("k").cast("string").as("k"),
        expr("transform(pv, x -> x.v)").as("vs"))
    val a = arrs.select(col("k").as("ka"), col("vs").as("va"))
    val b = arrs.select(col("k").as("kb"), col("vs").as("vb"))
    a.crossJoin(b).where(col("ka") < col("kb"))
      .as[(String, Seq[Long], String, Seq[Long])]
      .map { case (ka, va, kb, vb) =>
        (ka, kb, dtwBanded(va.toArray, vb.toArray, band))
      }
      .toDF("key_a", "key_b", "dtw_cents")
  }

  def iqrOutliers(df: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame = {
    val v = col(valueCol)
    val q = df.groupBy(keyCols.map(col): _*)
      .agg(expr(s"percentile($valueCol, 0.25)").as("q1"),
        expr(s"percentile($valueCol, 0.75)").as("q3"))
      .withColumn("lo", col("q1") - (col("q3") - col("q1")) * 1.5)
      .withColumn("hi", col("q3") + (col("q3") - col("q1")) * 1.5)
    df.join(broadcast(q), keyCols)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(when(v < col("lo"), 1L).otherwise(0L)).as("n_low"),
        sum(when(v > col("hi"), 1L).otherwise(0L)).as("n_high"),
        first(col("lo")).as("lo"), first(col("hi")).as("hi"))
  }
}
