package graft.operators

import graft.dsl.SeriesScan
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Telemetry anomaly detection over the series model the Flux surface
  * exposes (per-series robust outliers + sequential drift alarms) —
  * the monitoring verbs a timeseries engine's users reach for right
  * after downsampling (reference scope: the engine's query surface is
  * the alerting substrate, `aws-greengrass-labs-database-influxdb
  * /README.md` positions the component as the telemetry store that
  * Grafana/alerting reads).
  *
  * Scale shape: both detectors are per-series and single-pass beyond
  * their parameter aggregates. [[madFlags]] is two grouped exact
  * percentiles plus joins that all hash on the SAME series key — the
  * aggregates' output partitioning is reused, no extra exchange
  * family. [[cusum]] is one grouped moment aggregate plus ONE
  * co-located sequential scan ([[SeriesScan.scanDouble]]: repartition
  * by series, in-partition sort, O(1) state) — the recurrence
  * S_t = max(0, S_{t-1} + (x_t − μ − kσ)) cannot be expressed in
  * window algebra without an O(n²) closed form, so it rides the same
  * justified mapPartitions path as the EMA family.
  */
object AnomalyOps {

  /** Median-absolute-deviation outlier flags: per series key, flag
    * rows where |x − median| > k · MAD (MAD = median of |x − median|).
    * Robust to the outliers it hunts (unlike z-scores, whose μ/σ the
    * outliers themselves drag). Adds `med`, `abs_dev`, `mad`,
    * `is_anom` to the frame. Exact interpolated percentiles — the
    * same `percentile` the quantile verb uses, so the arithmetic is
    * engine-replicable bit-for-bit.
    */
  def madFlags(df: DataFrame, keyCols: Seq[String], valueCol: String,
      k: Double = 3.0, exact: Boolean = true): DataFrame = {
    require(keyCols.nonEmpty, "madFlags needs a series key")
    val keys = keyCols.map(col)
    // Exact `percentile` buffers the WHOLE group in the aggregation
    // state — right for gate exactness and bounded series, a memory
    // hazard for a billion-point series. exact=false routes both
    // medians through the engine's mergeable KLL sketch
    // (functions/KllSketch.scala): state O(k·log n) per series, same
    // plan shape, rank error ≤ ~1.7% at the default k.
    def med50(c: Column): Column =
      if (exact) percentile(c, lit(0.5))
      else element_at(
        call_function("graft_kll_quantiles", c, array(lit(0.5)), lit(4096)), 1)
    val med = df.groupBy(keys: _*).agg(med50(col(valueCol)).as("med"))
    val dev = df.join(med, keyCols)
      .withColumn("abs_dev", abs(col(valueCol) - col("med")))
    val mad = dev.groupBy(keys: _*).agg(med50(col("abs_dev")).as("mad"))
    dev.join(mad, keyCols)
      .withColumn("is_anom", col("abs_dev") > lit(k) * col("mad"))
  }

  /** Winsorization: clamp each series to its own [lo, hi] percentile
    * band — the outlier TREATMENT next to [[madFlags]]'s detection
    * (dashboards winsorize before averaging so one 500× spike doesn't
    * own the y-axis). One grouped two-percentile aggregate + a
    * same-key join + a clamp projection; exact interpolated
    * percentiles like the quantile verb. Adds `p_lo`, `p_hi`,
    * `clamped`.
    */
  def winsorize(df: DataFrame, keyCols: Seq[String], valueCol: String,
      lo: Double = 0.01, hi: Double = 0.99): DataFrame = {
    require(keyCols.nonEmpty, "winsorize needs a series key")
    require(lo >= 0 && hi <= 1 && lo < hi, s"need 0 <= lo < hi <= 1, got ($lo, $hi)")
    val keys = keyCols.map(col)
    val bounds = df.groupBy(keys: _*).agg(
      percentile(col(valueCol), lit(lo)).as("p_lo"),
      percentile(col(valueCol), lit(hi)).as("p_hi"))
    df.join(bounds, keyCols)
      .withColumn("clamped",
        least(greatest(col(valueCol), col("p_lo")), col("p_hi")))
  }

  /** Seasonal-baseline deviation flags: each row is compared against
    * the moments of ITS OWN seasonal slot — (series, hour-of-week) —
    * so a Monday-9am spike is judged against Monday-9am history, not
    * the flat series mean that hides diurnal/weekly cycles (the gap a
    * plain 3σ rule has on periodic telemetry). Slot = epoch-hour mod
    * 168 from a µs epoch column: pure integer arithmetic, no calendar
    * semantics to disagree on across engines.
    *
    * Moments are computed from EXACT integer sums of the value
    * quantized to 1e-4 units (sum and sum-of-squares as integers, the
    * squares in decimal so 100 TB slot counts cannot overflow), so
    * unlike a rounded float avg() the slot mean/σ cannot land a ulp
    * across a rounding boundary under a different summation order —
    * a real failure observed on small slots (n = 16 flipped the 4th
    * decimal between engines). The only FP ops run on identical
    * integer inputs, which every engine reproduces bit-for-bit.
    * Slots with σ = 0 (constant history, or a single point) never
    * flag. Adds `how`, `mu`, `sg`, `flag`.
    *
    * Scale shape: ONE groupBy at (series × 168) cardinality, the
    * baseline joins back on the same key — map-side-combinable
    * aggregate, no window, no self-join.
    */
  def seasonalBaseline(df: DataFrame, keyCols: Seq[String], tsUsCol: String,
      valueCol: String, sigmas: Double = 3.0): DataFrame = {
    require(keyCols.nonEmpty, "seasonalBaseline needs a series key")
    val withSlot = df
      .withColumn("how", expr(s"($tsUsCol div 3600000000) % 168"))
      .withColumn("_u", round(col(valueCol) * 10000).cast("long"))
    val slotKeys = keyCols :+ "how"
    val base = withSlot.groupBy(slotKeys.map(col): _*)
      .agg(count(lit(1)).as("_n"), sum(col("_u")).as("_s"),
        sum((col("_u").cast("decimal(19,0)") * col("_u").cast("decimal(19,0)"))
          .cast("decimal(38,0)")).as("_q"))
      // mu rounds IN UNIT SPACE with integer half-up ((2S+n) div 2n):
      // S/n lands on exact .5-unit midpoints whenever n divides 2S,
      // and engines disagree there (Spark's round goes through the
      // shortest-decimal re-read, the oracle rounds the raw binary) —
      // the integer form has no FP midpoint to disagree on
      .withColumn("mu",
        expr("(2 * _s + _n) div (2 * _n)").cast("double") / lit(10000.0))
      .withColumn("sg",
        round(sqrt(greatest(
          (col("_q").cast("double") -
            col("_s").cast("double") * col("_s").cast("double") / col("_n"))
            / col("_n"), lit(0.0))) / lit(10000.0), 4))
      .drop("_n", "_s", "_q")
    withSlot.join(base, slotKeys)
      .withColumn("flag",
        col("sg") > 0 &&
          abs(col("_u").cast("double") / lit(10000.0) - col("mu")) >
            lit(sigmas) * col("sg"))
      .drop("_u")
  }

  /** One-sided CUSUM drift alarms (Page 1954): per series,
    * S_t = max(0, S_{t-1} + (x_t − μ − slack·σ)), alarm while
    * S_t > thresh·σ — the classic sequential detector for a sustained
    * upward mean shift, which threshold-per-point alerting misses.
    * μ/σ are the series' own moments ROUNDED to 4 decimals before the
    * recurrence: the rounding pins the sequential arithmetic to
    * inputs any engine reproduces exactly, so a ulp of distributed-
    * sum jitter in μ cannot cascade through ten thousand max(0,·)
    * steps. Adds `mu`, `sg`, `cusum`, `alarm`. `tieCols` pins the
    * recurrence order under duplicate (key, orderCol) rows — same
    * contract as [[burstFlags]].
    */
  def cusum(df: DataFrame, keyCols: Seq[String], orderCol: String,
      valueCol: String, slackSigmas: Double = 0.5,
      threshSigmas: Double = 4.0, tieCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "cusum needs a series key")
    val keys = keyCols.map(col)
    val stats = df.groupBy(keys: _*).agg(
      round(avg(col(valueCol)), 4).as("mu"),
      round(stddev_pop(col(valueCol)), 4).as("sg"))
    val j = df.join(stats, keyCols)
      .withColumn("xdev",
        col(valueCol) - col("mu") - lit(slackSigmas) * col("sg"))
    val scanned = SeriesScan.scanDouble(j, keyCols, orderCol, "xdev",
      "cusum", tieCols)(0.0) { (s, x) =>
      val n = math.max(0.0, s + x); (n, n)
    }
    scanned
      .withColumn("alarm", col("cusum") > lit(threshSigmas) * col("sg"))
      .drop("xdev")
  }

  /** Hysteresis burst detection (the two-threshold Schmitt-trigger
    * reading of Kleinberg 2002's two-state burst automaton): a series
    * ENTERS a burst when the value exceeds μ + hi·σ and STAYS in it
    * while the value holds above μ + lo·σ — the hysteresis band keeps
    * one noisy dip from splitting a real burst into fragments, which a
    * single-threshold flag does constantly. μ/σ are rounded to 4
    * decimals exactly as [[cusum]]'s (pinning the sequential state
    * machine to engine-reproducible inputs); hi/lo default to
    * power-of-two sigma multiples so the threshold arithmetic is
    * FP-exact. The per-row signal (above-hi / above-lo / below)
    * computes relationally; only the 1-bit automaton runs in the
    * ordered scan (one shuffle, O(1) state). Adds `in_burst` (0/1).
    *
    * `tieCols` breaks duplicate-(key, orderCol) ordering ties: the
    * automaton's state after a tied (hi, below) pair differs by
    * processing order, so callers whose order column is not unique per
    * key MUST pass a tie-break id (the Flux surface omits it because
    * the store's LWW upsert guarantees (series, time) uniqueness).
    */
  def burstFlags(df: DataFrame, keyCols: Seq[String], orderCol: String,
      valueCol: String, hiSigmas: Double = 2.0,
      loSigmas: Double = 0.5, tieCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "burstFlags needs a series key")
    require(hiSigmas > loSigmas, s"need hi > lo, got $hiSigmas <= $loSigmas")
    val keys = keyCols.map(col)
    val stats = df.groupBy(keys: _*).agg(
      round(avg(col(valueCol)), 4).as("mu"),
      round(stddev_pop(col(valueCol)), 4).as("sg"))
    val j = df.join(stats, keyCols)
      .withColumn("_sig",
        when(col(valueCol) > col("mu") + lit(hiSigmas) * col("sg"), 2.0)
          .when(col(valueCol) > col("mu") + lit(loSigmas) * col("sg"), 1.0)
          .otherwise(0.0))
    graft.dsl.SeriesScan.scanDouble(j, keyCols, orderCol, "_sig",
      "in_burst", tieCols)(0.0) { (s, x) =>
      val b = if (s == 0.0) { if (x == 2.0) 1.0 else 0.0 }
              else { if (x >= 1.0) 1.0 else 0.0 }
      (b, b)
    }.drop("_sig")
  }
}
