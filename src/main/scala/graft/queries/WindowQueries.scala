package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time-window + per-series transform queries for the correctness gate
  * (SURVEY.md §2B: windowing, series window-function family, top-k,
  * order-sensitive scans).
  *
  * Axis discipline: order-sensitive verbs (derivative, difference, EMA,
  * stateCount, …) run on the µs-long axis (`ts_us`) because DuckDB reads
  * the parquet ns timestamp µs-truncated — ordering AND time arithmetic
  * then match `epoch_us(ts)` bit-for-bit. Calendar verbs (window,
  * aggregateWindow, interpolate) run on the µs timestamp `ts`. Oracles
  * mirror the engine's float arithmetic expression-for-expression (same
  * casts, same operation order) so round(4) hash-compare is stable.
  */
object WindowQueries {
  import QueryUtil._

  // UTC epoch-µs bounds used by the reduced-range queries.
  private val jan08 = 1704672000L * 1000000L // 2024-01-08
  private val jan09 = 1704758400L * 1000000L // 2024-01-09
  private val jan11 = 1704931200L * 1000000L // 2024-01-11

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // window(): assign tumbling 6h windows, count rows per (type, window).
    "window_count" -> ((s, dir) =>
      ev(s, dir)
        .window("6 hours")
        .agg(count(lit(1)).as("n"))
        .withColumnRenamed("_start", "wstart").drop("_stop")
        .orderBy("event_type", "wstart")),

    // aggregateWindow(every: 1h, fn: sum) — the canonical downsample.
    // sum, not mean: the 4-decimal test values make per-cell averages
    // land exactly on round-half boundaries (sum/n with n∤10^4), where
    // Spark's decimal rounding and DuckDB's float rounding diverge;
    // sums stay on the 4-decimal grid and never touch a boundary.
    "window_sum" -> ((s, dir) =>
      ev(s, dir)
        .aggregateWindow("1 hour", sum, as = "sum_v")
        .toDF
        .select(col("event_type"), col("ts").as("wend"), r4(col("sum_v")).as("sum_v"))
        .orderBy("event_type", "wend")),

    // aggregateWindow(createEmpty: true) + fill(0): sparse series emit
    // every window; nulls become 0 like Flux fill(value:).
    "window_empty_fill" -> ((s, dir) =>
      ev(s, dir)
        .where(col("event_type") === "purchase" && col("value") > 97)
        .aggregateWindow("1 hour", avg, createEmpty = true, as = "mean_v")
        .fill(0.0)
        .toDF
        .select(col("event_type"), col("ts").as("wend"), r4(col("mean_v")).as("mean_v"))
        .orderBy("wend")),

    // derivative(unit: 1s) per (event_type, user_id) series on the µs axis.
    "derivative" -> ((s, dir) =>
      evUs(s, dir).group("event_type", "user_id")
        .derivative(1e6, as = "deriv") // µs axis: unit=1e6 µs = per second
        .toDF.select(col("event_id"), r4(col("deriv")).as("deriv"))
        .orderBy("event_id")),

    // difference() per series.
    "difference" -> ((s, dir) =>
      evUs(s, dir).group("event_type", "user_id")
        .difference(as = "diff")
        .toDF.select(col("event_id"), r4(col("diff")).as("diff"))
        .orderBy("event_id")),

    // increase(): running sum of positive deltas per (event_type,
    // user_id) series — the real series key (user_id-grade cardinality
    // exercises ~750-way parallelism instead of 5).
    "increase" -> ((s, dir) =>
      evUs(s, dir).group("event_type", "user_id")
        .increase(as = "inc")
        .toDF.select(col("event_id"), r4(col("inc")).as("inc"))
        .orderBy("event_id")),

    // cumulativeSum() per (event_type, user_id) series.
    "cumsum" -> ((s, dir) =>
      evUs(s, dir).group("event_type", "user_id")
        .cumulativeSum(as = "cs")
        .toDF.select(col("event_id"), r4(col("cs")).as("cs"))
        .orderBy("event_id")),

    // movingAverage(5) per (event_type, user_id) series (emits from row 5).
    "moving_avg" -> ((s, dir) =>
      evUs(s, dir).group("event_type", "user_id")
        .movingAverage(5, as = "ma")
        .toDF.select(col("event_id"), r4(col("ma")).as("ma"))
        .orderBy("event_id")),

    // timedMovingAverage(1h) per event_type (seconds-truncated range
    // frame). Input floored to integers: averages of 4-decimal values
    // sit exactly on round-half boundaries for many window counts;
    // integer inputs only produce binary-exact boundary values, on
    // which both engines' rounding agrees.
    "timed_mavg" -> ((s, dir) =>
      ev(s, dir)
        .where(col("ts_ns") >= jan08 * 1000L && col("ts_ns") < jan09 * 1000L)
        .mapValue(v => floor(v).cast("double"))
        .timedMovingAverage(3600, as = "tma")
        .toDF.select(col("event_id"), r4(col("tma")).as("tma"))
        .orderBy("event_id")),

    // elapsed(unit: 1µs): Δt to previous row per (event_type, user_id)
    // series. Unit = 1 axis tick keeps values integer-exact (a /1e6
    // seconds variant lands exactly on round-half boundaries, where
    // Spark's decimal rounding and DuckDB's float rounding disagree).
    "elapsed" -> ((s, dir) =>
      evUs(s, dir).group("event_type", "user_id")
        .elapsed(1.0, as = "elapsed")
        .toDF.select(col("event_id"), col("elapsed"))
        .orderBy("event_id")),

    // stateCount(value > 75) per (event_type, user_id) series.
    "state_count" -> ((s, dir) =>
      evUs(s, dir).group("event_type", "user_id")
        .stateCount(col("value") > 75, as = "sc")
        .toDF.select(col("event_id"), col("sc"))
        .orderBy("event_id")),

    // stateDuration(value > 75, unit: 1µs) per (event_type, user_id) —
    // unit = one axis tick keeps durations integer-exact (seconds-unit
    // values land on round-half boundaries, like elapsed).
    "state_duration" -> ((s, dir) =>
      evUs(s, dir).group("event_type", "user_id")
        .stateDuration(col("value") > 75, 1.0, as = "sd")
        .toDF.select(col("event_id"), col("sd"))
        .orderBy("event_id")),

    // timeShift(1 day) then daily counts of the shifted time.
    "time_shift" -> ((s, dir) =>
      ev(s, dir)
        .timeShift("1 day")
        .toDF.groupBy(date_format(col("ts"), "yyyy-MM-dd").as("d"))
        .agg(count(lit(1)).as("n"))
        .orderBy("d")),

    // sample(n: 10): every 10th row per (event_type, user_id) series.
    "sample_10th" -> ((s, dir) =>
      evUs(s, dir).group("event_type", "user_id")
        .sample(10)
        .toDF.select(col("event_id"))
        .orderBy("event_id")),

    // limit(n: 5, offset: 2) per (event_type, user_id) series by time.
    "limit_offset" -> ((s, dir) =>
      evUs(s, dir).group("event_type", "user_id")
        .limitPerGroup(5, offset = 2)
        .toDF.select(col("event_type"), col("event_id"))
        .orderBy("event_type", "event_id")),

    // tail(n: 4) per (event_type, user_id) series.
    "tail_4" -> ((s, dir) =>
      evUs(s, dir).group("event_type", "user_id")
        .tail(4)
        .toDF.select(col("event_type"), col("event_id"))
        .orderBy("event_type", "event_id")),

    // top(3) / bottom(3) by value per (event_type, user_id) series.
    "top_bottom" -> ((s, dir) => {
      val t = evUs(s, dir).group("event_type", "user_id").top(3).toDF
        .select(col("event_type"), col("event_id"), lit("top").as("side"))
      val b = evUs(s, dir).group("event_type", "user_id").bottom(3).toDF
        .select(col("event_type"), col("event_id"), lit("bottom").as("side"))
      t.unionByName(b).orderBy("event_type", "side", "event_id")
    }),

    // highestAverage(3): global top-3 series by mean value, rolled up.
    "highest_avg" -> ((s, dir) =>
      evUs(s, dir).group("event_type", "user_id")
        .highestAverage(3)
        .group("event_type", "user_id")
        .agg(count(lit(1)).as("n"), r4(avg(col("value"))).as("avg_v"))
        .orderBy("event_type", "user_id")),

    // interpolate.linear(every: 1h) per event_type over one day (µs axis).
    "interpolate" -> ((s, dir) =>
      ev(s, dir)
        .where(col("ts_ns") >= jan08 * 1000L && col("ts_ns") < jan09 * 1000L)
        .group("event_type")
        .interpolateLinear(3600, as = "v")
        .toDF.select(col("event_type"), col("ts"), r4(col("v")).as("v"))
        .orderBy("event_type", "ts")),

    // exponentialMovingAverage(10) per event_type over 3 days (Flux
    // semantics: SMA-of-first-10 seed, emitted from row 10; SeriesScan
    // order-sensitive single pass).
    "ema_10" -> ((s, dir) =>
      evUs(s, dir)
        .where(col("ts_us") >= jan08 && col("ts_us") < jan11)
        .ema(10, as = "ema")
        .toDF.select(col("event_type"), col("ts_us").as("tus"), r4(col("ema")).as("ema"))
        .orderBy("event_type", "tus")),

    // chandeMomentumOscillator(10) per event_type over one day.
    "cmo_10" -> ((s, dir) =>
      evUs(s, dir)
        .where(col("ts_us") >= jan08 && col("ts_us") < jan09)
        .chandeMomentum(10, as = "cmo")
        .toDF.select(col("event_type"), col("ts_us").as("tus"), r4(col("cmo")).as("cmo"))
        .orderBy("event_type", "tus")),

    // relativeStrengthIndex(10) per event_type over one day (Wilder).
    "rsi_10" -> ((s, dir) =>
      evUs(s, dir)
        .where(col("ts_us") >= jan08 && col("ts_us") < jan09)
        .rsi(10, as = "rsi")
        .toDF.select(col("event_type"), col("ts_us").as("tus"), r4(col("rsi")).as("rsi"))
        .orderBy("event_type", "tus")),

    // events.duration(): forward Δt per series, final row closed at
    // the range stop (2024-02-01) — µs-long axis keeps it integer-exact.
    "events_duration" -> ((s, dir) =>
      evUs(s, dir)
        .eventDuration(lit(1706745600L * 1000000L), as = "dur")
        .toDF.select(col("event_type"), col("ts_us").as("tus"),
          col("dur").cast("long").as("dur_us"))
        .orderBy("event_type", "tus")),

    // Gap-based sessionization: 6h inactivity splits a user's stream
    // into sessions; per-session count / µs duration / value sum. The
    // µs-long axis keeps gap comparison and duration arithmetic integer
    // -exact on both sides. One shuffle (user_id): the session-index
    // window and the per-(user, session) aggregate share it — grouping
    // on a superset of the window's partition key is already co-located.
    "sessionize" -> ((s, dir) => {
      import graft.dsl.FluxFrame
      val f = FluxFrame.of(
        events(s, dir).withColumn("ts_us", expr("ts_ns div 1000")),
        "ts_us", "value", "user_id")
      f.sessionize(21600e6, as = "session").toDF
        .groupBy("user_id", "session")
        .agg(count(lit(1)).as("n"),
          (max(col("ts_us")) - min(col("ts_us"))).as("dur_us"),
          r4(sum(col("value"))).as("sum_v"))
        .orderBy("user_id", "session")
    }),

    // Session path analysis: the routes sessions actually take. Same
    // 6h gap split as `sessionize`, sequences tie-broken by event_id
    // (deterministic on both engines), truncated to 8 steps BEFORE
    // they become shuffle rows. Top-25 by (count, path) — a total
    // order, so the cut is exact.
    "event_paths" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("tus", expr("ts_ns div 1000"))
      graft.operators.PathOps.pathCounts(
        graft.operators.PathOps.sessionPaths(
          ev, "user_id", "event_type", "tus", "event_id",
          21600000000L, 8))
        .orderBy(col("n_sessions").desc, col("path"))
        .limit(25)
    }),

    // First-order Markov chain over session-internal transitions:
    // P(next event type | current) — the "what do users do next"
    // matrix. Counts explode per consecutive pair (k−1 rows per
    // k-event session); normalization is a window over the tiny
    // from-type domain.
    "markov_transitions" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("tus", expr("ts_ns div 1000"))
      graft.operators.PathOps.transitions(
        ev, "user_id", "event_type", "tus", "event_id", 21600000000L)
        .select(col("from_type"), col("to_type"), col("n"),
          r4(col("prob")).as("prob"))
        .orderBy("from_type", "to_type")
    }),

    // PSI drift between the first and second half of the time range:
    // fixed 25-wide value bins, per-bucket decomposition (Σ contrib =
    // the PSI score). The midpoint cutoff is integer-exact on both
    // engines; the bucket histograms — not corpus rows — carry the
    // normalization.
    "psi_drift" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("tus", expr("ts_ns div 1000"))
      val mid = ev.agg(expr("(min(tus) + max(tus)) div 2").as("mid"))
      val e2 = ev.crossJoin(broadcast(mid))
      graft.operators.DriftOps.numericDrift(
        e2.filter(col("tus") < col("mid")),
        e2.filter(col("tus") >= col("mid")),
        "value", 0.0, 25.0, 20)
        .select(col("bucket"), col("n_ref"), col("n_cur"),
          r4(col("p_ref")).as("p_ref"), r4(col("p_cur")).as("p_cur"),
          r4(col("contrib")).as("contrib"))
        .orderBy("bucket")
    }),

    // Decile-shift drift between the same two snapshots psi_drift
    // compares: exact quantiles side-by-side localize WHERE the
    // distribution moved (tail vs body), complementing binned PSI.
    "quantile_drift" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("tus", expr("ts_ns div 1000"))
      val mid = ev.agg(expr("(min(tus) + max(tus)) div 2").as("mid"))
      val e2 = ev.crossJoin(broadcast(mid))
      graft.operators.DriftOps.quantileDrift(
        e2.filter(col("tus") < col("mid")),
        e2.filter(col("tus") >= col("mid")),
        "value", (1 to 9).map(_ / 10.0))
        .select(r4(col("q")).as("q"), r4(col("ref")).as("ref"),
          r4(col("cur")).as("cur"), r4(col("shift")).as("shift"))
        .orderBy("q")
    }),

    // Decile drift from mergeable KLL sketch state: the sketch-backed
    // form of quantile_drift — at 100 TB each snapshot's deciles come
    // from KBs of mergeable sketch state instead of a sort; exact
    // below capacity, so the gate hash-matches the disc-rank oracle.
    "kll_drift" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{array, call_function, posexplode}
      val ev = events(s, dir).withColumn("tus", expr("ts_ns div 1000"))
      val mid = ev.agg(expr("(min(tus) + max(tus)) div 2").as("mid"))
      val e2 = ev.crossJoin(broadcast(mid))
      val qs = array((1 to 9).map(i => lit(i / 10.0)): _*)
      def dec(df: DataFrame, as: String) =
        df.agg(call_function("graft_kll_quantiles", col("value"), qs,
            lit(65536)).as("qv"))
          .select(posexplode(col("qv")).as(Seq("qi", as)))
      dec(e2.filter(col("tus") < col("mid")), "ref")
        .join(dec(e2.filter(col("tus") >= col("mid")), "cur"), "qi")
        .select(col("qi").cast("long").as("qi"), r4(col("ref")).as("ref"),
          r4(col("cur")).as("cur"), r4(col("cur") - col("ref")).as("shift"))
        .orderBy("qi")
    }),

    // Categorical PSI over the language mix of two document snapshots
    // (parity split stands in for ref-vs-intake): born/died categories
    // surface with a zero side and an Eps-bounded contribution.
    "cat_drift" -> ((s, dir) => {
      val d = documents(s, dir)
      graft.operators.DriftOps.categoricalDrift(
        d.filter(col("doc_id") % 2 === 0),
        d.filter(col("doc_id") % 2 === 1), "lang")
        .select(col("bucket").as("lang"), col("n_ref"), col("n_cur"),
          r4(col("p_ref")).as("p_ref"), r4(col("p_cur")).as("p_cur"),
          r4(col("contrib")).as("contrib"))
        .orderBy("lang")
    }),

    // The same drift decomposition's bounded score: per-bucket
    // Jensen–Shannon terms (0·ln0 = 0, total ≤ ln 2) over the same
    // half-split histograms — monitors report JSD beside PSI because
    // PSI is unbounded.
    "js_drift" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("tus", expr("ts_ns div 1000"))
      val mid = ev.agg(expr("(min(tus) + max(tus)) div 2").as("mid"))
      val e2 = ev.crossJoin(broadcast(mid))
      graft.operators.DriftOps.numericDrift(
        e2.filter(col("tus") < col("mid")),
        e2.filter(col("tus") >= col("mid")),
        "value", 0.0, 25.0, 20)
        .select(col("bucket"), col("n_ref"), col("n_cur"),
          r4(col("contrib_js")).as("contrib_js"))
        .orderBy("bucket")
    }),

    // Snapshot inventory diff: a simulated pipeline re-run (some docs
    // deleted, some edited, some new) classified by one full-outer
    // join on the id carrying only md5 fingerprints.
    "corpus_diff" -> ((s, dir) => {
      val d = documents(s, dir)
      val old = d.filter(col("doc_id") % 13 =!= 0)
        .select(col("doc_id").as("id"), md5(col("text")).as("fp"))
      val cur = d.filter(col("doc_id") % 11 =!= 0)
        .select(col("doc_id").as("id"),
          md5(when(col("doc_id") % 7 === 0, concat(col("text"), lit(" edit")))
            .otherwise(col("text"))).as("fp"))
      graft.operators.DriftOps.snapshotDiff(old, cur)
        .groupBy("status").agg(count(lit(1)).as("n"))
        .orderBy("status")
    }),

    // LTTB plot downsampling: each event_type series reduced to 20
    // visually-representative points. Selection is sequential per
    // series (each pick anchors the next triangle), so the oracle
    // unrolls the 18 selection steps as generated SQL — the
    // kmeansIterSql precedent. Values pass through untouched: no
    // rounding needed for the hash.
    "lttb_downsample" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("tus", expr("ts_ns div 1000"))
      graft.operators.Lttb.lttb(
        ev.select("event_type", "tus", "event_id", "value"),
        Seq("event_type"), "tus", "event_id", "value", 20)
        .orderBy("event_type", "tus", "event_id")
    }),

    // First/last-touch attribution: per conversion, the touch
    // endpoints inside a 6h lookback — ONE range-frame window, no
    // self-join (the oracle replays it as the equivalent interval
    // join + struct min/max).
    "attribution" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("tus", expr("ts_ns div 1000"))
      graft.operators.PathOps.attribution(
        ev, "user_id", "event_type", "tus", "event_id",
        Set("purchase", "signup"), 21600000000L)
        .orderBy("user_id", "tus", "event_id")
    }),

    // Multi-touch credit: linear (count) + exponential time-decay
    // (tau = 2h) weight per conversion, same range frame.
    "attribution_credit" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("tus", expr("ts_ns div 1000"))
      graft.operators.PathOps.attributionCredit(
        ev, "user_id", "event_type", "tus", "event_id",
        Set("purchase", "signup"), 21600000000L, 7.2e9)
        .select(col("user_id"), col("event_type"), col("tus"), col("event_id"),
          col("n_touches"), r4(col("decay_sum")).as("decay_sum"))
        .orderBy("user_id", "tus", "event_id")
    }),

    // MAD outlier flags: per series, |x − median| > 3·MAD — the robust
    // outlier rule (the median pair the outliers can't drag, unlike
    // z-scores). Two exact grouped percentiles + joins all hashed on
    // the same series key; rolled up to per-type counts.
    "anomaly_mad" -> ((s, dir) =>
      graft.operators.AnomalyOps
        .madFlags(events(s, dir).select("event_type", "value"),
          Seq("event_type"), "value", 3.0)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("is_anom"), 1L).otherwise(0L)).as("n_anom"),
          r4(min(col("med"))).as("med"), r4(min(col("mad"))).as("mad"))
        .orderBy("event_type")),

    // CUSUM drift alarms: S_t = max(0, S_{t−1} + (x − μ − 0.5σ)),
    // alarm while S > 4σ — the sequential mean-shift detector. μ/σ
    // round to 4dp before the recurrence so the sequential chain is
    // engine-exact; the scan is the EMA family's one-shuffle
    // co-located pass, the oracle replays it as a recursive CTE.
    "cusum_drift" -> ((s, dir) =>
      graft.operators.AnomalyOps
        .cusum(events(s, dir)
            .withColumn("ts_us", expr("ts_ns div 1000"))
            .select("event_type", "ts_us", "event_id", "value"),
          Seq("event_type"), "ts_us", "value", tieCols = Seq("event_id"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("alarm"), 1L).otherwise(0L)).as("n_alarms"),
          r4(max(col("cusum"))).as("max_s"))
        .orderBy("event_type")),

    // Seasonal hour-of-week baseline: every row judged against its own
    // slot's moments — per-slot output is already 4dp-rounded, so the
    // gate carries no FP sums at all.
    "seasonal_baseline" -> ((s, dir) =>
      graft.operators.AnomalyOps.seasonalBaseline(
        events(s, dir).withColumn("ts_us", expr("ts_ns div 1000"))
          .select("event_type", "ts_us", "value"),
        Seq("event_type"), "ts_us", "value")
        .groupBy("event_type", "how", "mu", "sg")
        .agg(count(lit(1)).as("n"),
          sum(when(col("flag"), 1L).otherwise(0L)).as("n_flag"))
        .select("event_type", "how", "n", "mu", "sg", "n_flag")
        .orderBy("event_type", "how")),

    // Hysteresis burst detection: enter above μ+2σ, hold above μ+½σ —
    // episode count + in-burst row count per series.
    "burst_detect" -> ((s, dir) => {
      // event_id tie-break: the raw events axis carries no uniqueness
      // guarantee (unlike the store's LWW series axis), so the
      // automaton's order — and the episode-entry lag below — must be
      // pinned on (ts, id)
      val b = graft.operators.AnomalyOps.burstFlags(
        events(s, dir)
          .withColumn("ts_us", expr("ts_ns div 1000"))
          .select("event_type", "ts_us", "event_id", "value"),
        Seq("event_type"), "ts_us", "value", tieCols = Seq("event_id"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("ts_us", "event_id")
      b.withColumn("enter",
          when(col("in_burst") === 1.0 &&
            coalesce(lag(col("in_burst"), 1).over(w), lit(0.0)) === 0.0, 1L)
            .otherwise(0L))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("in_burst").cast("long")).as("n_burst"),
          sum(col("enter")).as("n_episodes"))
        .orderBy("event_type")
    }),

    // Ordered funnel view → click → purchase on the ns axis: per-user
    // strictly-increasing step times, rolled to per-step reach counts
    // and total ns-to-convert — integer-exact end to end.
    "funnel_steps" -> ((s, dir) =>
      graft.operators.FunnelOps
        .funnel(events(s, dir), "user_id", "event_type", "ts_ns",
          Seq("view", "click", "purchase"))
        .agg(count(col("t1")).as("n_view"),
          count(col("t2")).as("n_click"),
          count(col("t3")).as("n_purchase"),
          sum(col("t3") - col("t1")).as("conv_ns"))),

    // Cohort retention matrix: first-active ISO week × week offset →
    // distinct returning users.
    "cohort_retention" -> ((s, dir) =>
      graft.operators.FunnelOps
        .cohortRetention(events(s, dir), "user_id", "ts")
        .orderBy("cohort_week", "offset")),

    // Winsorize to the per-type [p05, p95] band; the roll-up compares
    // raw vs clamped sums and counts the clamped rows — outlier
    // TREATMENT next to anomaly_mad's detection.
    "winsorize" -> ((s, dir) =>
      graft.operators.AnomalyOps
        .winsorize(events(s, dir).select("event_type", "value"),
          Seq("event_type"), "value", 0.05, 0.95)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("value") =!= col("clamped"), 1L).otherwise(0L))
            .as("n_clamped"),
          r4(min(col("p_lo"))).as("p_lo"), r4(min(col("p_hi"))).as("p_hi"),
          // sum the per-row shift (mostly zeros), NOT the difference
          // of two large sums — the latter amplifies cross-engine
          // summation-order drift past 4dp
          r4(sum(col("clamped") - col("value"))).as("mass_shift"))
        .orderBy("event_type")),

    // Data-gap detection: per series, inter-arrival deltas vs 3× the
    // series' own median delta — the missing-telemetry monitor, pure
    // composition of existing pieces (lag scan + exact percentile +
    // same-key join), integer-exact on the µs axis.
    "gap_detect" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("ts_us")
      val d = events(s, dir)
        .withColumn("ts_us", expr("ts_ns div 1000"))
        .withColumn("delta", col("ts_us") - lag(col("ts_us"), 1).over(w))
        .filter(col("delta").isNotNull)
      val med = d.groupBy("event_type")
        .agg(percentile(col("delta"), lit(0.5)).as("med"))
      d.join(med, "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_deltas"),
          sum(when(col("delta") > lit(3.0) * col("med"), 1L).otherwise(0L))
            .as("n_gaps"),
          max(col("delta")).as("max_gap_us"), r4(min(col("med"))).as("med_us"))
        .orderBy("event_type")
    }),

    // Seasonal decomposition of per-type daily sums (period 7 =
    // day-of-week): centered moving-average trend, per-phase seasonal
    // means, residual. Daily sums round to 4dp before the chain (the
    // moment-rounding trick) so both engines decompose identical
    // inputs.
    "decompose_stl" -> ((s, dir) => {
      val daily = events(s, dir)
        .groupBy(col("event_type"), date_trunc("DAY", col("ts")).as("d"))
        .agg(round(sum(col("value")), 4).as("v"))
      graft.dsl.FluxFrame.of(daily, "d", "v", "event_type")
        .decompose(7).toDF
        .select(col("event_type"), col("d"),
          r4(col("trend")).as("trend"), r4(col("seasonal")).as("seasonal"),
          r4(col("resid")).as("resid"))
        .orderBy("event_type", "d")
    })
  )

  private def w(s: String) = s.stripMargin

  /** Generated LTTB oracle: the sequential per-bucket selection can't
    * be one SQL expression, so the k−2 steps unroll as chained CTEs
    * (sel_i picks bucket i's point by lexicographic struct max on
    * (area, −x, −id); a_i is the next step's anchor) — mirrors
    * [[graft.operators.Lttb.select]] term for term: exact integer
    * bucket assignment, integer-sum centroid x, (ts, id)-ordered
    * double fold for centroid y, identical area expression.
    *
    * Every CTE is MATERIALIZED: without the hint DuckDB re-inlines
    * the 18-deep sel→a chain into each successor and the oracle goes
    * combinatorial — 217 s vs 0.2 s at sf0.01, identical rows (the
    * EmaFamilyQueries holtOracle hit the same wall).
    */
  private def lttbOracleSql(k: Int): String = {
    val nb = k - 2
    val steps = (0 until nb).map { i =>
      w(s"""sel${i + 1} AS MATERIALIZED (
           |  SELECT p.series,
           |    max(struct_pack(
           |      a := abs((s.ax - c.cx) * (p.y - s.ay) - (s.ax - p.x) * (c.cy - s.ay)),
           |      nx := -p.x, nid := -CAST(p.id AS DOUBLE),
           |      x := p.x, id := p.id, y := p.y)) AS m
           |  FROM pts p
           |  JOIN a$i s ON p.series = s.series AND p.b = $i
           |  JOIN tgt c ON c.series = p.series AND c.i = $i
           |  GROUP BY p.series),
           |a${i + 1} AS MATERIALIZED (SELECT series, m.x AS ax, m.y AS ay FROM sel${i + 1})""")
    }.mkString(",\n")
    val picks = (1 to nb)
      .map(i => s"SELECT series, m.x, m.id, m.y FROM sel$i")
      .mkString("\nUNION ALL\n")
    w(s"""WITH base AS MATERIALIZED (
         |  SELECT event_type AS series, epoch_us(ts) AS x, event_id AS id, value AS y,
         |    row_number() OVER (PARTITION BY event_type ORDER BY epoch_us(ts), event_id) - 1 AS j,
         |    count(*) OVER (PARTITION BY event_type) AS n
         |  FROM events),
         |pts AS MATERIALIZED (
         |  SELECT series, x, id, y, ((j - 1) * $nb) // (n - 2) AS b
         |  FROM base WHERE j >= 1 AND j <= n - 2),
         |firstpt AS MATERIALIZED (SELECT series, x, id, y FROM base WHERE j = 0),
         |lastpt AS MATERIALIZED (SELECT series, x, id, y FROM base WHERE j = n - 1),
         |cent AS MATERIALIZED (
         |  SELECT series, b,
         |    CAST(sum(x) AS DOUBLE) / count(*) AS cx,
         |    list_sum(list(y ORDER BY x, id)) / count(*) AS cy
         |  FROM pts GROUP BY 1, 2),
         |tgt AS MATERIALIZED (
         |  SELECT series, b - 1 AS i, cx, cy FROM cent WHERE b >= 1
         |  UNION ALL
         |  SELECT series, ${nb - 1} AS i, CAST(x AS DOUBLE) AS cx, y AS cy FROM lastpt),
         |a0 AS MATERIALIZED (SELECT series, x AS ax, y AS ay FROM firstpt),
         |$steps
         |SELECT series AS event_type, x AS tus, id AS event_id, y AS value FROM firstpt
         |UNION ALL
         |$picks
         |UNION ALL
         |SELECT series, x, id, y FROM lastpt
         |ORDER BY 1, 2, 3""")
  }

  val oracle: Map[String, String] = Map(
    "window_count" -> w(
      """SELECT event_type, time_bucket(INTERVAL '6 hours', ts) AS wstart, count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2"""),
    "window_sum" -> w(
      """SELECT event_type, time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS wend,
        |  round(sum(value), 4) AS sum_v
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2"""),
    "window_empty_fill" -> w(
      """WITH f AS (
        |  SELECT * FROM events WHERE event_type = 'purchase' AND value > 97
        |), agg AS (
        |  SELECT time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS wend,
        |    avg(value) AS mean_v
        |  FROM f GROUP BY 1
        |), spine AS (
        |  SELECT unnest(generate_series(
        |    time_bucket(INTERVAL '1 hour', min(ts)) + INTERVAL '1 hour',
        |    time_bucket(INTERVAL '1 hour', max(ts)) + INTERVAL '1 hour',
        |    INTERVAL '1 hour')) AS wend
        |  FROM f
        |)
        |SELECT 'purchase' AS event_type, s.wend, round(coalesce(a.mean_v, 0), 4) AS mean_v
        |FROM spine s LEFT JOIN agg a ON s.wend = a.wend ORDER BY s.wend"""),
    "derivative" -> w(
      """SELECT event_id, round((value - pv) / ((tus - ptus) / 1e6), 4) + 0.0 AS deriv FROM (
        |  SELECT event_id, value,
        |    lag(value) OVER w AS pv,
        |    CAST(epoch_us(ts) AS DOUBLE) AS tus,
        |    lag(CAST(epoch_us(ts) AS DOUBLE)) OVER w AS ptus
        |  FROM events WINDOW w AS (PARTITION BY event_type, user_id ORDER BY epoch_us(ts))
        |) WHERE pv IS NOT NULL ORDER BY event_id"""),
    "difference" -> w(
      """SELECT event_id, round(value - pv, 4) AS diff FROM (
        |  SELECT event_id, value, lag(value) OVER (PARTITION BY event_type, user_id ORDER BY epoch_us(ts)) AS pv
        |  FROM events
        |) WHERE pv IS NOT NULL ORDER BY event_id"""),
    "increase" -> w(
      """SELECT event_id, round(coalesce(sum(CASE WHEN d > 0 THEN d ELSE 0 END) OVER
        |    (PARTITION BY event_type, user_id ORDER BY epoch_us(ts) ROWS UNBOUNDED PRECEDING), 0), 4) AS inc
        |FROM (
        |  SELECT event_id, event_type, user_id, ts,
        |    value - lag(value) OVER (PARTITION BY event_type, user_id ORDER BY epoch_us(ts)) AS d
        |  FROM events
        |) ORDER BY event_id"""),
    "cumsum" -> w(
      """SELECT event_id, round(sum(value) OVER
        |  (PARTITION BY event_type, user_id ORDER BY epoch_us(ts) ROWS UNBOUNDED PRECEDING), 4) AS cs
        |FROM events ORDER BY event_id"""),
    "moving_avg" -> w(
      """SELECT event_id, round(ma, 4) AS ma FROM (
        |  SELECT event_id,
        |    avg(value) OVER w AS ma, count(*) OVER w AS c
        |  FROM events WINDOW w AS
        |    (PARTITION BY event_type, user_id ORDER BY epoch_us(ts) ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |) WHERE c = 5 ORDER BY event_id"""),
    "timed_mavg" -> w(
      """SELECT event_id, round(avg(CAST(floor(value) AS DOUBLE)) OVER
        |  (PARTITION BY event_type ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
        |   RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW), 4) AS tma
        |FROM events
        |WHERE epoch_us(ts) >= 1704672000000000 AND epoch_us(ts) < 1704758400000000
        |ORDER BY event_id"""),
    "elapsed" -> w(
      """SELECT event_id, el AS elapsed FROM (
        |  SELECT event_id,
        |    CAST(epoch_us(ts) AS DOUBLE) - lag(CAST(epoch_us(ts) AS DOUBLE)) OVER
        |      (PARTITION BY event_type, user_id ORDER BY epoch_us(ts)) AS el
        |  FROM events
        |) WHERE el IS NOT NULL ORDER BY event_id"""),
    "state_count" -> w(
      """SELECT event_id, CAST(CASE WHEN p THEN cnt ELSE -1 END AS BIGINT) AS sc FROM (
        |  SELECT event_id, p,
        |    sum(CASE WHEN p THEN 1 ELSE 0 END) OVER
        |      (PARTITION BY event_type, user_id, rst ORDER BY tus ROWS UNBOUNDED PRECEDING) AS cnt
        |  FROM (
        |    SELECT event_id, event_type, user_id, epoch_us(ts) AS tus, value > 75 AS p,
        |      sum(CASE WHEN value > 75 THEN 0 ELSE 1 END) OVER
        |        (PARTITION BY event_type, user_id ORDER BY epoch_us(ts) ROWS UNBOUNDED PRECEDING) AS rst
        |    FROM events)
        |) ORDER BY event_id"""),
    "state_duration" -> w(
      """SELECT event_id, CASE WHEN p THEN CAST(tus AS DOUBLE) - CAST(rs AS DOUBLE)
        |       ELSE -1.0 END AS sd FROM (
        |  SELECT event_id, p, tus,
        |    min(CASE WHEN p THEN tus END) OVER
        |      (PARTITION BY event_type, user_id, rst ORDER BY tus ROWS UNBOUNDED PRECEDING) AS rs
        |  FROM (
        |    SELECT event_id, event_type, user_id, epoch_us(ts) AS tus, value > 75 AS p,
        |      sum(CASE WHEN value > 75 THEN 0 ELSE 1 END) OVER
        |        (PARTITION BY event_type, user_id ORDER BY epoch_us(ts) ROWS UNBOUNDED PRECEDING) AS rst
        |    FROM events)
        |) ORDER BY event_id"""),
    "time_shift" -> w(
      """SELECT strftime(ts + INTERVAL 1 DAY, '%Y-%m-%d') AS d, count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1"""),
    "sample_10th" -> w(
      """SELECT event_id FROM (
        |  SELECT event_id, row_number() OVER (PARTITION BY event_type, user_id ORDER BY epoch_us(ts)) AS rn
        |  FROM events) WHERE (rn - 1) % 10 = 0 ORDER BY event_id"""),
    "limit_offset" -> w(
      """SELECT event_type, event_id FROM (
        |  SELECT event_type, event_id, row_number() OVER (PARTITION BY event_type, user_id ORDER BY epoch_us(ts)) AS rn
        |  FROM events) WHERE rn > 2 AND rn <= 7 ORDER BY 1, 2"""),
    "tail_4" -> w(
      """SELECT event_type, event_id FROM (
        |  SELECT event_type, event_id, row_number() OVER (PARTITION BY event_type, user_id ORDER BY epoch_us(ts) DESC) AS rn
        |  FROM events) WHERE rn <= 4 ORDER BY 1, 2"""),
    "top_bottom" -> w(
      """WITH ranked AS (
        |  SELECT event_type, event_id,
        |    row_number() OVER (PARTITION BY event_type, user_id ORDER BY value DESC, epoch_us(ts)) AS rt,
        |    row_number() OVER (PARTITION BY event_type, user_id ORDER BY value ASC, epoch_us(ts)) AS rb
        |  FROM events)
        |SELECT event_type, event_id, 'top' AS side FROM ranked WHERE rt <= 3
        |UNION ALL
        |SELECT event_type, event_id, 'bottom' AS side FROM ranked WHERE rb <= 3
        |ORDER BY 1, 3, 2"""),
    "highest_avg" -> w(
      """WITH keep AS (
        |  SELECT event_type, user_id FROM (
        |    SELECT event_type, user_id, avg(value) AS score
        |    FROM events GROUP BY 1, 2)
        |  ORDER BY score DESC, event_type LIMIT 3)
        |SELECT e.event_type, e.user_id, count(*) AS n, round(avg(e.value), 4) AS avg_v
        |FROM events e JOIN keep k ON e.event_type = k.event_type AND e.user_id = k.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2"""),
    "interpolate" -> w(
      """WITH f AS (
        |  SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, value FROM events
        |  WHERE epoch_us(ts) >= 1704672000000000 AND epoch_us(ts) < 1704758400000000
        |), bounds AS (
        |  SELECT event_type, min(ts) AS lo, max(ts) AS hi FROM f GROUP BY 1
        |), spine AS (
        |  SELECT event_type, unnest(generate_series(
        |    make_timestamp(CAST(ceil(epoch(lo) / 3600) * 3600 * 1000000 AS BIGINT)),
        |    hi, INTERVAL '3600 seconds')) AS ts
        |  FROM bounds
        |), u AS (
        |  SELECT event_type, ts, value, 1 AS obs FROM f
        |  UNION ALL
        |  SELECT s.event_type, s.ts, NULL, 0 FROM spine s
        |  WHERE NOT EXISTS (SELECT 1 FROM f WHERE f.event_type = s.event_type AND f.ts = s.ts)
        |), staged AS (
        |  SELECT event_type, ts, value, obs,
        |    last_value(value IGNORE NULLS) OVER wb AS pv,
        |    last_value(CASE WHEN value IS NOT NULL THEN epoch(ts) END IGNORE NULLS) OVER wb AS pt,
        |    first_value(value IGNORE NULLS) OVER wf AS nv,
        |    first_value(CASE WHEN value IS NOT NULL THEN epoch(ts) END IGNORE NULLS) OVER wf AS nt
        |  FROM u WINDOW
        |    wb AS (PARTITION BY event_type ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wf AS (PARTITION BY event_type ORDER BY ts ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |)
        |SELECT event_type, ts,
        |  round(CASE WHEN value IS NOT NULL THEN value
        |             WHEN pt = nt THEN pv
        |             ELSE pv + (nv - pv) * (epoch(ts) - pt) / (nt - pt) END, 4) AS v
        |FROM staged WHERE obs = 0 OR value IS NOT NULL ORDER BY 1, 2"""),
    "ema_10" -> w(
      """WITH RECURSIVE base AS (
        |  SELECT event_type, epoch_us(ts) AS tus, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY epoch_us(ts)) AS rn
        |  FROM events
        |  WHERE epoch_us(ts) >= 1704672000000000 AND epoch_us(ts) < 1704931200000000
        |), e AS (
        |  SELECT event_type, rn, tus,
        |    (SELECT sum(b2.value) FROM base b2
        |     WHERE b2.event_type = base.event_type AND b2.rn <= 10) / 10 AS ema
        |  FROM base WHERE rn = 10
        |  UNION ALL
        |  SELECT b.event_type, b.rn, b.tus, b.value * (2.0 / 11) + e.ema * (1 - 2.0 / 11)
        |  FROM base b JOIN e ON b.event_type = e.event_type AND b.rn = e.rn + 1
        |)
        |SELECT event_type, tus, round(ema, 4) AS ema FROM e ORDER BY 1, 2"""),
    "cmo_10" -> w(
      """SELECT event_type, tus, round((up - dn) / nullif(up + dn, 0) * 100, 4) AS cmo FROM (
        |  SELECT event_type, tus, c,
        |    sum(CASE WHEN d > 0 THEN d ELSE 0 END) OVER w AS up,
        |    sum(CASE WHEN d < 0 THEN -d ELSE 0 END) OVER w AS dn
        |  FROM (
        |    SELECT event_type, epoch_us(ts) AS tus,
        |      value - lag(value) OVER (PARTITION BY event_type ORDER BY epoch_us(ts)) AS d,
        |      row_number() OVER (PARTITION BY event_type ORDER BY epoch_us(ts)) - 1 AS c
        |    FROM events
        |    WHERE epoch_us(ts) >= 1704672000000000 AND epoch_us(ts) < 1704758400000000
        |  ) WHERE d IS NOT NULL
        |  WINDOW w AS (PARTITION BY event_type ORDER BY tus ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
        |) WHERE c >= 10 ORDER BY 1, 2"""),
    "rsi_10" -> w(
      """WITH RECURSIVE base AS (
        |  SELECT event_type, epoch_us(ts) AS tus, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY epoch_us(ts)) AS rn
        |  FROM events
        |  WHERE epoch_us(ts) >= 1704672000000000 AND epoch_us(ts) < 1704758400000000
        |), gains AS (
        |  SELECT event_type, rn, tus, value,
        |    greatest(value - lag(value) OVER (PARTITION BY event_type ORDER BY rn), 0) AS g,
        |    greatest(lag(value) OVER (PARTITION BY event_type ORDER BY rn) - value, 0) AS l
        |  FROM base
        |), seed AS (
        |  SELECT event_type, 11 AS rn, sum(g) / 10 AS ag, sum(l) / 10 AS al
        |  FROM gains WHERE rn BETWEEN 2 AND 11 GROUP BY 1
        |), e AS (
        |  SELECT s.event_type, s.rn, g2.tus, s.ag, s.al
        |  FROM seed s JOIN gains g2 ON g2.event_type = s.event_type AND g2.rn = 11
        |  UNION ALL
        |  SELECT g.event_type, g.rn, g.tus,
        |    (e.ag * 9 + g.g) / 10, (e.al * 9 + g.l) / 10
        |  FROM gains g JOIN e ON g.event_type = e.event_type AND g.rn = e.rn + 1
        |)
        |SELECT event_type, tus,
        |  round(CASE WHEN al = 0 THEN 100 ELSE 100 - 100 / (1 + ag / al) END, 4) AS rsi
        |FROM e ORDER BY 1, 2"""),
    // forward delta via lead; the series' last row closes at the stop
    "events_duration" -> w(
      """SELECT event_type, epoch_us(ts) AS tus,
        |  CAST(coalesce(lead(epoch_us(ts)) OVER w, 1706745600000000)
        |    - epoch_us(ts) AS BIGINT) AS dur_us
        |FROM events WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts))
        |ORDER BY event_type, tus"""),
    // sessions split where the µs gap exceeds 6h; session = running
    // count of splits, 1-based like the engine verb
    "sessionize" -> w(
      """WITH g AS (
        |  SELECT user_id, epoch_us(ts) AS tus, value,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 21600000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
        |), s AS (
        |  SELECT user_id, tus, value,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY tus
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session
        |  FROM g)
        |SELECT user_id, session, count(*) AS n,
        |  max(tus) - min(tus) AS dur_us, round(sum(value), 4) AS sum_v
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2"""),
    // paths/transitions: the sessionize CTE with the event_id
    // tie-break added to every ordering (sequence order must be total)
    "event_paths" -> w(
      """WITH g AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tus,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 21600000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |), s AS (
        |  SELECT user_id, event_id, event_type, tus,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session
        |  FROM g
        |), p AS (
        |  SELECT user_id, session, (list(event_type ORDER BY tus, event_id))[1:8] AS seq
        |  FROM s GROUP BY 1, 2)
        |SELECT array_to_string(seq, '>') AS path,
        |  CAST(len(seq) AS BIGINT) AS path_len, count(*) AS n_sessions
        |FROM p GROUP BY 1, 2 ORDER BY n_sessions DESC, path LIMIT 25"""),
    "markov_transitions" -> w(
      """WITH g AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tus,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 21600000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |), s AS (
        |  SELECT user_id, event_id, event_type, tus,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session
        |  FROM g
        |), tr AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id, session ORDER BY tus, event_id) AS to_type
        |  FROM s
        |), c AS (
        |  SELECT from_type, to_type, count(*) AS n
        |  FROM tr WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  round(CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE), 4) AS prob
        |FROM c ORDER BY 1, 2"""),
    // decile arrays indexed 1-based; q label = i/10.0 (the same double
    // the engine's literal list carries)
    "quantile_drift" -> w(
      """WITH m AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid FROM events),
        |r AS (SELECT quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qv
        |      FROM events, m WHERE epoch_us(ts) < mid),
        |c AS (SELECT quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qv
        |      FROM events, m WHERE epoch_us(ts) >= mid),
        |g AS (SELECT CAST(i AS INTEGER) AS i FROM generate_series(1, 9) t(i))
        |SELECT round(i / 10.0, 4) AS q, round(r.qv[i], 4) AS ref,
        |  round(c.qv[i], 4) AS cur, round(c.qv[i] - r.qv[i], 4) AS shift
        |FROM r, c, g ORDER BY q"""),
    // kll_drift: disc-rank deciles (the KLL exact-mode semantics —
    // ceil(q·n)-th smallest, the kll_quantiles rank rule) per half
    "kll_drift" -> w(
      """WITH m AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid FROM events),
        |ra AS (SELECT value AS v, row_number() OVER (ORDER BY value) AS rn,
        |    count(*) OVER () AS n
        |  FROM events, m WHERE epoch_us(ts) < mid),
        |rb AS (SELECT value AS v, row_number() OVER (ORDER BY value) AS rn,
        |    count(*) OVER () AS n
        |  FROM events, m WHERE epoch_us(ts) >= mid),
        |qs AS (SELECT * FROM (VALUES (0, 0.1), (1, 0.2), (2, 0.3), (3, 0.4),
        |  (4, 0.5), (5, 0.6), (6, 0.7), (7, 0.8), (8, 0.9)) AS t(qi, q)),
        |a AS (SELECT qi, v AS ref FROM ra
        |  JOIN qs ON rn = greatest(1, CAST(ceil(q * n) AS BIGINT))),
        |b AS (SELECT qi, v AS cur FROM rb
        |  JOIN qs ON rn = greatest(1, CAST(ceil(q * n) AS BIGINT)))
        |SELECT CAST(a.qi AS BIGINT) AS qi, round(ref, 4) AS ref,
        |  round(cur, 4) AS cur, round(cur - ref, 4) AS shift
        |FROM a JOIN b ON a.qi = b.qi ORDER BY qi"""),
    // PSI: proportions divide BIGINT counts by DOUBLE totals (same
    // IEEE ops as the engine); contrib uses the unrounded proportions
    "psi_drift" -> w(
      """WITH m AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid FROM events),
        |r AS (SELECT least(greatest(CAST(floor((value - 0.0) / 25.0) AS BIGINT), -1), 20) AS bucket
        |      FROM events, m WHERE epoch_us(ts) < mid),
        |c AS (SELECT least(greatest(CAST(floor((value - 0.0) / 25.0) AS BIGINT), -1), 20) AS bucket
        |      FROM events, m WHERE epoch_us(ts) >= mid),
        |rh AS (SELECT bucket, count(*) AS n_ref FROM r GROUP BY 1),
        |ch AS (SELECT bucket, count(*) AS n_cur FROM c GROUP BY 1),
        |j AS (SELECT COALESCE(rh.bucket, ch.bucket) AS bucket,
        |        COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur
        |      FROM rh FULL OUTER JOIN ch ON rh.bucket = ch.bucket),
        |t AS (SELECT CAST(sum(n_ref) AS DOUBLE) AS tr, CAST(sum(n_cur) AS DOUBLE) AS tc FROM j)
        |SELECT bucket, n_ref, n_cur,
        |  round(n_ref / tr, 4) AS p_ref, round(n_cur / tc, 4) AS p_cur,
        |  round((n_cur / tc - n_ref / tr) *
        |    ln(greatest(n_cur / tc, 1e-6) / greatest(n_ref / tr, 1e-6)), 4) AS contrib
        |FROM j, t ORDER BY bucket"""),
    "lttb_downsample" -> lttbOracleSql(20),
    "attribution" -> w(
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tus, event_id FROM events),
        |conv AS (SELECT * FROM e WHERE event_type IN ('purchase', 'signup')),
        |touch AS (SELECT * FROM e WHERE event_type NOT IN ('purchase', 'signup')),
        |j AS (
        |  SELECT c.user_id, c.event_type, c.tus, c.event_id,
        |    min(CASE WHEN t.user_id IS NOT NULL
        |             THEN struct_pack(ts := t.tus, t := t.event_type) END) AS f,
        |    max(CASE WHEN t.user_id IS NOT NULL
        |             THEN struct_pack(ts := t.tus, t := t.event_type) END) AS l
        |  FROM conv c LEFT JOIN touch t
        |    ON t.user_id = c.user_id
        |    AND t.tus >= c.tus - 21600000000 AND t.tus <= c.tus - 1
        |  GROUP BY 1, 2, 3, 4)
        |SELECT user_id, event_type, tus, event_id,
        |  f.t AS first_touch, f.ts AS first_ts, l.t AS last_touch, l.ts AS last_ts
        |FROM j ORDER BY user_id, tus, event_id"""),
    "attribution_credit" -> w(
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tus, event_id FROM events),
        |conv AS (SELECT * FROM e WHERE event_type IN ('purchase', 'signup')),
        |touch AS (SELECT * FROM e WHERE event_type NOT IN ('purchase', 'signup')),
        |j AS (
        |  SELECT c.user_id, c.event_type, c.tus, c.event_id,
        |    count(t.tus) AS n_touches,
        |    list(t.tus ORDER BY t.tus) FILTER (WHERE t.tus IS NOT NULL) AS tl
        |  FROM conv c LEFT JOIN touch t
        |    ON t.user_id = c.user_id
        |    AND t.tus >= c.tus - 21600000000 AND t.tus <= c.tus - 1
        |  GROUP BY 1, 2, 3, 4)
        |SELECT user_id, event_type, tus, event_id, n_touches,
        |  round(COALESCE(list_sum(list_transform(tl, x -> exp((x - tus) / 7200000000.0))), 0.0), 4)
        |    AS decay_sum
        |FROM j ORDER BY user_id, tus, event_id"""),
    "corpus_diff" -> w(
      """WITH old AS (SELECT doc_id AS id, md5(text) AS fp FROM documents WHERE doc_id % 13 <> 0),
        |cur AS (SELECT doc_id AS id,
        |          md5(CASE WHEN doc_id % 7 = 0 THEN text || ' edit' ELSE text END) AS fp
        |        FROM documents WHERE doc_id % 11 <> 0),
        |d AS (SELECT COALESCE(old.id, cur.id) AS id,
        |        CASE WHEN old.fp IS NULL THEN 'added'
        |             WHEN cur.fp IS NULL THEN 'removed'
        |             WHEN old.fp <> cur.fp THEN 'changed'
        |             ELSE 'unchanged' END AS status
        |      FROM old FULL OUTER JOIN cur ON old.id = cur.id)
        |SELECT status, count(*) AS n FROM d GROUP BY 1 ORDER BY 1"""),
    "js_drift" -> w(
      """WITH m AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid FROM events),
        |r AS (SELECT least(greatest(CAST(floor((value - 0.0) / 25.0) AS BIGINT), -1), 20) AS bucket
        |      FROM events, m WHERE epoch_us(ts) < mid),
        |c AS (SELECT least(greatest(CAST(floor((value - 0.0) / 25.0) AS BIGINT), -1), 20) AS bucket
        |      FROM events, m WHERE epoch_us(ts) >= mid),
        |rh AS (SELECT bucket, count(*) AS n_ref FROM r GROUP BY 1),
        |ch AS (SELECT bucket, count(*) AS n_cur FROM c GROUP BY 1),
        |j AS (SELECT COALESCE(rh.bucket, ch.bucket) AS bucket,
        |        COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur
        |      FROM rh FULL OUTER JOIN ch ON rh.bucket = ch.bucket),
        |t AS (SELECT CAST(sum(n_ref) AS DOUBLE) AS tr, CAST(sum(n_cur) AS DOUBLE) AS tc FROM j),
        |p AS (SELECT bucket, n_ref, n_cur, n_ref / tr AS pr, n_cur / tc AS pc FROM j, t)
        |SELECT bucket, n_ref, n_cur,
        |  round((CASE WHEN pr > 0 THEN pr * ln(pr / ((pr + pc) / 2)) ELSE 0.0 END +
        |         CASE WHEN pc > 0 THEN pc * ln(pc / ((pr + pc) / 2)) ELSE 0.0 END) / 2, 4) AS contrib_js
        |FROM p ORDER BY bucket"""),
    "cat_drift" -> w(
      """WITH rh AS (SELECT lang, count(*) AS n_ref FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),
        |ch AS (SELECT lang, count(*) AS n_cur FROM documents WHERE doc_id % 2 = 1 GROUP BY 1),
        |j AS (SELECT COALESCE(rh.lang, ch.lang) AS lang,
        |        COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur
        |      FROM rh FULL OUTER JOIN ch ON rh.lang = ch.lang),
        |t AS (SELECT CAST(sum(n_ref) AS DOUBLE) AS tr, CAST(sum(n_cur) AS DOUBLE) AS tc FROM j)
        |SELECT lang, n_ref, n_cur,
        |  round(n_ref / tr, 4) AS p_ref, round(n_cur / tc, 4) AS p_cur,
        |  round((n_cur / tc - n_ref / tr) *
        |    ln(greatest(n_cur / tc, 1e-6) / greatest(n_ref / tr, 1e-6)), 4) AS contrib
        |FROM j, t ORDER BY lang"""),
    // anomaly_mad: the same interpolated percentiles as `quantiles`,
    // the same |x − med| expression tree, strict > on the 3·MAD bound
    "anomaly_mad" -> w(
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY 1),
        |d AS (
        |  SELECT e.event_type, abs(e.value - med.med) AS ad, med.med
        |  FROM events e JOIN med USING (event_type)),
        |m AS (SELECT event_type, quantile_cont(ad, 0.5) AS mad FROM d GROUP BY 1)
        |SELECT d.event_type, count(*) AS n,
        |  CAST(sum(CASE WHEN d.ad > 3.0 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_anom,
        |  round(min(d.med), 4) AS med, round(min(m.mad), 4) AS mad
        |FROM d JOIN m USING (event_type) GROUP BY 1 ORDER BY 1"""),
    // cusum_drift: the recurrence replayed as a recursive CTE in the
    // same µs row order; μ/σ round to 4dp on both sides, each step's
    // increment parenthesized to mirror the engine's precomputed xdev
    // slot = epoch-hour mod 168 (integer, calendar-free); moments from
    // exact integer unit sums, FP only on identical integer inputs —
    // the op sequence mirrors AnomalyOps.seasonalBaseline term by term
    "seasonal_baseline" -> w(
      """WITH sl AS MATERIALIZED (
        |  SELECT event_type, (epoch_us(ts) // 3600000000) % 168 AS how,
        |    CAST(round(value * 10000) AS BIGINT) AS u
        |  FROM events),
        |b AS MATERIALIZED (
        |  SELECT event_type, how, count(*) AS n, sum(u) AS s,
        |    sum(CAST(u AS HUGEINT) * u) AS q
        |  FROM sl GROUP BY 1, 2),
        |bm AS MATERIALIZED (
        |  SELECT event_type, how, n,
        |    CAST((2 * s + n) // (2 * n) AS DOUBLE) / 10000.0 AS mu,
        |    round(sqrt(greatest(
        |      (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
        |        / n, 0.0)) / 10000.0, 4) AS sg
        |  FROM b)
        |SELECT bm.event_type, bm.how, bm.n, bm.mu, bm.sg,
        |  CAST(sum(CASE WHEN bm.sg > 0
        |    AND abs(CAST(sl.u AS DOUBLE) / 10000.0 - bm.mu) > 3.0 * bm.sg
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_flag
        |FROM sl JOIN bm USING (event_type, how)
        |GROUP BY 1, 2, 3, 4, 5 ORDER BY 1, 2"""),

    // ev/st MATERIALIZED: the recursion references both every
    // iteration; un-hinted DuckDB re-inlines them (22 s → 4 s)
    "cusum_drift" -> w(
      """WITH RECURSIVE ev AS MATERIALIZED (
        |  SELECT event_type, epoch_us(ts) AS tus, value,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY epoch_us(ts), event_id)
        |      AS rn
        |  FROM events),
        |st AS MATERIALIZED (
        |  SELECT event_type, round(avg(value), 4) AS mu,
        |    round(stddev_pop(value), 4) AS sg
        |  FROM events GROUP BY 1),
        |c AS (
        |  SELECT e.event_type, e.rn,
        |    greatest(0.0, e.value - st.mu - 0.5 * st.sg) AS s
        |  FROM ev e JOIN st USING (event_type) WHERE e.rn = 1
        |  UNION ALL
        |  SELECT e.event_type, e.rn,
        |    greatest(0.0, c.s + (e.value - st.mu - 0.5 * st.sg))
        |  FROM c JOIN ev e ON e.event_type = c.event_type AND e.rn = c.rn + 1
        |  JOIN st ON st.event_type = e.event_type)
        |SELECT c.event_type, count(*) AS n,
        |  CAST(sum(CASE WHEN c.s > 4.0 * st.sg THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_alarms,
        |  round(max(c.s), 4) AS max_s
        |FROM c JOIN st ON st.event_type = c.event_type
        |GROUP BY 1 ORDER BY 1"""),
    // burst automaton replayed in CLOSED FORM (no recursive CTE —
    // the row-at-a-time recursion cost ~25 s/surface in the oracle
    // engine): the hysteresis state is a pure integer function of the
    // tier signal's run structure — a row is in-burst iff its tier is
    // ≥1 and the head of its segment (rows since the last non-1 tier,
    // inclusive) is tier 2; leading-1 segments have a tier-1 head and
    // stay out. Integer-exact, so it replays the engine's sequential
    // automaton bit-for-bit with two window passes.
    "burst_detect" -> w(
      """WITH ev AS (
        |  SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY epoch_us(ts), event_id)
        |      AS rn
        |  FROM events),
        |st AS (
        |  SELECT event_type, round(avg(value), 4) AS mu,
        |    round(stddev_pop(value), 4) AS sg
        |  FROM events GROUP BY 1),
        |x AS (
        |  SELECT e.event_type, e.rn,
        |    CASE WHEN e.value > st.mu + 2.0 * st.sg THEN 2
        |         WHEN e.value > st.mu + 0.5 * st.sg THEN 1 ELSE 0 END AS x
        |  FROM ev e JOIN st USING (event_type)),
        |seg AS (
        |  SELECT event_type, rn, x,
        |    sum(CASE WHEN x <> 1 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY event_type ORDER BY rn) AS sid
        |  FROM x),
        |c AS (
        |  SELECT event_type, rn,
        |    CASE WHEN x = 0 THEN 0
        |         WHEN x = 2 THEN 1
        |         WHEN first_value(x) OVER
        |             (PARTITION BY event_type, sid ORDER BY rn) = 2
        |           THEN 1 ELSE 0 END AS b
        |  FROM seg),
        |t AS (SELECT event_type, rn, b,
        |        lag(b) OVER (PARTITION BY event_type ORDER BY rn) AS pb
        |      FROM c)
        |SELECT event_type, count(*) AS n, CAST(sum(b) AS BIGINT) AS n_burst,
        |  CAST(sum(CASE WHEN b = 1 AND coalesce(pb, 0) = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_episodes
        |FROM t GROUP BY 1 ORDER BY 1"""),
    // funnel: each step's min strictly after the previous step's time
    "funnel_steps" -> w(
      """WITH s1 AS (
        |  SELECT user_id, min(epoch_ns(ts)) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT s1.user_id, s1.t1,
        |    min(CASE WHEN epoch_ns(e.ts) > s1.t1 THEN epoch_ns(e.ts) END) AS t2
        |  FROM s1 LEFT JOIN events e
        |    ON e.user_id = s1.user_id AND e.event_type = 'click'
        |  GROUP BY 1, 2),
        |s3 AS (
        |  SELECT s2.user_id, s2.t1, s2.t2,
        |    min(CASE WHEN epoch_ns(e.ts) > s2.t2 THEN epoch_ns(e.ts) END) AS t3
        |  FROM s2 LEFT JOIN events e
        |    ON e.user_id = s2.user_id AND e.event_type = 'purchase'
        |  GROUP BY 1, 2, 3)
        |SELECT count(t1) AS n_view, count(t2) AS n_click,
        |  count(t3) AS n_purchase, CAST(sum(t3 - t1) AS BIGINT) AS conv_ns
        |FROM s3"""),
    // winsorize: same interpolated percentiles, same clamp tree,
    // per-row shift summed
    "winsorize" -> w(
      """WITH b AS (
        |  SELECT event_type, quantile_cont(value, 0.05) AS p_lo,
        |    quantile_cont(value, 0.95) AS p_hi
        |  FROM events GROUP BY 1),
        |c AS (
        |  SELECT e.event_type, e.value, b.p_lo, b.p_hi,
        |    least(greatest(e.value, b.p_lo), b.p_hi) AS clamped
        |  FROM events e JOIN b USING (event_type))
        |SELECT event_type, count(*) AS n,
        |  CAST(sum(CASE WHEN value <> clamped THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clamped,
        |  round(min(p_lo), 4) AS p_lo, round(min(p_hi), 4) AS p_hi,
        |  round(sum(clamped - value), 4) AS mass_shift
        |FROM c GROUP BY 1 ORDER BY 1"""),
    // gap_detect: same lag/median/3× trees on the µs axis
    "gap_detect" -> w(
      """WITH d AS (
        |  SELECT event_type,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER
        |      (PARTITION BY event_type ORDER BY epoch_us(ts)) AS delta
        |  FROM events),
        |dd AS (SELECT * FROM d WHERE delta IS NOT NULL),
        |m AS (SELECT event_type, quantile_cont(delta, 0.5) AS med
        |  FROM dd GROUP BY 1)
        |SELECT dd.event_type, count(*) AS n_deltas,
        |  CAST(sum(CASE WHEN dd.delta > 3.0 * m.med THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_gaps,
        |  max(dd.delta) AS max_gap_us, round(min(m.med), 4) AS med_us
        |FROM dd JOIN m USING (event_type) GROUP BY 1 ORDER BY 1"""),
    // decompose: same rounded daily inputs, same centered-window /
    // phase-mean / residual trees
    "decompose_stl" -> w(
      """WITH daily AS (
        |  SELECT event_type, date_trunc('day', ts) AS d,
        |    round(sum(value), 4) AS v
        |  FROM events GROUP BY 1, 2),
        |t AS (
        |  SELECT event_type, d, v,
        |    CASE WHEN count(*) OVER wc = 7 THEN avg(v) OVER wc END AS trend,
        |    (row_number() OVER (PARTITION BY event_type ORDER BY d) - 1) % 7
        |      AS phase
        |  FROM daily WINDOW wc AS (PARTITION BY event_type ORDER BY d
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |s AS (SELECT *, avg(v - trend)
        |    OVER (PARTITION BY event_type, phase) AS seasonal FROM t)
        |SELECT event_type, d, round(trend, 4) AS trend,
        |  round(seasonal, 4) AS seasonal,
        |  round(v - trend - seasonal, 4) AS resid
        |FROM s ORDER BY event_type, d"""),
    // cohort: ISO-week truncation and integer epoch-week offsets
    "cohort_retention" -> w(
      """WITH uw AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
        |c AS (SELECT user_id, min(wk) AS cw FROM uw GROUP BY 1)
        |SELECT c.cw AS cohort_week,
        |  CAST(datediff('day', c.cw, uw.wk) // 7 AS BIGINT) AS offset,
        |  count(DISTINCT uw.user_id) AS n_users
        |FROM uw JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""")
  )
}
