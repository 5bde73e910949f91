package graft.queries

import graft.flux.FluxEval
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gate entries driven through the Flux TEXT front-end — the query
  * enters as Flux source, is parsed and evaluated onto the DSL, and
  * must hash-match the same SQL oracle as a hand-written pipeline
  * (proves the text surface, parser, and evaluator end-to-end).
  */
object FluxQueries {
  import QueryUtil._

  private def source(s: SparkSession, dir: String) = FluxEval.Source(
    resolve = _ => ev(s, dir),
    rename = Map("_time" -> "ts", "_value" -> "value", "_measurement" -> "event_type"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // anomaly verbs through the text surface: the evaluator routes to
    // AnomalyOps, so the same recursive-CTE / percentile oracles gate
    // the parse+eval path too
    "flux_cusum" -> ((s, dir) =>
      FluxEval.run("""from(bucket: "events") |> cusum()""", source(s, dir))
        .groupBy(col("_measurement").as("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("alarm"), 1L).otherwise(0L)).as("n_alarms"),
          r4(max(col("cusum"))).as("max_s"))
        .orderBy("event_type")),

    // winsorize through the text surface — same clamp-band roll-up
    // (and oracle) as the DSL `winsorize` gate
    "flux_winsorize" -> ((s, dir) =>
      FluxEval.run("""from(bucket: "events") |> winsorize(lo: 0.05, hi: 0.95)""",
        source(s, dir))
        .groupBy(col("_measurement").as("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("_value") =!= col("clamped"), 1L).otherwise(0L))
            .as("n_clamped"),
          r4(min(col("p_lo"))).as("p_lo"), r4(min(col("p_hi"))).as("p_hi"),
          r4(sum(col("clamped") - col("_value"))).as("mass_shift"))
        .orderBy("event_type")),

    // bursts through the text surface — same automaton + roll-up (and
    // oracle) as the DSL burst_detect gate
    "flux_bursts" -> ((s, dir) => {
      val b = FluxEval.run(
        """from(bucket: "events") |> bursts(hi: 2.0, lo: 0.5)""",
        source(s, dir))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("_measurement").orderBy("_time")
      b.withColumn("enter",
          when(col("in_burst") === 1.0 &&
            coalesce(lag(col("in_burst"), 1).over(w), lit(0.0)) === 0.0, 1L)
            .otherwise(0L))
        .groupBy(col("_measurement").as("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("in_burst").cast("long")).as("n_burst"),
          sum(col("enter")).as("n_episodes"))
        .orderBy("event_type")
    }),

    // seasonal baseline through the text surface — same slot moments
    // + roll-up (and oracle) as the DSL seasonal_baseline gate
    "flux_seasonal" -> ((s, dir) => {
      val b = FluxEval.run(
        """from(bucket: "events") |> seasonalBaseline()""", source(s, dir))
      b.groupBy(col("_measurement").as("event_type"), col("how"),
          col("mu"), col("sg"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("flag"), 1L).otherwise(0L)).as("n_flag"))
        .select("event_type", "how", "n", "mu", "sg", "n_flag")
        .orderBy("event_type", "how")
    }),

    // acf through the text surface — the evaluator routes to
    // SeriesMiningOps on the frame's group key; (series, time) is
    // unique so time-only ordering equals the DSL gate's total order
    "flux_acf" -> ((s, dir) =>
      FluxEval.run("""from(bucket: "events") |> acf(lags: 10)""",
        source(s, dir))
        .select(col("_measurement").as("event_type"), col("lag").cast("long").as("lag"),
          r4(col("acf")).as("acf"))
        .orderBy("event_type", "lag")),

    // hourly downsample |> trend forecast — the dashboard "where is
    // this metric heading" pipeline, entirely through text
    "flux_forecast" -> ((s, dir) =>
      FluxEval.run(
        """from(bucket: "events")
          |  |> aggregateWindow(every: 1h, fn: sum)
          |  |> forecastLinear(h: 6, every: 1h)""".stripMargin,
        source(s, dir))
        .select(col("_measurement").as("event_type"), col("step"), r4(col("slope")).as("slope"),
          r4(col("intercept")).as("intercept"), r4(col("yhat")).as("yhat"))
        .orderBy("event_type", "step")),

    // hourly downsample |> changepoints: same centi-quantized series
    // as the DSL gate (costs rescaled to its 10⁸ cents² convention)
    "flux_changepoints" -> ((s, dir) =>
      FluxEval.run(
        """from(bucket: "events")
          |  |> aggregateWindow(every: 1h, fn: sum)
          |  |> changepoints()""".stripMargin,
        source(s, dir))
        .select(col("_measurement").as("event_type"), col("depth"), col("t"),
          r4(col("cost") / 1.0e4).as("cost"))
        .orderBy("event_type", "depth", "t")),

    // lttb through the text surface: same 18-step selection as the DSL
    // gate; _measurement is the series, time its own tie-break (the
    // corpus has no (series, ts) duplicates — store LWW forbids them)
    "flux_lttb" -> ((s, dir) =>
      FluxEval.run("""from(bucket: "events") |> lttb(n: 20)""", source(s, dir))
        .select(col("_measurement").as("event_type"),
          unix_micros(col("_time")).as("tus"), col("_value").as("value"))
        .orderBy("event_type", "tus")),

    // daily downsample |> robust slope — Theil–Sen through the text
    // surface; window sums are bit-stable cross-engine (grid-exact)
    // and the slope is invariant to the window-stop offset
    "flux_theil_sen" -> ((s, dir) =>
      FluxEval.run(
        """from(bucket: "events")
          |  |> aggregateWindow(every: 1d, fn: sum)
          |  |> theilSen(every: 1d)""".stripMargin,
        source(s, dir))
        .select(col("_measurement").as("event_type"), col("n_pairs"),
          r4(col("med_slope")).as("med_slope"))
        .orderBy("event_type")),

    "flux_anomalies" -> ((s, dir) =>
      FluxEval.run("""from(bucket: "events") |> anomalies(k: 3.0)""", source(s, dir))
        .groupBy(col("_measurement").as("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("is_anom"), 1L).otherwise(0L)).as("n_anom"),
          r4(min(col("med"))).as("med"), r4(min(col("mad"))).as("mad"))
        .orderBy("event_type")),

    // decompose through the text surface over the same rounded daily
    // inputs as decompose_stl — reuses that gate's oracle
    "flux_decompose" -> ((s, dir) => {
      val daily = events(s, dir)
        .groupBy(col("event_type"), date_trunc("DAY", col("ts")).as("d"))
        .agg(round(sum(col("value")), 4).as("v"))
      FluxEval.run("""from(bucket: "daily") |> decompose(period: 7)""",
        FluxEval.Source(
          resolve = _ => graft.dsl.FluxFrame.of(daily, "d", "v", "event_type"),
          rename = Map("_time" -> "d", "_value" -> "v", "_measurement" -> "event_type")))
        .select(col("_measurement").as("event_type"), col("_time").as("d"),
          r4(col("trend")).as("trend"), r4(col("seasonal")).as("seasonal"),
          r4(col("resid")).as("resid"))
        .orderBy("event_type", "d")
    }),

    "flux_downsample" -> ((s, dir) =>
      FluxEval.run(
        """from(bucket: "events")
          ||> range(start: 2024-01-08T00:00:00Z, stop: 2024-01-15T00:00:00Z)
          ||> filter(fn: (r) => r._measurement == "click" or r._measurement == "view")
          ||> aggregateWindow(every: 6h, fn: mean)""".stripMargin,
        source(s, dir))
        .select(col("_measurement"), col("_time").as("wend"), r4(col("_value")).as("mean_v"))
        .orderBy("_measurement", "wend")),

    // calendar-month downsample: `every: 1mo` buckets on epoch-aligned
    // month boundaries (no fixed ns width — Spark's window() can't
    // express it). Source widens the 30-day corpus with a 35-day
    // shifted copy so the bucketing spans Jan/Feb/Mar non-trivially.
    "flux_month_window" -> ((s, dir) => {
      val base = events(s, dir).select("event_type", "ts", "value")
      val both = base.unionByName(base.withColumn("ts", col("ts") + expr("INTERVAL 35 DAYS")))
      FluxEval.run(
        """from(bucket: "events")
          ||> aggregateWindow(every: 1mo, fn: sum)""".stripMargin,
        FluxEval.Source(
          resolve = _ => graft.dsl.FluxFrame.of(both, "ts", "value", "event_type"),
          rename = Map("_time" -> "ts", "_value" -> "value", "_measurement" -> "event_type")))
        .select(col("_measurement"), col("_time").as("wend"), r4(col("_value")).as("sum_v"))
        .orderBy("_measurement", "wend")
    }),

    // offset + timezone downsample: 1d buckets on the Etc/GMT+5 wall
    // clock shifted to 06:00 local starts, labels back as UTC instants —
    // the dashboard-day form (`timezone.location` in text).
    "flux_tz_offset" -> ((s, dir) =>
      FluxEval.run(
        """from(bucket: "events")
          ||> range(start: 2024-01-08T00:00:00Z, stop: 2024-01-11T00:00:00Z)
          ||> filter(fn: (r) => r._measurement == "click" or r._measurement == "view")
          ||> aggregateWindow(every: 1d, offset: 6h, fn: sum, location: timezone.location(name: "Etc/GMT+5"))""".stripMargin,
        source(s, dir))
        .select(col("_measurement"), col("_time").as("wend"), r4(col("_value")).as("sum_v"))
        .orderBy("_measurement", "wend")),

    // schema package: Grafana's Flux-mode template-variable queries
    // (import header + dotted call heads).
    "flux_schema_measurements" -> ((s, dir) =>
      FluxEval.run(
        """import "influxdata/influxdb/schema"
          |schema.measurements(bucket: "events")""".stripMargin,
        source(s, dir))
        .orderBy("_value")),

    "flux_schema_tag_values" -> ((s, dir) =>
      FluxEval.run(
        """import "influxdata/influxdb/schema"
          |schema.tagValues(bucket: "events", tag: "user_id")""".stripMargin,
        source(s, dir))
        .orderBy("_value")),

    // hourSelection(): hour-of-day row filter, the wrap-around form
    // (22→2 keeps 22,23,0,1,2 UTC) — a pure scan predicate.
    "flux_hour" -> ((s, dir) =>
      FluxEval.run(
        """from(bucket: "events")
          ||> range(start: 2024-01-08T00:00:00Z, stop: 2024-01-15T00:00:00Z)
          ||> hourSelection(start: 22, stop: 2)
          ||> aggregateWindow(every: 1d, fn: count)""".stripMargin,
        source(s, dir))
        .select(col("_measurement"), col("_time").as("wend"), col("_value").as("n"))
        .orderBy("_measurement", "wend")),

    "flux_topk" -> ((s, dir) =>
      FluxEval.run(
        """from(bucket: "events")
          ||> filter(fn: (r) => r._value > 90 and r._measurement != "error")
          ||> top(n: 5)
          ||> keep(columns: ["_measurement", "event_id", "_value"])""".stripMargin,
        source(s, dir))
        .select(col("_measurement"), col("event_id"), r4(col("_value")).as("v"))
        .orderBy("_measurement", "event_id")),

    // map(): Flux's user-extension point — record-with arithmetic.
    "flux_map" -> ((s, dir) =>
      FluxEval.run(
        """from(bucket: "events")
          ||> map(fn: (r) => ({ r with _value: (r._value - 50.0) * 2.0 }))
          ||> filter(fn: (r) => r._value > 0.0)
          ||> sum()""".stripMargin,
        source(s, dir))
        .select(col("_measurement"), r4(col("_value")).as("sum_v"))
        .orderBy("_measurement")),

    // conditional expression in map(): Flux's `if/then/else` piecewise
    // rewrite, the other record-extension idiom next to arithmetic.
    "flux_map_cond" -> ((s, dir) =>
      FluxEval.run(
        """from(bucket: "events")
          ||> map(fn: (r) => ({ r with _value: if r._value > 50.0 then r._value * 2.0 else r._value / 2.0 }))
          ||> sum()""".stripMargin,
        source(s, dir))
        .select(col("_measurement"), r4(col("_value")).as("sum_v"))
        .orderBy("_measurement")),

    // stdlib math calls inside a map() lambda — the everyday Grafana
    // unit-conversion shape (r13 verdict #1). Each per-row value is
    // floor-quantized to an integer (sqrt is IEEE-correctly-rounded and
    // ×100/floor/round agree bit-for-bit cross-engine), so the sum is
    // integer-exact — no float-summation-order risk. pow is only
    // ≤1-ulp-accurate (JVM) vs correctly-rounded (DuckDB libm), so its
    // floor gets a 1e-6 guard band — 7 orders above the ulp gap at
    // these magnitudes — making the quantization engine-independent
    // even when pow(x, 1.5) lands exactly on an integer (r14 ADVICE).
    "flux_map_math" -> ((s, dir) =>
      FluxEval.run(
        """from(bucket: "events")
          ||> map(fn: (r) => ({ r with _value: math.floor(x: math.sqrt(x: r._value) * 100.0) + math.floor(x: math.pow(x: math.abs(x: r._value), y: 1.5) + 0.000001) + math.round(x: r._value) }))
          ||> sum()""".stripMargin,
        source(s, dir))
        .select(col("_measurement"), col("_value").cast("long").as("sum_v"))
        .orderBy("_measurement")),

    // stdlib strings calls in filter AND map — predicate pushdown plus
    // per-row string rewrite, all codegen'd Spark built-ins
    "flux_map_strings" -> ((s, dir) =>
      FluxEval.run(
        """from(bucket: "events")
          ||> filter(fn: (r) => strings.hasPrefix(v: r._measurement, prefix: "c") or strings.containsStr(v: r._measurement, substr: "w"))
          ||> map(fn: (r) => ({ r with tag: strings.toUpper(v: r._measurement), pre: strings.substring(v: r._measurement, start: 0, end: 2), rep: strings.replaceAll(v: r._measurement, t: "i", u: "y"), len: strings.strlen(v: r._measurement) }))""".stripMargin,
        source(s, dir))
        .groupBy(col("tag"), col("pre"), col("rep"), col("len"))
        .agg(count(lit(1)).as("n"))
        .orderBy("tag")),

    // type conversions + date package in map(): int(v: float) truncates,
    // int(v: time) is ns-since-epoch, time(v: int) round-trips it,
    // string(v: bool) prints true/false, date.hour/weekDay extract
    "flux_map_conv" -> ((s, dir) =>
      FluxEval.run(
        """from(bucket: "events")
          ||> map(fn: (r) => ({ r with vi: int(v: r._value), hh: date.hour(t: r._time), wd: date.weekDay(t: r._time), tns: int(v: r._time), t2: time(v: int(v: r._time)), lv: string(v: r._value > 50.0) }))""".stripMargin,
        source(s, dir))
        .groupBy(col("_measurement"), col("hh"), col("wd"))
        .agg(sum(col("vi")).as("sum_vi"), max(col("tns")).as("max_tns"),
          max(col("t2")).as("max_t2"), count(when(col("lv") === "true", 1)).as("n_hi"))
        .orderBy("_measurement", "hh", "wd")),

    // contains(value:, set:) — Grafana's multi-select template filter
    // (`set: ${var:json}`); must push down as an IN filter to the scan
    "flux_contains" -> ((s, dir) =>
      FluxEval.run(
        """from(bucket: "events")
          ||> filter(fn: (r) => contains(value: r._measurement, set: ["click", "purchase", "signup"]) and not contains(value: r.user_id, set: [1.0, 2.0, 3.0]))
          ||> count()""".stripMargin,
        source(s, dir))
        .select(col("_measurement"), col("_value").as("n"))
        .orderBy("_measurement")),

    // named user functions: the stdlib's user-extension idiom — define
    // once at program level, apply via named args inside a map body
    // (calls inline at parse time, so the evaluated plan is identical
    // to writing the expression by hand: zero runtime dispatch cost).
    "flux_udf" -> ((s, dir) =>
      FluxEval.run(
        """adj = (x) => (x - 50.0) * 2.0
          |pick = (v) => if v > 0.0 then v else 0.0 - v
          |from(bucket: "events")
          ||> map(fn: (r) => ({ r with _value: pick(v: adj(x: r._value)) }))
          ||> sum()""".stripMargin,
        source(s, dir))
        .select(col("_measurement"), r4(col("_value")).as("sum_v"))
        .orderBy("_measurement")),

    // compound duration literal (1h30m) driving a window — 90 min
    // divides the day evenly, so epoch alignment matches DuckDB's
    // default time_bucket origin without an explicit origin argument.
    "flux_compound_every" -> ((s, dir) =>
      FluxEval.run(
        """from(bucket: "events")
          ||> range(start: 2024-01-08T00:00:00Z, stop: 2024-01-15T00:00:00Z)
          ||> filter(fn: (r) => r._measurement == "click" or r._measurement == "view")
          ||> aggregateWindow(every: 1h30m, fn: mean)""".stripMargin,
        source(s, dir))
        .select(col("_measurement"), col("_time").as("wend"), r4(col("_value")).as("mean_v"))
        .orderBy("_measurement", "wend")),

    // aggregateWindow(fn: last) — the most common dashboard downsample
    // (r13 verdict #2: the text-surface selector asymmetry). (event_type,
    // ts) is unique in the corpus, so max_by/arg_max are deterministic.
    "flux_agg_last" -> ((s, dir) =>
      FluxEval.run(
        """from(bucket: "events")
          ||> range(start: 2024-01-08T00:00:00Z, stop: 2024-01-15T00:00:00Z)
          ||> aggregateWindow(every: 6h, fn: last)""".stripMargin,
        source(s, dir))
        .select(col("_measurement"), col("_time").as("wend"), r4(col("_value")).as("last_v"))
        .orderBy("_measurement", "wend")),

    // offset-shifted window grid (r15): `offset: 5h` on 4h windows is
    // congruent to 1h — the query deliberately exercises the
    // mod-every normalization (Spark's window() rejects |start| >=
    // slide, so an unnormalized 5h offset THREW; metamorphic P2
    // found it). Oracle shifts DuckDB's bucket origin by the same 1h.
    "flux_window_offset" -> ((s, dir) =>
      FluxEval.run(
        """from(bucket: "events")
          ||> range(start: 2024-01-08T00:00:00Z, stop: 2024-01-15T00:00:00Z)
          ||> aggregateWindow(every: 4h, offset: 5h, fn: sum)""".stripMargin,
        source(s, dir))
        .select(col("_measurement"), col("_time").as("wend"), r4(col("_value")).as("sum_v"))
        .orderBy("_measurement", "wend")),

    // aggregateWindow(fn: count, createEmpty: true) — COUNT is the one
    // Flux aggregate defined on empty tables: spine windows with no
    // rows emit 0, not null (every other fn leaves the null)
    "flux_count_empty" -> ((s, dir) =>
      FluxEval.run(
        """from(bucket: "events")
          ||> filter(fn: (r) => r._measurement == "purchase" and r._value > 97.0)
          ||> aggregateWindow(every: 1h, fn: count, createEmpty: true)""".stripMargin,
        source(s, dir))
        .select(col("_measurement"), col("_time").as("wend"), col("_value").as("n"))
        .orderBy("wend")),

    // aggregateWindow(fn: quantile, q:) — per-window exact interpolated
    // percentile through text (same definition as DuckDB quantile_cont)
    "flux_agg_quantile" -> ((s, dir) =>
      FluxEval.run(
        """from(bucket: "events")
          ||> range(start: 2024-01-08T00:00:00Z, stop: 2024-01-15T00:00:00Z)
          ||> aggregateWindow(every: 1d, fn: quantile, q: 0.9)""".stripMargin,
        source(s, dir))
        .select(col("_measurement"), col("_time").as("wend"), r4(col("_value")).as("q90"))
        .orderBy("_measurement", "wend")),

    // pivot(): long→wide in text form (pre-aggregated to one row per
    // cell with max, so the pivot is deterministic).
    "flux_pivot" -> ((s, dir) =>
      FluxEval.run(
        """from(bucket: "events")
          ||> group(columns: ["user_id", "_measurement"])
          ||> max()
          ||> pivot(rowKey: ["user_id"], columnKey: ["_measurement"], valueColumn: "_value")""".stripMargin,
        source(s, dir))
        .select(col("user_id"), r4(col("click")).as("click"), r4(col("error")).as("error"),
          r4(col("purchase")).as("purchase"), r4(col("signup")).as("signup"),
          r4(col("view")).as("view"))
        .orderBy("user_id")),

    // reduce(): the second user-extension point — multi-field accumulator
    // fold. All accumulator values stay on the 1e-4 decimal grid (raw
    // sums and a linear transform), so round-4 never sits on a half
    // boundary where engine rounding could diverge.
    "flux_reduce" -> ((s, dir) =>
      FluxEval.run(
        """from(bucket: "events")
          ||> reduce(fn: (r, accumulator) => ({ sum: accumulator.sum + r._value,
          |    n: accumulator.n + 1.0,
          |    adj: accumulator.adj + (r._value - 50.0) * 2.0 }),
          |  identity: {sum: 0.0, n: 0.0, adj: 0.0})""".stripMargin,
        source(s, dir))
        .select(col("_measurement"), r4(col("sum")).as("sum_v"), col("n"),
          r4(col("adj")).as("adj"))
        .orderBy("_measurement")),

    // histogram |> histogramQuantile chained in text form.
    "flux_histogram" -> ((s, dir) =>
      FluxEval.run(
        """from(bucket: "events")
          ||> histogram(bins: [20.0, 40.0, 60.0, 80.0, 100.0])
          ||> histogramQuantile(quantile: 0.5)""".stripMargin,
        source(s, dir))
        .select(col("_measurement"), r4(col("_value")).as("q50"))
        .orderBy("_measurement")),

    // stdlib bin generator: linearBins reduces at parse time to the
    // SAME literal edges as flux_histogram's explicit list, so the
    // generator path reuses that gate's oracle verbatim.
    "flux_linear_bins" -> ((s, dir) =>
      FluxEval.run(
        """from(bucket: "events")
          ||> histogram(bins: linearBins(start: 20.0, width: 20.0, count: 5, infinity: false))
          ||> histogramQuantile(quantile: 0.5)""".stripMargin,
        source(s, dir))
        .select(col("_measurement"), r4(col("_value")).as("q50"))
        .orderBy("_measurement")),

    // join(): two table variables joined on a key — the multi-statement
    // program form (assignments + standalone join head).
    "flux_join" -> ((s, dir) =>
      FluxEval.run(
        """a = from(bucket: "events")
          |  |> filter(fn: (r) => r._measurement == "click")
          |  |> group(columns: ["user_id"])
          |  |> max()
          |  |> rename(columns: {_value: "click_max"})
          |b = from(bucket: "events")
          |  |> filter(fn: (r) => r._measurement == "purchase")
          |  |> group(columns: ["user_id"])
          |  |> max()
          |  |> rename(columns: {_value: "purchase_max"})
          |join(tables: {c: a, p: b}, on: ["user_id"])""".stripMargin,
        source(s, dir))
        .select(col("user_id"), r4(col("click_max")).as("click_max"),
          r4(col("purchase_max")).as("purchase_max"))
        .orderBy("user_id")),

    // join-package method variant through text (`join.left`): the right
    // side is deliberately sparse (purchase max over a value cut) so
    // left rows WITHOUT a match survive with a null purchase_max —
    // the plan evidence that the method reached the executor.
    "flux_join_left" -> ((s, dir) =>
      FluxEval.run(
        """a = from(bucket: "events")
          |  |> filter(fn: (r) => r._measurement == "click")
          |  |> group(columns: ["user_id"])
          |  |> max()
          |  |> rename(columns: {_value: "click_max"})
          |b = from(bucket: "events")
          |  |> filter(fn: (r) => r._measurement == "purchase" and r._value > 95.0)
          |  |> group(columns: ["user_id"])
          |  |> max()
          |  |> rename(columns: {_value: "purchase_max"})
          |join.left(left: a, right: b, on: (l, r) => l.user_id == r.user_id)""".stripMargin,
        source(s, dir))
        .select(col("user_id"), r4(col("click_max")).as("click_max"),
          r4(col("purchase_max")).as("purchase_max"))
        .orderBy("user_id")),

    // monitor.check through text: every row classified into v2's
    // `_level` status schema (crit > warn > info > ok, first match
    // wins), `_check_name`/`_measurement` pinned to the statuses shape
    "monitor_check" -> ((s, dir) =>
      FluxEval.run(
        """from(bucket: "events")
          ||> monitor.check(crit: (r) => r._value > 90.0, warn: (r) => r._value > 75.0, info: (r) => r._value > 50.0, data: {_check_name: "value-check"})""".stripMargin,
        source(s, dir))
        .groupBy(col("_source_measurement").as("event_type"), col("_level"),
          col("_check_name"), col("_measurement"))
        .agg(count(lit(1)).as("n"), r4(avg(col("_value"))).as("mean_v"))
        .orderBy("event_type", "_level")),

    // monitor.deadman: per-series liveness against a cutoff — one
    // keyed max aggregate, dead ⇔ nothing at or after t
    "monitor_deadman" -> ((s, dir) =>
      FluxEval.run(
        """from(bucket: "events")
          ||> group(columns: ["_measurement", "user_id"])
          ||> monitor.deadman(t: 2024-01-12T00:00:00Z)""".stripMargin,
        source(s, dir))
        .groupBy(col("_measurement").as("event_type"))
        .agg(count(lit(1)).as("n_series"),
          sum(when(col("dead"), 1L).otherwise(0L)).as("n_dead"))
        .orderBy("event_type")),

    // monitor.stateChanges over check output: per (measurement, user)
    // series, the rows whose level ENTERED crit from a different level
    "monitor_state_changes" -> ((s, dir) =>
      FluxEval.run(
        """from(bucket: "events")
          ||> monitor.check(crit: (r) => r._value > 90.0, warn: (r) => r._value > 75.0, data: {_check_name: "value-check"})
          ||> group(columns: ["_source_measurement", "user_id"])
          ||> monitor.stateChanges(toLevel: "crit")""".stripMargin,
        source(s, dir))
        .groupBy(col("_source_measurement").as("event_type"))
        .agg(count(lit(1)).as("n_to_crit"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("event_type")),

    // exists: Flux's member-existence test over pivot output — rows
    // whose `error` cell stayed empty (users with no error event above
    // the value cut) are dropped, the Grafana drop-empty-cells idiom.
    "flux_exists" -> ((s, dir) =>
      FluxEval.run(
        """from(bucket: "events")
          ||> filter(fn: (r) => r._value > 95.0)
          ||> group(columns: ["user_id", "_measurement"])
          ||> max()
          ||> pivot(rowKey: ["user_id"], columnKey: ["_measurement"], valueColumn: "_value")
          ||> filter(fn: (r) => exists r.error)""".stripMargin,
        source(s, dir))
        .select(col("user_id"), r4(col("click")).as("click"), r4(col("error")).as("error"),
          r4(col("purchase")).as("purchase"), r4(col("signup")).as("signup"),
          r4(col("view")).as("view"))
        .orderBy("user_id")),

    // csv.from: the engine's own annotated-CSV output fed back in as a
    // Flux source — query → AnnotatedCsv → csv.from must hash-equal the
    // direct query (the stdlib round-trip a 2.0.9 user expects; csv
    // decode is exact for doubles/timestamps, so no re-rounding drift).
    "flux_csv_from" -> ((s, dir) => {
      val direct = FluxEval.run(
        """from(bucket: "events")
          ||> range(start: 2024-01-08T00:00:00Z, stop: 2024-01-15T00:00:00Z)
          ||> filter(fn: (r) => r._measurement == "click" or r._measurement == "view")
          ||> aggregateWindow(every: 6h, fn: mean)""".stripMargin,
        source(s, dir))
      val csv = graft.service.AnnotatedCsv.format(direct.toDF())
      val embedded = "\"" + csv.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      FluxEval.run(
        s"""import "csv"
           |csv.from(csv: $embedded)
           ||> sort(columns: ["_time"])""".stripMargin,
        source(s, dir))
        .select(col("_measurement"), col("_time").as("wend"), r4(col("_value")).as("mean_v"))
        .orderBy("_measurement", "wend")
    }),

    // multi-table csv.from: a real 2.0.9 multi-yield response is two
    // annotation sections with their OWN #datatype blocks (here mean →
    // double, count → long, so the schemas genuinely differ); decode
    // must expose the result-set map and let the script select each
    // result by name — the r16 close of the last decode-fidelity corner
    "flux_csv_multi" -> ((s, dir) => {
      def run(fn: String) = FluxEval.run(
        s"""from(bucket: "events")
           ||> range(start: 2024-01-08T00:00:00Z, stop: 2024-01-15T00:00:00Z)
           ||> filter(fn: (r) => r._measurement == "click" or r._measurement == "view")
           ||> aggregateWindow(every: 6h, fn: $fn)""".stripMargin,
        source(s, dir))
      val csv = graft.service.AnnotatedCsv.format(run("mean").toDF(), resultName = "means") +
        graft.service.AnnotatedCsv.format(run("count").toDF(), resultName = "counts")
      val embedded = "\"" + csv.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      def pick(rn: String) = FluxEval.run(
        s"""import "csv"
           |csv.from(csv: $embedded, result: "$rn")""".stripMargin,
        source(s, dir)).toDF()
      val m = pick("means").select(col("_measurement"), col("_time").as("wend"),
        r4(col("_value")).as("mean_v"))
      val c = pick("counts").select(col("_measurement").as("cm"), col("_time").as("cw"),
        col("_value").as("cnt_v"))
      m.join(c, m("_measurement") === c("cm") && m("wend") === c("cw"))
        .select(col("_measurement"), col("wend"), col("mean_v"), col("cnt_v"))
        .orderBy("_measurement", "wend")
    }),

    // multi-yield EMISSION parity as a gate (r17): a two-yield script
    // evaluates to the result-set map, each result is encoded as its
    // own annotated-CSV section under its yield name (exactly what the
    // HTTP query surface streams), the payload decodes back through
    // parseResults, and the flattened (result, value) rows must equal
    // the two aggregates computed directly by the oracle — the full
    // script → result set → wire → decode chain in one hash
    "flux_multi_yield" -> ((s, dir) => {
      val script =
        """a = from(bucket: "events")
          |  |> range(start: 2024-01-08T00:00:00Z, stop: 2024-01-15T00:00:00Z)
          |  |> filter(fn: (r) => r._measurement == "click")
          |a |> count() |> yield(name: "n")
          |a |> sum() |> yield(name: "total")""".stripMargin
      val results = FluxEval.runAll(script, source(s, dir))
      val sb = new java.lang.StringBuilder
      results.foreach { case (n, df) =>
        graft.service.AnnotatedCsv.write(df, sb, resultName = n)
      }
      graft.service.AnnotatedCsv.parseResults(sb.toString, s).map { case (n, df) =>
        df.select(lit(n).as("result"),
          r4(col("_value").cast("double")).as("value"))
      }.reduce(_ unionByName _).orderBy("result")
    })
  )

  private val histogramOracle: String =
    """WITH hist AS (
        |  SELECT event_type, le, count(*) AS hn
        |  FROM events CROSS JOIN (VALUES (20.0), (40.0), (60.0), (80.0), (100.0)) b(le)
        |  WHERE value <= le GROUP BY 1, 2
        |), staged AS (
        |  SELECT event_type, le, hn,
        |    max(hn) OVER (PARTITION BY event_type) AS tot,
        |    coalesce(lag(hn) OVER w, 0) AS pc,
        |    coalesce(lag(le) OVER w, 0) AS ple
        |  FROM hist WINDOW w AS (PARTITION BY event_type ORDER BY le)
        |)
        |SELECT event_type AS _measurement,
        |  round(ple + (le - ple) * (tot * 0.5 - pc) / (hn - pc), 4) AS q50
        |FROM staged WHERE hn >= tot * 0.5 AND pc < tot * 0.5 ORDER BY 1""".stripMargin

  val oracle: Map[String, String] = Map(
    "flux_bursts" -> WindowQueries.oracle("burst_detect"),
    "flux_seasonal" -> WindowQueries.oracle("seasonal_baseline"),
    "flux_acf" -> MiningQueries.oracle("acf_lags"),
    "flux_forecast" -> MiningQueries.oracle("forecast_linear"),
    // raw daily double sums (not the batch gate's cents): pairwise
    // slope + exact median replayed on the same values
    "flux_theil_sen" -> (
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    sum(value) AS sv
        |  FROM events GROUP BY 1, 2),
        |x AS (SELECT event_type,
        |    CAST(day - DATE '1970-01-01' AS BIGINT) AS x, sv FROM d),
        |p AS (SELECT a.event_type, (b.sv - a.sv) / (b.x - a.x) AS slope
        |  FROM x a JOIN x b ON a.event_type = b.event_type AND a.x < b.x)
        |SELECT event_type, count(*) AS n_pairs,
        |  round(quantile_cont(slope, 0.5), 4) AS med_slope
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin),
    "flux_changepoints" -> MiningQueries.oracle("changepoints"),
    "flux_cusum" -> WindowQueries.oracle("cusum_drift"),
    "flux_winsorize" -> WindowQueries.oracle("winsorize"),
    "flux_lttb" -> (s"SELECT event_type, tus, value FROM (\n" +
      s"${WindowQueries.oracle("lttb_downsample")}\n) sub ORDER BY event_type, tus"),
    "flux_decompose" -> WindowQueries.oracle("decompose_stl"),
    "flux_anomalies" -> WindowQueries.oracle("anomaly_mad"),
    "flux_exists" ->
      """SELECT user_id,
        |  round(max(CASE WHEN event_type = 'click' THEN value END), 4) AS click,
        |  round(max(CASE WHEN event_type = 'error' THEN value END), 4) AS error,
        |  round(max(CASE WHEN event_type = 'purchase' THEN value END), 4) AS purchase,
        |  round(max(CASE WHEN event_type = 'signup' THEN value END), 4) AS signup,
        |  round(max(CASE WHEN event_type = 'view' THEN value END), 4) AS view
        |FROM events WHERE value > 95
        |GROUP BY 1
        |HAVING max(CASE WHEN event_type = 'error' THEN value END) IS NOT NULL
        |ORDER BY 1""".stripMargin,
    // csv.from round-trips the direct query exactly, so its oracle IS
    // the direct query's SQL
    "flux_csv_from" ->
      """SELECT event_type AS _measurement,
        |  time_bucket(INTERVAL '6 hours', ts) + INTERVAL '6 hours' AS wend,
        |  round(avg(value), 4) AS mean_v
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-15 00:00:00'
        |  AND event_type IN ('click', 'view')
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // both yields round-trip the direct queries exactly, so the oracle
    // is the joined pair of direct aggregates
    "flux_csv_multi" ->
      """SELECT event_type AS _measurement,
        |  time_bucket(INTERVAL '6 hours', ts) + INTERVAL '6 hours' AS wend,
        |  round(avg(value), 4) AS mean_v,
        |  count(*) AS cnt_v
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-15 00:00:00'
        |  AND event_type IN ('click', 'view')
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the emission gate's oracle replays both yields' aggregates
    "flux_multi_yield" ->
      """SELECT * FROM (
        |  SELECT 'n' AS result, round(CAST(count(*) AS DOUBLE), 4) AS value
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-15 00:00:00'
        |    AND event_type = 'click'
        |  UNION ALL
        |  SELECT 'total' AS result, round(sum(value), 4) AS value
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-15 00:00:00'
        |    AND event_type = 'click'
        |) ORDER BY result""".stripMargin,
    "flux_downsample" ->
      """SELECT event_type AS _measurement,
        |  time_bucket(INTERVAL '6 hours', ts) + INTERVAL '6 hours' AS wend,
        |  round(avg(value), 4) AS mean_v
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-15 00:00:00'
        |  AND event_type IN ('click', 'view')
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "flux_month_window" ->
      """WITH b AS (
        |  SELECT event_type, ts, value FROM events
        |  UNION ALL
        |  SELECT event_type, ts + INTERVAL 35 DAY, value FROM events)
        |SELECT event_type AS _measurement,
        |  date_trunc('month', ts) + INTERVAL 1 MONTH AS wend,
        |  round(sum(value), 4) AS sum_v
        |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "flux_tz_offset" ->
      """SELECT event_type AS _measurement,
        |  time_bucket(INTERVAL '1 day', ts - INTERVAL 5 HOUR, TIMESTAMP '2024-01-01 06:00:00')
        |    + INTERVAL '1 day' + INTERVAL 5 HOUR AS wend,
        |  round(sum(value), 4) AS sum_v
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-11 00:00:00'
        |  AND event_type IN ('click', 'view')
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "flux_schema_measurements" ->
      """SELECT DISTINCT event_type AS _value FROM events ORDER BY 1""".stripMargin,
    "flux_schema_tag_values" ->
      """SELECT DISTINCT CAST(user_id AS VARCHAR) AS _value FROM events ORDER BY 1""".stripMargin,
    "flux_hour" ->
      """SELECT event_type AS _measurement,
        |  time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day' AS wend,
        |  count(value) AS n
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-15 00:00:00'
        |  AND (hour(ts) >= 22 OR hour(ts) <= 2)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "flux_topk" ->
      """SELECT event_type AS _measurement, event_id, round(value, 4) AS v FROM (
        |  SELECT event_type, event_id, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value DESC, epoch_us(ts)) AS rn
        |  FROM events WHERE value > 90 AND event_type <> 'error')
        |WHERE rn <= 5 ORDER BY 1, 2""".stripMargin,
    "flux_map" ->
      """SELECT event_type AS _measurement, round(sum(v), 4) AS sum_v FROM (
        |  SELECT event_type, (value - 50.0) * 2.0 AS v FROM events)
        |WHERE v > 0 GROUP BY 1 ORDER BY 1""".stripMargin,
    "flux_map_cond" ->
      """SELECT event_type AS _measurement,
        |  round(sum(CASE WHEN value > 50.0 THEN value * 2.0 ELSE value / 2.0 END), 4) AS sum_v
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "flux_udf" ->
      """SELECT event_type AS _measurement,
        |  round(sum(CASE WHEN (value - 50.0) * 2.0 > 0.0
        |    THEN (value - 50.0) * 2.0
        |    ELSE 0.0 - (value - 50.0) * 2.0 END), 4) AS sum_v
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "flux_compound_every" ->
      """SELECT event_type AS _measurement,
        |  time_bucket(INTERVAL '90 minutes', ts) + INTERVAL '90 minutes' AS wend,
        |  round(avg(value), 4) AS mean_v
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-15 00:00:00'
        |  AND event_type IN ('click', 'view')
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "flux_pivot" ->
      """SELECT user_id,
        |  round(max(CASE WHEN event_type = 'click' THEN value END), 4) AS click,
        |  round(max(CASE WHEN event_type = 'error' THEN value END), 4) AS error,
        |  round(max(CASE WHEN event_type = 'purchase' THEN value END), 4) AS purchase,
        |  round(max(CASE WHEN event_type = 'signup' THEN value END), 4) AS signup,
        |  round(max(CASE WHEN event_type = 'view' THEN value END), 4) AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "flux_reduce" ->
      """SELECT event_type AS _measurement, round(sum(value), 4) AS sum_v,
        |  CAST(count(*) AS DOUBLE) AS n,
        |  round(sum((value - 50.0) * 2.0), 4) AS adj
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "flux_contains" ->
      """SELECT event_type AS _measurement, count(value) AS n
        |FROM events
        |WHERE event_type IN ('click', 'purchase', 'signup')
        |  AND user_id NOT IN (1, 2, 3)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "flux_map_math" ->
      """SELECT event_type AS _measurement,
        |  CAST(sum(floor(sqrt(value) * 100.0) + floor(pow(abs(value), 1.5) + 0.000001)
        |    + round(value, 0)) AS BIGINT) AS sum_v
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "flux_map_strings" ->
      """SELECT upper(event_type) AS tag, substr(event_type, 1, 2) AS pre,
        |  replace(event_type, 'i', 'y') AS rep, length(event_type) AS len,
        |  count(*) AS n
        |FROM events
        |WHERE event_type LIKE 'c%' OR contains(event_type, 'w')
        |GROUP BY 1, 2, 3, 4 ORDER BY 1""".stripMargin,
    "flux_map_conv" ->
      """SELECT event_type AS _measurement, hour(ts) AS hh,
        |  dayofweek(ts) AS wd,
        |  CAST(sum(CAST(trunc(value) AS BIGINT)) AS BIGINT) AS sum_vi,
        |  max(epoch_ns(ts)) AS max_tns, max(ts) AS max_t2,
        |  count(CASE WHEN value > 50.0 THEN 1 END) AS n_hi
        |FROM events GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "flux_agg_last" ->
      """SELECT event_type AS _measurement,
        |  time_bucket(INTERVAL '6 hours', ts) + INTERVAL '6 hours' AS wend,
        |  round(arg_max(value, ts), 4) AS last_v
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-15 00:00:00'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "flux_window_offset" ->
      """SELECT event_type AS _measurement,
        |  time_bucket(INTERVAL '4 hours', ts, TIMESTAMP '1970-01-01 01:00:00')
        |    + INTERVAL '4 hours' AS wend,
        |  round(sum(value), 4) AS sum_v
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-15 00:00:00'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "flux_count_empty" ->
      """WITH f AS (
        |  SELECT * FROM events WHERE event_type = 'purchase' AND value > 97
        |), agg AS (
        |  SELECT time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS wend,
        |    count(value) AS n
        |  FROM f GROUP BY 1
        |), spine AS (
        |  SELECT unnest(generate_series(
        |    time_bucket(INTERVAL '1 hour', min(ts)) + INTERVAL '1 hour',
        |    time_bucket(INTERVAL '1 hour', max(ts)) + INTERVAL '1 hour',
        |    INTERVAL '1 hour')) AS wend
        |  FROM f
        |)
        |SELECT 'purchase' AS _measurement, s.wend, coalesce(a.n, 0) AS n
        |FROM spine s LEFT JOIN agg a USING (wend) ORDER BY s.wend""".stripMargin,
    "flux_agg_quantile" ->
      """SELECT event_type AS _measurement,
        |  time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day' AS wend,
        |  round(quantile_cont(value, 0.9), 4) AS q90
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-15 00:00:00'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "flux_histogram" -> histogramOracle,
    "flux_join" ->
      """WITH c AS (
        |  SELECT user_id, max(value) AS click_max FROM events
        |  WHERE event_type = 'click' GROUP BY 1
        |), p AS (
        |  SELECT user_id, max(value) AS purchase_max FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1
        |)
        |SELECT user_id, round(click_max, 4) AS click_max,
        |  round(purchase_max, 4) AS purchase_max
        |FROM c JOIN p USING (user_id) ORDER BY 1""".stripMargin,
    "flux_join_left" ->
      """WITH c AS (
        |  SELECT user_id, max(value) AS click_max FROM events
        |  WHERE event_type = 'click' GROUP BY 1
        |), p AS (
        |  SELECT user_id, max(value) AS purchase_max FROM events
        |  WHERE event_type = 'purchase' AND value > 95 GROUP BY 1
        |)
        |SELECT user_id, round(click_max, 4) AS click_max,
        |  round(purchase_max, 4) AS purchase_max
        |FROM c LEFT JOIN p USING (user_id) ORDER BY 1""".stripMargin,
    "monitor_check" ->
      """SELECT event_type,
        |  CASE WHEN value > 90 THEN 'crit' WHEN value > 75 THEN 'warn'
        |       WHEN value > 50 THEN 'info' ELSE 'ok' END AS _level,
        |  'value-check' AS _check_name, 'statuses' AS _measurement,
        |  count(*) AS n, round(avg(value), 4) AS mean_v
        |FROM events GROUP BY 1, 2, 3, 4 ORDER BY 1, 2""".stripMargin,
    "monitor_deadman" ->
      """WITH l AS (
        |  SELECT event_type, user_id, max(ts) AS last_ts
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT event_type, count(*) AS n_series,
        |  CAST(sum(CASE WHEN last_ts < TIMESTAMP '2024-01-12 00:00:00'
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_dead
        |FROM l GROUP BY 1 ORDER BY 1""".stripMargin,
    "monitor_state_changes" ->
      """WITH lv AS (
        |  SELECT event_type, user_id, ts,
        |    CASE WHEN value > 90 THEN 'crit' WHEN value > 75 THEN 'warn'
        |         ELSE 'ok' END AS lvl
        |  FROM events
        |), ch AS (
        |  SELECT event_type, user_id, lvl,
        |    lag(lvl) OVER (PARTITION BY event_type, user_id ORDER BY ts) AS prev
        |  FROM lv
        |)
        |SELECT event_type, count(*) AS n_to_crit,
        |  count(DISTINCT user_id) AS n_users
        |FROM ch
        |WHERE prev IS NOT NULL AND lvl = 'crit' AND prev <> 'crit'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the bin GENERATOR reduces at parse time to the identical literal
    // edges, so the generator path answers the same oracle
    "flux_linear_bins" -> histogramOracle
  )
}
