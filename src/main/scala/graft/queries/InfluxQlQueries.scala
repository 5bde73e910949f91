package graft.queries

import graft.influxql.InfluxQLEval
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gate entries driven through the InfluxQL v1 front-end — the query
  * enters as InfluxQL text (the language Grafana speaks to the pinned
  * engine's /query compat API), is parsed and planned onto DataFrames,
  * and must hash-match the DuckDB oracle.
  */
object InfluxQlQueries {
  import QueryUtil._

  private def source(s: SparkSession, dir: String) = {
    import s.implicits._
    InfluxQLEval.Source(
      resolve = _ => events(s, dir).withColumnRenamed("ts", "time"),
      // the events view's series tags (GROUP BY * expands to these)
      tagKeys = _ => Seq("event_type", "user_id").toDF("tagKey"))
  }

  /** Measurement-per-event_type view: the v1 "database" presents each
    * event type as a measurement (static catalog), so FROM lists and
    * FROM /regex/ resolve to per-type slices of the events table.
    */
  private def measSource(s: SparkSession, dir: String) = InfluxQLEval.Source(
    resolve = m => events(s, dir).withColumnRenamed("ts", "time")
      .filter(col("event_type") === m),
    measurementNames = () => Seq("click", "error", "purchase", "signup", "view"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // GROUP BY time(1h), tag — the canonical Grafana panel query.
    // InfluxQL labels buckets with their epoch-aligned START, and with no
    // FILL clause defaults to fill(null): empty buckets inside the
    // explicit range ARE emitted, value null.
    "iql_gb_time" -> ((s, dir) =>
      InfluxQLEval.run(
        "SELECT sum(value) AS sum_v FROM events " +
          "WHERE time >= '2024-01-08T00:00:00Z' AND time < '2024-01-11T00:00:00Z' " +
          "GROUP BY time(1h), event_type",
        source(s, dir))
        .select(col("time").as("wstart"), col("event_type"), r4(col("sum_v")).as("sum_v"))
        .orderBy("event_type", "wstart")),

    // Ungrouped-by-time aggregates per tag: count/max/median/percentile.
    "iql_agg" -> ((s, dir) =>
      InfluxQLEval.run(
        "SELECT count(value) AS n, max(value) AS max_v, median(value) AS med, " +
          "percentile(value, 90) AS p90 FROM events GROUP BY event_type",
        source(s, dir))
        .select(col("event_type"), col("n"), r4(col("max_v")).as("max_v"),
          r4(col("med")).as("med"), r4(col("p90")).as("p90"))
        .orderBy("event_type")),

    // derivative(sum(...), 1h) over hourly buckets per tag — the
    // canonical Grafana rate panel.
    "iql_derivative" -> ((s, dir) =>
      InfluxQLEval.run(
        "SELECT derivative(sum(value), 1h) AS rate FROM events " +
          "WHERE time >= '2024-01-08T00:00:00Z' AND time < '2024-01-11T00:00:00Z' " +
          "GROUP BY time(1h), event_type",
        source(s, dir))
        .select(col("time").as("wstart"), col("event_type"), r4(col("rate")).as("rate"))
        .orderBy("event_type", "wstart")),

    // Default-unit derivative (no explicit duration): the unit falls back
    // to the GROUP BY time() interval, so hourly buckets read as
    // per-hour rate — and the WHERE bounds arrive as bare epoch-ns
    // integer literals (Long-exact, beyond 2^53).
    "iql_derivative_default" -> ((s, dir) =>
      InfluxQLEval.run(
        "SELECT derivative(sum(value)) AS rate FROM events " +
          "WHERE time >= 1704672000000000000 AND time < 1704931200000000000 " +
          "GROUP BY time(1h), event_type",
        source(s, dir))
        .select(col("time").as("wstart"), col("event_type"), r4(col("rate")).as("rate"))
        .orderBy("event_type", "wstart")),

    // integral(value, 1h): trapezoid area under the raw series per
    // 6h bucket and tag — v1's INTEGRAL aggregate (unit-scaled).
    "iql_integral" -> ((s, dir) =>
      InfluxQLEval.run(
        "SELECT integral(value, 1h) AS itg FROM events " +
          "WHERE time >= '2024-01-08T00:00:00Z' AND time < '2024-01-11T00:00:00Z' " +
          "GROUP BY time(6h), event_type FILL(none)",
        source(s, dir))
        .select(col("time").as("wstart"), col("event_type"), r4(col("itg")).as("itg"))
        .orderBy("event_type", "wstart")),

    // non_negative_difference over hourly sums: v1 omits negative
    // deltas entirely (not null — the row is dropped).
    "iql_nn_difference" -> ((s, dir) =>
      InfluxQLEval.run(
        "SELECT non_negative_difference(sum(value)) AS d FROM events " +
          "WHERE time >= '2024-01-08T00:00:00Z' AND time < '2024-01-11T00:00:00Z' " +
          "GROUP BY time(1h), event_type",
        source(s, dir))
        .select(col("time").as("wstart"), col("event_type"), r4(col("d")).as("d"))
        .orderBy("event_type", "wstart")),

    // v1 technical-analysis family over hourly means: the same
    // SeriesScan kernel the Flux ema gate proves, reached through the
    // InfluxQL text surface.
    "iql_ema" -> ((s, dir) =>
      InfluxQLEval.run(
        "SELECT exponential_moving_average(mean(value), 10) AS ema FROM events " +
          "WHERE time >= '2024-01-08T00:00:00Z' AND time < '2024-01-11T00:00:00Z' " +
          "GROUP BY time(1h), event_type",
        source(s, dir))
        .select(col("time").as("wstart"), col("event_type"), r4(col("ema")).as("ema"))
        .orderBy("event_type", "wstart")),

    // Ungrouped EMA — no tags, ONE series: EMA is a linear recurrence,
    // so this runs through the distributed affine-composition two-pass
    // (SeriesScan.ungroupedEma), not a single global scan task.
    "iql_ema_nogroup" -> ((s, dir) =>
      InfluxQLEval.run(
        "SELECT exponential_moving_average(mean(value), 10) AS ema FROM events " +
          "WHERE time >= '2024-01-08T00:00:00Z' AND time < '2024-01-11T00:00:00Z' " +
          "GROUP BY time(1h)",
        source(s, dir))
        .select(col("time").as("wstart"), r4(col("ema")).as("ema"))
        .orderBy("wstart")),

    // top(field, N) under GROUP BY time(): the N extreme POINTS per
    // (bucket, tag), rows keeping their actual timestamps — one
    // row_number window, ties to the earlier point as v1 does.
    "iql_top_time" -> ((s, dir) =>
      InfluxQLEval.run(
        "SELECT top(value, 2) AS topv FROM events " +
          "WHERE time >= '2024-01-08T00:00:00Z' AND time < '2024-01-11T00:00:00Z' " +
          "GROUP BY time(6h), event_type",
        source(s, dir))
        .select(col("time").as("t"), col("event_type"), r4(col("topv")).as("topv"))
        .orderBy("event_type", "t")),

    // LIMIT/OFFSET paginate per SERIES under GROUP BY tags (v1: "the
    // first N points from each series"), not globally.
    "iql_limit_series" -> ((s, dir) =>
      InfluxQLEval.run(
        "SELECT value FROM events " +
          "WHERE time >= '2024-01-08T00:00:00Z' AND time < '2024-01-09T00:00:00Z' " +
          "GROUP BY event_type LIMIT 3 OFFSET 1",
        source(s, dir))
        .select(col("time").as("t"), col("event_type"), r4(col("value")).as("value"))
        .orderBy("event_type", "t")),

    // regex field projection: SELECT /re/ picks the matching fields
    // (raw), mean(/re/) the matching numeric ones (aggregate).
    "iql_field_regex" -> ((s, dir) =>
      InfluxQLEval.run(
        "SELECT /^(user|val)/ FROM events " +
          "WHERE time >= '2024-01-08T00:00:00Z' AND time < '2024-01-08T06:00:00Z' " +
          "AND value > 99",
        InfluxQLEval.Source(resolve = _ => events(s, dir)
          .select(col("ts").as("time"), col("event_type"), col("user_id"), col("value"))))
        .orderBy("time", "user_id", "value")),

    "iql_agg_regex" -> ((s, dir) =>
      InfluxQLEval.run(
        "SELECT mean(/^val/) FROM events " +
          "WHERE time >= '2024-01-08T00:00:00Z' AND time < '2024-01-11T00:00:00Z' " +
          "GROUP BY event_type",
        InfluxQLEval.Source(resolve = _ => events(s, dir)
          .select(col("ts").as("time"), col("event_type"), col("user_id"), col("value"))))
        .select(col("event_type"), r4(col("mean_value")).as("mean_value"))
        .orderBy("event_type")),

    // aggregate-star: mean(*)/count(*) expand per data field with
    // <fn>_<field> names — numeric fields for mean, every field for
    // count, as v1 does. The ns shadow column is dropped so every
    // expanded aggregate is oracle-replicable.
    "iql_agg_star" -> ((s, dir) =>
      InfluxQLEval.run(
        "SELECT mean(*), count(*) FROM events " +
          "WHERE time >= '2024-01-08T00:00:00Z' AND time < '2024-01-11T00:00:00Z' " +
          "GROUP BY time(6h), event_type",
        InfluxQLEval.Source(
          resolve = _ => events(s, dir).withColumnRenamed("ts", "time").drop("ts_ns"),
          tagKeys = { _ =>
            import s.implicits._
            Seq("event_type", "user_id").toDF("tagKey")
          }))
        .select(col("time").as("t"), col("event_type"),
          r4(col("mean_value")).as("mean_value"),
          col("count_user_id"), col("count_value"))
        .orderBy("event_type", "t")),

    // distinct(field) under GROUP BY time(): distinct values per
    // (bucket, tag), rows labeled with the bucket start.
    "iql_distinct_time" -> ((s, dir) =>
      InfluxQLEval.run(
        "SELECT distinct(user_id) AS u FROM events " +
          "WHERE time >= '2024-01-08T00:00:00Z' AND time < '2024-01-09T00:00:00Z' " +
          "GROUP BY time(6h), event_type",
        source(s, dir))
        .select(col("time").as("t"), col("event_type"), col("u"))
        .orderBy("event_type", "t", "u")),

    // sample(field, N) under GROUP BY time(): N sampled points per
    // (bucket, tag) via the deterministic time-hash (v1 uses an RNG —
    // divergence documented at iql_sample).
    "iql_sample_time" -> ((s, dir) =>
      InfluxQLEval.run(
        "SELECT sample(value, 2) AS sv FROM events " +
          "WHERE time >= '2024-01-08T00:00:00Z' AND time < '2024-01-11T00:00:00Z' " +
          "GROUP BY time(12h), event_type",
        source(s, dir))
        .select(col("time").as("t"), col("event_type"), r4(col("sv")).as("sv"))
        .orderBy("event_type", "t")),

    // percentile(field, N) under GROUP BY time(): v1's nearest-rank
    // point selection per (bucket, tag) — staged rank/count columns,
    // no interpolation, no collect.
    "iql_percentile" -> ((s, dir) =>
      InfluxQLEval.run(
        "SELECT percentile(value, 90) AS p90 FROM events " +
          "WHERE time >= '2024-01-08T00:00:00Z' AND time < '2024-01-11T00:00:00Z' " +
          "GROUP BY time(6h), event_type",
        source(s, dir))
        .select(col("time").as("wstart"), col("event_type"), r4(col("p90")).as("p90"))
        .orderBy("event_type", "wstart")),

    // HOLT_WINTERS_WITH_FIT(agg, N, 0): v1's NO-seasonality form —
    // Holt's linear-trend double exponential (level = v0,
    // trend = v1 − v0, fitted from row 2, forecast = level + trend·h).
    "iql_holt" -> ((s, dir) =>
      InfluxQLEval.run(
        "SELECT holt_winters_with_fit(sum(value), 6, 0) AS hw FROM events " +
          "WHERE time >= '2024-01-08T00:00:00Z' AND time < '2024-01-11T00:00:00Z' " +
          "GROUP BY time(1h), event_type",
        source(s, dir))
        .select(col("time").as("wstart"), col("event_type"), r4(col("hw")).as("hw"))
        .orderBy("event_type", "wstart")),

    // Ungrouped moving_average — the n−1 boundary-row carry scan
    // (SeriesScan.ungroupedMovingAvg), not a single global window task.
    "iql_mavg_nogroup" -> ((s, dir) =>
      InfluxQLEval.run(
        "SELECT moving_average(sum(value), 6) AS mavg FROM events " +
          "WHERE time >= '2024-01-08T00:00:00Z' AND time < '2024-01-11T00:00:00Z' " +
          "GROUP BY time(1h)",
        source(s, dir))
        .select(col("time").as("wstart"), r4(col("mavg")).as("mavg"))
        .orderBy("wstart")),

    // Ungrouped derivative — no tags, ONE series: runs through the
    // distributed range-partition + boundary-carry lag scan
    // (SeriesScan.ungroupedLag), not a single global window task.
    "iql_derivative_nogroup" -> ((s, dir) =>
      InfluxQLEval.run(
        "SELECT derivative(sum(value), 1h) AS rate FROM events " +
          "WHERE time >= '2024-01-08T00:00:00Z' AND time < '2024-01-11T00:00:00Z' " +
          "GROUP BY time(1h)",
        source(s, dir))
        .select(col("time").as("wstart"), r4(col("rate")).as("rate"))
        .orderBy("wstart")),

    // SHOW TAG VALUES — the query Grafana template variables issue
    // before any panel renders; WHERE filters the contributing points.
    "iql_show_tag_values" -> ((s, dir) =>
      InfluxQLEval.run(
        "SHOW TAG VALUES FROM events WITH KEY = \"event_type\" " +
          "WHERE time >= '2024-01-08T00:00:00Z' AND time < '2024-01-09T00:00:00Z' " +
          "AND value > 90",
        source(s, dir))),

    // SHOW TAG VALUES WITH KEY IN — the multi-key template-variable
    // form, with the v1 LIMIT/OFFSET trim of the sorted listing.
    "iql_tag_values_in" -> ((s, dir) =>
      InfluxQLEval.run(
        "SHOW TAG VALUES FROM events WITH KEY IN (\"event_type\", \"user_id\") " +
          "WHERE time >= '2024-01-08T00:00:00Z' AND time < '2024-01-09T00:00:00Z' " +
          "AND value > 50 LIMIT 25 OFFSET 2",
        source(s, dir))),

    // Subquery FROM: max-of-hourly-sum, the v1 idiom for "peak of a
    // downsampled series" (inner GROUP BY time feeds the outer agg).
    "iql_subquery" -> ((s, dir) =>
      InfluxQLEval.run(
        "SELECT max(v) AS max_v FROM (SELECT sum(value) AS v FROM events " +
          "WHERE time >= '2024-01-08T00:00:00Z' AND time < '2024-01-11T00:00:00Z' " +
          "GROUP BY time(1h), event_type) GROUP BY event_type",
        source(s, dir))
        .select(col("event_type"), r4(col("max_v")).as("max_v"))
        .orderBy("event_type")),

    // FROM /regex/: per-measurement evaluation unioned with a
    // measurement label (two measurements match).
    "iql_from_regex" -> ((s, dir) =>
      InfluxQLEval.run(
        "SELECT count(value) AS n, sum(value) AS sum_v FROM /^(click|view)$/ " +
          "WHERE time >= '2024-01-08T00:00:00Z' AND time < '2024-01-09T00:00:00Z' " +
          "GROUP BY time(6h) FILL(none)",
        measSource(s, dir))
        .select(col("measurement"), col("time").as("wstart"), col("n"),
          r4(col("sum_v")).as("sum_v"))
        .orderBy("measurement", "wstart")),

    // Arithmetic projection — the Grafana ratio idiom ((sum/count)*100,
    // i.e. a percentage built from two aggregates of the same series).
    "iql_arith" -> ((s, dir) =>
      InfluxQLEval.run(
        "SELECT (sum(value) / count(value)) * 100 AS pct FROM events " +
          "GROUP BY event_type",
        source(s, dir))
        .select(col("event_type"), r4(col("pct")).as("pct"))
        .orderBy("event_type")),

    // GROUP BY time(1h, 30m): buckets aligned to the half-hour grid —
    // the first bucket (23:30) reaches back BEFORE the WHERE lower
    // bound, as in v1.
    "iql_gb_offset" -> ((s, dir) =>
      InfluxQLEval.run(
        "SELECT sum(value) AS sum_v, count(value) AS n FROM events " +
          "WHERE time >= '2024-01-08T00:00:00Z' AND time < '2024-01-09T00:00:00Z' " +
          "GROUP BY time(1h, 30m), event_type FILL(none)",
        source(s, dir))
        .select(col("time").as("wstart"), col("event_type"),
          r4(col("sum_v")).as("sum_v"), col("n"))
        .orderBy("event_type", "wstart")),

    // tz(): daily buckets aligned to UTC-5 wall-clock days (what a
    // dashboard in that zone renders); bucket starts convert back to
    // UTC instants.
    "iql_tz" -> ((s, dir) =>
      InfluxQLEval.run(
        "SELECT sum(value) AS sum_v, count(value) AS n FROM events " +
          "WHERE time >= '2024-01-08T00:00:00Z' AND time < '2024-01-11T00:00:00Z' " +
          "GROUP BY time(1d), event_type FILL(none) tz('Etc/GMT+5')",
        source(s, dir))
        .select(col("time").as("wstart"), col("event_type"),
          r4(col("sum_v")).as("sum_v"), col("n"))
        .orderBy("event_type", "wstart")),

    // SELECT *: expands to every data column in name order.
    "iql_star" -> ((s, dir) =>
      InfluxQLEval.run(
        "SELECT * FROM events " +
          "WHERE time >= '2024-01-08T00:00:00Z' AND time < '2024-01-08T06:00:00Z' " +
          "AND value > 99",
        InfluxQLEval.Source(resolve = _ => events(s, dir)
          .select(col("ts").as("time"), col("event_type"), col("user_id"), col("value"))))
        .orderBy("time", "event_type", "user_id", "value")),

    // Scalar math over aggregates and fields (exactly-rounded IEEE ops
    // only — sqrt/abs/floor/ceil are bit-identical across engines;
    // exp/ln could differ in the last ulp between libm and the JVM).
    "iql_math" -> ((s, dir) =>
      InfluxQLEval.run(
        "SELECT sqrt(sum(value)) AS r, floor(max(value)) AS f, " +
          "abs(min(value) - 50) AS a FROM events GROUP BY event_type",
        source(s, dir))
        .select(col("event_type"), r4(col("r")).as("r"), col("f"), r4(col("a")).as("a"))
        .orderBy("event_type")),

    // GROUP BY time(6h), *: star expands to every declared tag key
    // (event_type, user_id) — the per-series split Grafana's
    // repeat-by-series panels issue.
    "iql_gb_star" -> ((s, dir) =>
      InfluxQLEval.run(
        "SELECT sum(value) AS sum_v, count(value) AS n FROM events " +
          "WHERE time >= '2024-01-08T00:00:00Z' AND time < '2024-01-09T00:00:00Z' " +
          "GROUP BY time(6h), * FILL(none)",
        source(s, dir))
        .select(col("time").as("wstart"), col("event_type"), col("user_id"),
          r4(col("sum_v")).as("sum_v"), col("n"))
        .orderBy("event_type", "user_id", "wstart")),

    // top(field, N): the N extreme POINTS (time + value) per tag series
    // — a multi-row selector, planned as a per-series row_number window
    // (ungrouped form is TakeOrderedAndProject).
    "iql_top" -> ((s, dir) =>
      InfluxQLEval.run(
        "SELECT top(value, 3) FROM events GROUP BY event_type",
        source(s, dir))
        .select(col("time"), col("event_type"), col("top"))
        .orderBy("event_type", "time", "top")),

    // top(field, tag, N): the extreme point per distinct tag value,
    // then the 3 most extreme among those — the v1 three-arg form.
    "iql_top_tag" -> ((s, dir) =>
      InfluxQLEval.run(
        "SELECT top(value, event_type, 3) AS t FROM events " +
          "WHERE time >= '2024-01-08T00:00:00Z' AND time < '2024-01-09T00:00:00Z'",
        source(s, dir))
        .select(col("time"), col("event_type"), r4(col("t")).as("t"))
        .orderBy("event_type", "time")),

    // sample(field, N): deterministic hash-of-time selection (v1 uses
    // an RNG; determinism is the distributed-retry-safe choice).
    "iql_sample" -> ((s, dir) =>
      InfluxQLEval.run(
        "SELECT sample(value, 4) AS sv FROM events " +
          "WHERE time >= '2024-01-08T00:00:00Z' AND time < '2024-01-09T00:00:00Z' " +
          "GROUP BY event_type",
        source(s, dir))
        .select(col("time"), col("event_type"), r4(col("sv")).as("sv"))
        .orderBy("event_type", "time")),

    // count(distinct(field)) — the v1 cardinality idiom.
    "iql_count_distinct" -> ((s, dir) =>
      InfluxQLEval.run(
        "SELECT count(distinct(user_id)) AS nd FROM events GROUP BY event_type",
        source(s, dir))
        .select(col("event_type"), col("nd"))
        .orderBy("event_type")),

    // distinct(field): distinct values per tag series (multi-row).
    "iql_distinct" -> ((s, dir) =>
      InfluxQLEval.run(
        "SELECT distinct(value) AS v FROM events WHERE value > 99.5 " +
          "GROUP BY event_type",
        source(s, dir))
        .orderBy("event_type", "v")),

    // FILL(0): empty windows inside the queried range emit zeros.
    "iql_fill" -> ((s, dir) =>
      InfluxQLEval.run(
        "SELECT sum(value) AS sum_v FROM events " +
          "WHERE time >= '2024-01-08T00:00:00Z' AND time < '2024-01-09T00:00:00Z' " +
          "AND event_type = 'purchase' AND value > 97 " +
          "GROUP BY time(1h) FILL(0)",
        source(s, dir))
        .select(col("time").as("wstart"), r4(col("sum_v")).as("sum_v"))
        .orderBy("wstart")),

    // FILL(linear): empty windows interpolate between the nearest
    // non-empty neighbors per series; leading/trailing gaps stay null
    // (v1 semantics — Grafana's "linear" panel fill).
    "iql_fill_linear" -> ((s, dir) =>
      InfluxQLEval.run(
        "SELECT sum(value) AS sum_v FROM events " +
          "WHERE time >= '2024-01-08T00:00:00Z' AND time < '2024-01-09T00:00:00Z' " +
          "AND value > 97 " +
          "GROUP BY time(1h), event_type FILL(linear)",
        source(s, dir))
        .select(col("time").as("wstart"), col("event_type"), r4(col("sum_v")).as("sum_v"))
        .orderBy("event_type", "wstart"))
  )

  private def w(s: String) = s.stripMargin

  /** One fitted-Holt (m = 0) SSE-evaluation stage for the iql_holt
    * oracle: a recursive CTE advancing every (α, β) candidate one grid
    * step per iteration, carrying (sse, fitted, level, trend) —
    * SeriesScan.emitHw's m=0 arithmetic with the smoothing constants
    * replaced by the candidate's columns.
    */
  private def holtRec(cand: String, rec: String): String = {
    val newLevel = "e.a * h.v + (1 - e.a) * (e.level + e.trend)"
    w(s"""$rec AS (
      |  SELECT c.event_type, 1 AS rn, c.ca, c.cb, c.a, c.b,
      |    CAST(0 AS DOUBLE) AS sse, CAST(NULL AS DOUBLE) AS fitted,
      |    sd.level0 AS level, sd.trend0 AS trend
      |  FROM seed0 sd JOIN $cand c ON sd.event_type = c.event_type
      |  UNION ALL
      |  SELECT e.event_type, h.rn, e.ca, e.cb, e.a, e.b,
      |    e.sse + (h.v - (e.level + e.trend)) * (h.v - (e.level + e.trend)) AS sse,
      |    e.level + e.trend AS fitted,
      |    $newLevel AS level,
      |    e.b * (($newLevel) - e.level) + (1 - e.b) * e.trend AS trend
      |  FROM src h JOIN $rec e ON h.event_type = e.event_type AND h.rn = e.rn + 1
      |)""")
  }

  /** Per-series argmin over a stage's final rows; (sse, ca, cb)
    * ordering ≡ SeriesScan.hwFitParams' strict-< walk.
    */
  private def holtBest(rec: String, best: String): String =
    w(s"""$best AS MATERIALIZED (
      |  SELECT r.event_type, r.ca, r.cb
      |  FROM $rec r JOIN stats s ON r.event_type = s.event_type AND r.rn = s.len
      |  QUALIFY row_number() OVER
      |    (PARTITION BY r.event_type ORDER BY r.sse, r.ca, r.cb) = 1
      |)""")

  /** Offset-refinement (α, β) grid around the previous stage's best. */
  private def holtCand(best: String, offsets: Seq[Int], cand: String): String = {
    val offs = offsets.mkString("[", ", ", "]")
    w(s"""$cand AS MATERIALIZED (
      |  SELECT p.event_type, p.ca + da.o AS ca, p.cb + db.o AS cb,
      |    CAST(p.ca + da.o AS DOUBLE) / 100.0 AS a,
      |    CAST(p.cb + db.o AS DOUBLE) / 100.0 AS b
      |  FROM $best p,
      |    (SELECT unnest($offs) AS o) da,
      |    (SELECT unnest($offs) AS o) db
      |)""")
  }

  val oracle: Map[String, String] = Map(
    "iql_gb_time" -> w(
      """WITH f AS (
        |  SELECT * FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-11 00:00:00'
        |), agg AS (
        |  SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart, event_type,
        |    sum(value) AS sum_v
        |  FROM f GROUP BY 1, 2
        |), spine AS (
        |  SELECT unnest(generate_series(
        |    TIMESTAMP '2024-01-08 00:00:00',
        |    TIMESTAMP '2024-01-10 23:00:00', INTERVAL '1 hour')) AS wstart
        |), combos AS (SELECT DISTINCT event_type FROM f)
        |SELECT s.wstart, c.event_type, round(a.sum_v, 4) AS sum_v
        |FROM spine s CROSS JOIN combos c
        |LEFT JOIN agg a ON s.wstart = a.wstart AND c.event_type = a.event_type
        |ORDER BY 2, 1"""),
    // med: v1 MEDIAN averages the two middle values on even counts —
    // quantile_cont(0.5) exactly. p90: v1 PERCENTILE is the
    // NEAREST-RANK point value sorted[floor(n·p/100 + 0.5)], a selector,
    // not an interpolated quantile.
    "iql_agg" -> w(
      """SELECT event_type, count(value) AS n, round(max(value), 4) AS max_v,
        |  round(quantile_cont(value, 0.5), 4) AS med,
        |  round(list_extract(list(value ORDER BY value),
        |    CAST(floor((count(value) * 90) / 100.0 + 0.5) AS INT)), 4) AS p90
        |FROM events GROUP BY 1 ORDER BY 1"""),
    "iql_derivative" -> w(
      """WITH hourly AS (
        |  SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart, event_type,
        |    sum(value) AS v
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-11 00:00:00'
        |  GROUP BY 1, 2
        |)
        |SELECT wstart, event_type, round(rate, 4) AS rate FROM (
        |  SELECT wstart, event_type,
        |    (v - lag(v) OVER w) /
        |      ((epoch(wstart) - lag(epoch(wstart)) OVER w) / 3600.0) AS rate,
        |    lag(v) OVER w AS pv
        |  FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY wstart)
        |) WHERE pv IS NOT NULL ORDER BY 2, 1"""),
    "iql_derivative_default" -> w(
      """WITH hourly AS (
        |  SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart, event_type,
        |    sum(value) AS v
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-11 00:00:00'
        |  GROUP BY 1, 2
        |)
        |SELECT wstart, event_type, round(rate, 4) AS rate FROM (
        |  SELECT wstart, event_type,
        |    (v - lag(v) OVER w) /
        |      ((epoch(wstart) - lag(epoch(wstart)) OVER w) / 3600.0) AS rate,
        |    lag(v) OVER w AS pv
        |  FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY wstart)
        |) WHERE pv IS NOT NULL ORDER BY 2, 1"""),
    // integral: tsec mirrors Spark's µs-truncated timestamp-to-double
    // cast exactly; first-row-in-partition terms are null (excluded
    // from sum) where Spark coalesces them to 0 — same result, and
    // single-point buckets coalesce to 0.0 on both sides.
    "iql_integral" -> w(
      """WITH f AS (
        |  SELECT event_type,
        |    time_bucket(INTERVAL '6 hours', ts) AS wstart,
        |    (epoch_ns(ts) // 1000) / 1000000.0 AS tsec,
        |    value
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-11 00:00:00'
        |), st AS (
        |  SELECT event_type, wstart, value, tsec,
        |    lag(value) OVER w AS pv, lag(tsec) OVER w AS pt
        |  FROM f WINDOW w AS (PARTITION BY event_type, wstart ORDER BY tsec)
        |)
        |SELECT wstart, event_type,
        |  round(COALESCE(sum((value + pv) / 2.0 * (tsec - pt) / 3600.0), 0.0), 4) AS itg
        |FROM st GROUP BY 1, 2 ORDER BY 2, 1"""),
    "iql_nn_difference" -> w(
      """WITH hourly AS (
        |  SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart, event_type,
        |    sum(value) AS v
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-11 00:00:00'
        |  GROUP BY 1, 2
        |)
        |SELECT wstart, event_type, round(d, 4) AS d FROM (
        |  SELECT wstart, event_type, v - lag(v) OVER w AS d, lag(v) OVER w AS pv
        |  FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY wstart)
        |) WHERE pv IS NOT NULL AND d >= 0 ORDER BY 2, 1"""),
    // hourly means feed the same seeded-SMA + recursion CTE the Flux
    // ema gates use; EMA is a contraction, so engine-order float noise
    // in the hourly means stays at ulp scale and round-4 absorbs it
    "iql_ema" -> w(
      s"""WITH RECURSIVE hourly AS MATERIALIZED (
         |  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS wt, avg(value) AS v
         |  FROM events
         |  WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-11 00:00:00'
         |  GROUP BY 1, 2
         |), src AS MATERIALIZED (
         |  SELECT event_type, row_number() OVER (PARTITION BY event_type ORDER BY wt) AS rn,
         |    epoch_us(wt) AS tus, v FROM hourly
         |),
         |${EmaFamilyQueries.emaCte("src", "v", 10, "e")}
         |SELECT event_type, make_timestamp(tus) AS wstart, round(ema, 4) AS ema
         |FROM e ORDER BY 1, 2"""),
    // constant-key wrapper reuses the per-group seeded-SMA recursion CTE
    "iql_ema_nogroup" -> w(
      s"""WITH RECURSIVE hourly AS MATERIALIZED (
         |  SELECT 'all' AS event_type, time_bucket(INTERVAL '1 hour', ts) AS wt, avg(value) AS v
         |  FROM events
         |  WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-11 00:00:00'
         |  GROUP BY 2
         |), src AS MATERIALIZED (
         |  SELECT event_type, row_number() OVER (PARTITION BY event_type ORDER BY wt) AS rn,
         |    epoch_us(wt) AS tus, v FROM hourly
         |),
         |${EmaFamilyQueries.emaCte("src", "v", 10, "e")}
         |SELECT make_timestamp(tus) AS wstart, round(ema, 4) AS ema
         |FROM e ORDER BY 1"""),
    // points 2..4 of each series in time order
    "iql_limit_series" -> w(
      """SELECT make_timestamp(epoch_us(ts)) AS t, event_type, round(value, 4) AS value
        |FROM (
        |  SELECT *, row_number() OVER
        |    (PARTITION BY event_type ORDER BY epoch_us(ts)) AS rn
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-09 00:00:00')
        |WHERE rn > 1 AND rn <= 4 ORDER BY 2, 1"""),

    // matching fields only (event_type doesn't match /^(user|val)/)
    "iql_field_regex" -> w(
      """SELECT ts AS time, user_id, value FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-08 06:00:00'
        |  AND value > 99
        |ORDER BY 1, 2, 3"""),
    "iql_agg_regex" -> w(
      """SELECT event_type, round(avg(value), 4) AS mean_value
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-11 00:00:00'
        |GROUP BY 1 ORDER BY 1"""),

    // star-expanded aggregates per (6h bucket, tag) + fill spine
    "iql_agg_star" -> w(
      """WITH f AS (
        |  SELECT * FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-11 00:00:00'
        |), agg AS (
        |  SELECT time_bucket(INTERVAL '6 hours', ts) AS t, event_type,
        |    avg(value) AS mean_value,
        |    count(user_id) AS count_user_id, count(value) AS count_value
        |  FROM f GROUP BY 1, 2
        |), spine AS (
        |  SELECT unnest(generate_series(
        |    TIMESTAMP '2024-01-08 00:00:00',
        |    TIMESTAMP '2024-01-10 18:00:00', INTERVAL '6 hours')) AS t
        |), combos AS (SELECT DISTINCT event_type FROM f)
        |SELECT s.t, c.event_type, round(a.mean_value, 4) AS mean_value,
        |  a.count_user_id, a.count_value
        |FROM spine s CROSS JOIN combos c
        |LEFT JOIN agg a ON s.t = a.t AND c.event_type = a.event_type
        |ORDER BY 2, 1"""),

    // distinct values per (6h bucket, tag)
    "iql_distinct_time" -> w(
      """SELECT DISTINCT time_bucket(INTERVAL '6 hours', ts) AS t,
        |  event_type, user_id AS u
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-09 00:00:00'
        |ORDER BY 2, 1, 3"""),

    // N hash-sampled points per (12h bucket, tag); the md5-of-µs-time
    // order replicates Spark's deterministic sampler exactly
    "iql_sample_time" -> w(
      """WITH f AS (
        |  SELECT ts, event_type, value,
        |    time_bucket(INTERVAL '12 hours', ts) AS wstart,
        |    md5(CAST((epoch_ns(ts) // 1000) AS VARCHAR)) AS hh
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-11 00:00:00'
        |)
        |SELECT make_timestamp(epoch_us(ts)) AS t, event_type, round(value, 4) AS sv
        |FROM (
        |  SELECT *, row_number() OVER
        |    (PARTITION BY event_type, wstart ORDER BY hh ASC, value ASC) AS r FROM f)
        |WHERE r <= 2 ORDER BY 2, 1"""),

    // N extreme points per (6h bucket, tag); µs-truncated time in the
    // tie-break mirrors Spark's µs axis
    "iql_top_time" -> w(
      """WITH f AS (
        |  SELECT event_type, ts, value,
        |    time_bucket(INTERVAL '6 hours', ts) AS wstart
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-11 00:00:00'
        |), rk AS (
        |  SELECT event_type, ts, value,
        |    row_number() OVER (PARTITION BY event_type, wstart
        |      ORDER BY value DESC, epoch_us(ts) ASC) AS rn
        |  FROM f
        |)
        |SELECT make_timestamp(epoch_us(ts)) AS t, event_type, round(value, 4) AS topv
        |FROM rk WHERE rn <= 2 ORDER BY 2, 1"""),

    // nearest-rank percentile per (6h bucket, tag) + the fill(null)
    // spine (v1's GROUP BY time() default)
    "iql_percentile" -> w(
      """WITH f AS (
        |  SELECT * FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-11 00:00:00'
        |), agg AS (
        |  SELECT time_bucket(INTERVAL '6 hours', ts) AS wstart, event_type,
        |    list_extract(list(value ORDER BY value),
        |      CAST(floor((count(value) * 90) / 100.0 + 0.5) AS INT)) AS p90
        |  FROM f GROUP BY 1, 2
        |), spine AS (
        |  SELECT unnest(generate_series(
        |    TIMESTAMP '2024-01-08 00:00:00',
        |    TIMESTAMP '2024-01-10 18:00:00', INTERVAL '6 hours')) AS wstart
        |), combos AS (SELECT DISTINCT event_type FROM f)
        |SELECT s.wstart, c.event_type, round(a.p90, 4) AS p90
        |FROM spine s CROSS JOIN combos c
        |LEFT JOIN agg a ON s.wstart = a.wstart AND c.event_type = a.event_type
        |ORDER BY 2, 1"""),
    // Holt (no season) with FITTED (α, β) — replays
    // SeriesScan.hwFitParams' m=0 schedule: {0.2,0.5,0.8}² sweep, then
    // ±0.10 and ±0.05 around the running argmin (γ inert, pinned).
    // Each stage is one recursive SSE evaluation over every candidate
    // (state: level, trend, sse, fitted) seeded at (level=v₁,
    // trend=v₂−v₁); argmin orders by (sse, ca, cb). Fitted rows and
    // forecasts come from the winning candidate's chain. Unrounded
    // hourly sums are safe: the recursion is a contraction, ulp noise
    // dies under round-4.
    "iql_holt" -> w(
      s"""WITH RECURSIVE hourly AS MATERIALIZED (
         |  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS wt, sum(value) AS v
         |  FROM events
         |  WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-11 00:00:00'
         |  GROUP BY 1, 2
         |), src AS MATERIALIZED (
         |  SELECT event_type, row_number() OVER (PARTITION BY event_type ORDER BY wt) AS rn,
         |    epoch_us(wt) AS tus, v FROM hourly
         |), stats AS MATERIALIZED (
         |  SELECT event_type, max(rn) AS len, min(tus) AS t0, max(tus) AS t1
         |  FROM src GROUP BY 1
         |), seed0 AS MATERIALIZED (
         |  SELECT s1.event_type, s1.v AS level0, s2.v - s1.v AS trend0
         |  FROM src s1 JOIN src s2 ON s1.event_type = s2.event_type
         |    AND s1.rn = 1 AND s2.rn = 2
         |), cand1 AS MATERIALIZED (
         |  SELECT sd.event_type, ga.c AS ca, gb.c AS cb,
         |    CAST(ga.c AS DOUBLE) / 100.0 AS a, CAST(gb.c AS DOUBLE) / 100.0 AS b
         |  FROM seed0 sd,
         |    (SELECT unnest([20, 50, 80]) AS c) ga,
         |    (SELECT unnest([20, 50, 80]) AS c) gb
         |),
         |${holtRec("cand1", "rec1")},
         |${holtBest("rec1", "best1")},
         |${holtCand("best1", Seq(-10, 0, 10), "cand2")},
         |${holtRec("cand2", "rec2")},
         |${holtBest("rec2", "best2")},
         |${holtCand("best2", Seq(-5, 0, 5), "cand3")},
         |${holtRec("cand3", "rec3")},
         |${holtBest("rec3", "best3")}
         |SELECT r.event_type, make_timestamp(s.tus) AS wstart, round(r.fitted, 4) AS hw
         |FROM rec3 r
         |JOIN best3 bb ON r.event_type = bb.event_type AND r.ca = bb.ca AND r.cb = bb.cb
         |JOIN src s ON r.event_type = s.event_type AND r.rn = s.rn
         |WHERE r.rn > 1
         |UNION ALL
         |SELECT e.event_type,
         |  make_timestamp(st.t1 + ((st.t1 - st.t0) // (st.len - 1)) * f.h) AS wstart,
         |  round(e.level + e.trend * f.h, 4) AS hw
         |FROM rec3 e
         |JOIN best3 bb ON e.event_type = bb.event_type AND e.ca = bb.ca AND e.cb = bb.cb
         |JOIN stats st ON e.event_type = st.event_type AND e.rn = st.len
         |CROSS JOIN (SELECT unnest(range(1, 7)) AS h) f
         |ORDER BY 1, 2"""),
    "iql_mavg_nogroup" -> w(
      """WITH hourly AS (
        |  SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart, sum(value) AS v
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-11 00:00:00'
        |  GROUP BY 1
        |)
        |SELECT wstart, round(mavg, 4) AS mavg FROM (
        |  SELECT wstart, avg(v) OVER w AS mavg, count(v) OVER w AS c
        |  FROM hourly WINDOW w AS (ORDER BY wstart ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
        |) WHERE c = 6 ORDER BY 1"""),
    "iql_derivative_nogroup" -> w(
      """WITH hourly AS (
        |  SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart, sum(value) AS v
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-11 00:00:00'
        |  GROUP BY 1
        |)
        |SELECT wstart, round(rate, 4) AS rate FROM (
        |  SELECT wstart,
        |    (v - lag(v) OVER w) /
        |      ((epoch(wstart) - lag(epoch(wstart)) OVER w) / 3600.0) AS rate,
        |    lag(v) OVER w AS pv
        |  FROM hourly WINDOW w AS (ORDER BY wstart)
        |) WHERE pv IS NOT NULL ORDER BY 1"""),
    "iql_show_tag_values" -> w(
      """SELECT DISTINCT 'event_type' AS key, event_type AS value FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-09 00:00:00'
        |  AND value > 90
        |ORDER BY 2"""),
    "iql_tag_values_in" -> w(
      """WITH tv AS (
        |  SELECT 'event_type' AS key, event_type AS value FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-09 00:00:00'
        |    AND value > 50
        |  UNION
        |  SELECT 'user_id', CAST(user_id AS VARCHAR) FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-09 00:00:00'
        |    AND value > 50
        |)
        |SELECT key, value FROM tv ORDER BY 1, 2 LIMIT 25 OFFSET 2"""),
    "iql_subquery" -> w(
      """WITH hourly AS (
        |  SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart, event_type,
        |    sum(value) AS v
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-11 00:00:00'
        |  GROUP BY 1, 2
        |)
        |SELECT event_type, round(max(v), 4) AS max_v FROM hourly GROUP BY 1 ORDER BY 1"""),
    "iql_from_regex" -> w(
      """SELECT event_type AS measurement, time_bucket(INTERVAL '6 hours', ts) AS wstart,
        |  count(value) AS n, round(sum(value), 4) AS sum_v
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-09 00:00:00'
        |  AND regexp_matches(event_type, '^(click|view)$')
        |GROUP BY 1, 2 ORDER BY 1, 2"""),
    "iql_arith" -> w(
      """SELECT event_type, round(sum(value) / count(value) * 100, 4) AS pct
        |FROM events GROUP BY 1 ORDER BY 1"""),
    "iql_gb_offset" -> w(
      """SELECT time_bucket(INTERVAL '1 hour', ts, TIMESTAMP '2024-01-08 00:30:00') AS wstart,
        |  event_type, round(sum(value), 4) AS sum_v, count(value) AS n
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-09 00:00:00'
        |GROUP BY 1, 2 ORDER BY 2, 1"""),
    "iql_tz" -> w(
      """SELECT time_bucket(INTERVAL '1 day', ts - INTERVAL 5 HOUR) + INTERVAL 5 HOUR AS wstart,
        |  event_type, round(sum(value), 4) AS sum_v, count(value) AS n
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-11 00:00:00'
        |GROUP BY 1, 2 ORDER BY 2, 1"""),
    "iql_star" -> w(
      """SELECT ts AS time, event_type, user_id, value FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-08 06:00:00'
        |  AND value > 99
        |ORDER BY 1, 2, 3, 4"""),
    "iql_math" -> w(
      """SELECT event_type, round(sqrt(sum(value)), 4) AS r,
        |  floor(max(value)) AS f, round(abs(min(value) - 50), 4) AS a
        |FROM events GROUP BY 1 ORDER BY 1"""),
    "iql_gb_star" -> w(
      """SELECT time_bucket(INTERVAL '6 hours', ts) AS wstart, event_type, user_id,
        |  round(sum(value), 4) AS sum_v, count(value) AS n
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-09 00:00:00'
        |GROUP BY 1, 2, 3 ORDER BY 2, 3, 1"""),
    "iql_top" -> w(
      """SELECT ts AS time, event_type, value AS top FROM (
        |  SELECT ts, event_type, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value DESC, ts ASC) AS rn
        |  FROM events
        |) WHERE rn <= 3 ORDER BY 2, 1, 3"""),
    "iql_top_tag" -> w(
      """WITH f AS (
        |  SELECT ts, event_type, value FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-09 00:00:00'
        |), best AS (
        |  SELECT ts, event_type, value FROM (
        |    SELECT ts, event_type, value,
        |      row_number() OVER (PARTITION BY event_type ORDER BY value DESC, ts ASC) AS r
        |    FROM f) WHERE r = 1
        |), sel AS (
        |  SELECT ts, event_type, value FROM (
        |    SELECT *, row_number() OVER (ORDER BY value DESC, ts ASC) AS r2 FROM best)
        |  WHERE r2 <= 3)
        |SELECT ts AS time, event_type, round(value, 4) AS t FROM sel ORDER BY 2, 1"""),
    "iql_sample" -> w(
      """WITH f AS (
        |  SELECT ts, event_type, value,
        |    md5(CAST((epoch_ns(ts) // 1000) AS VARCHAR)) AS hh
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-09 00:00:00'
        |), sel AS (
        |  SELECT ts, event_type, value FROM (
        |    SELECT *, row_number() OVER
        |      (PARTITION BY event_type ORDER BY hh ASC, value ASC) AS r FROM f)
        |  WHERE r <= 4)
        |SELECT ts AS time, event_type, round(value, 4) AS sv FROM sel ORDER BY 2, 1"""),
    "iql_count_distinct" -> w(
      """SELECT event_type, count(DISTINCT user_id) AS nd
        |FROM events GROUP BY 1 ORDER BY 1"""),
    "iql_distinct" -> w(
      """SELECT DISTINCT event_type, value AS v FROM events
        |WHERE value > 99.5 ORDER BY 1, 2"""),
    "iql_fill" -> w(
      """WITH f AS (
        |  SELECT * FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-09 00:00:00'
        |    AND event_type = 'purchase' AND value > 97
        |), agg AS (
        |  SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart, sum(value) AS sum_v
        |  FROM f GROUP BY 1
        |), spine AS (
        |  SELECT unnest(generate_series(
        |    TIMESTAMP '2024-01-08 00:00:00',
        |    TIMESTAMP '2024-01-08 23:00:00', INTERVAL '1 hour')) AS wstart
        |)
        |SELECT s.wstart, round(coalesce(a.sum_v, 0), 4) AS sum_v
        |FROM spine s LEFT JOIN agg a ON s.wstart = a.wstart ORDER BY 1"""),
    "iql_fill_linear" -> w(
      """WITH f AS (
        |  SELECT * FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-09 00:00:00'
        |    AND value > 97
        |), agg AS (
        |  SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart, event_type,
        |    sum(value) AS sum_v
        |  FROM f GROUP BY 1, 2
        |), spine AS (
        |  SELECT s.wstart, t.event_type FROM
        |    (SELECT unnest(generate_series(
        |      TIMESTAMP '2024-01-08 00:00:00',
        |      TIMESTAMP '2024-01-08 23:00:00', INTERVAL '1 hour')) AS wstart) s
        |    CROSS JOIN (SELECT DISTINCT event_type FROM agg) t
        |), j AS (
        |  SELECT s.wstart, s.event_type, a.sum_v
        |  FROM spine s LEFT JOIN agg a
        |    ON s.wstart = a.wstart AND s.event_type = a.event_type
        |), st AS (
        |  SELECT wstart, event_type, sum_v,
        |    last_value(sum_v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY wstart
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
        |    last_value(CASE WHEN sum_v IS NOT NULL THEN epoch(wstart) END IGNORE NULLS)
        |      OVER (PARTITION BY event_type ORDER BY wstart
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt,
        |    first_value(sum_v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY wstart
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
        |    first_value(CASE WHEN sum_v IS NOT NULL THEN epoch(wstart) END IGNORE NULLS)
        |      OVER (PARTITION BY event_type ORDER BY wstart
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt
        |  FROM j
        |)
        |SELECT wstart, event_type,
        |  round(CASE WHEN sum_v IS NOT NULL THEN sum_v
        |    ELSE pv + (nv - pv) * (epoch(wstart) - pt) / (nt - pt) END, 4) AS sum_v
        |FROM st ORDER BY 2, 1""")
  )
}
