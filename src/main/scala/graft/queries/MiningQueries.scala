package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{GraphOps, PathOps, SeriesMiningOps}

/** Series-mining gates: ACF, lagged cross-correlation, SAX words,
  * least-squares forecast, binary-segmentation changepoints, Tukey
  * outliers, and the 2-D dashboard heatmap — the
  * monitoring/forecasting layer over the events table.
  *
  * Oracle discipline (see SeriesMiningOps): every statistic is built
  * from grid-exact or integer-exact sums, and each FP division /
  * sqrt is written with the SAME expression shape on both sides, so
  * the round(4) hash compare is deterministic. The changepoint gate
  * additionally quantizes the hourly series to integer cents
  * (round(sum·100)) — the FP sum sits ~1e-10 from the true integer,
  * never near the rounding cliff, so both engines quantize to the
  * same exact longs and the per-series argmin is bit-deterministic.
  */
object MiningQueries {
  import QueryUtil._

  /** Hourly rollup per event_type: integer hour index (µs div 3600e6)
    * + grid-exact hourly sum — the shared input of the mining gates.
    */
  private def hourly(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("h", expr("(ts_ns div 1000) div 3600000000"))
      .groupBy(col("event_type"), col("h"))
      .agg(sum(col("value")).as("hv"))

  /** hourly + 0-based per-series position (rank of hour). */
  private def hourlyPos(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("h")
    hourly(s, dir).withColumn("pos", (row_number().over(w) - 1).cast("long"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Autocorrelation at lags 1..10 per event_type on the raw series
    // (total (ts_us, event_id) order).
    "acf_lags" -> ((s, dir) => {
      val e = events(s, dir).withColumn("ts_us", expr("ts_ns div 1000"))
      SeriesMiningOps.acf(e, Seq("event_type"), Seq("ts_us", "event_id"),
          "value", maxLag = 10)
        .select(col("event_type"), col("lag").cast("long").as("lag"),
          r4(col("acf")).as("acf"))
        .orderBy("event_type", "lag")
    }),

    // Cross-correlation of hourly click vs purchase volume at lags
    // −6..+6 h: does click activity lead purchases?
    "ccf_lag" -> ((s, dir) => {
      val hv = hourly(s, dir)
      val x = hv.where(col("event_type") === "click").select(col("h"), col("hv"))
      val y = hv.where(col("event_type") === "purchase").select(col("h"), col("hv"))
      SeriesMiningOps.crossCorrelation(x, y, "h", "hv", (-6 to 6).toSeq)
        .select(col("lag"), col("m"), r4(col("ccf")).as("ccf"))
        .orderBy("lag")
    }),

    // SAX word: 16-segment PAA over the z-normalized hourly series,
    // 4-letter alphabet at the N(0,1) equiprobable breakpoints.
    "sax_symbols" -> ((s, dir) =>
      SeriesMiningOps.sax(hourlyPos(s, dir), Seq("event_type"), "pos", "hv",
          segments = 16)
        .select(col("event_type"), col("segment"), r4(col("paa")).as("paa"),
          col("symbol"))
        .orderBy("event_type", "segment")),

    // Least-squares hourly trend + 6-hour-ahead forecast per type.
    "forecast_linear" -> ((s, dir) =>
      SeriesMiningOps.linearForecast(hourly(s, dir), Seq("event_type"), "h",
          "hv", horizon = 6)
        .select(col("event_type"), col("step"), r4(col("slope")).as("slope"),
          r4(col("intercept")).as("intercept"), r4(col("yhat")).as("yhat"))
        .orderBy("event_type", "step")),

    // Depth-2 binary-segmentation changepoints over the integer-cent
    // hourly series: the best global split, then the best split in
    // each half. Costs reported in value² units (cents²/10⁸).
    "changepoints" -> ((s, dir) => {
      val q = hourlyPos(s, dir)
        .withColumn("yc", round(col("hv") * 100).cast("long"))
      SeriesMiningOps.changepoints(q, Seq("event_type"), "pos", "yc")
        .select(col("event_type"), col("depth"), col("t"),
          r4(col("cost") / 1.0e8).as("cost"))
        .orderBy("event_type", "depth", "t")
    }),

    // Tukey-fence outlier summary per event_type.
    "outlier_iqr" -> ((s, dir) =>
      SeriesMiningOps.iqrOutliers(events(s, dir), Seq("event_type"), "value")
        .select(col("event_type"), col("n"), col("n_low"), col("n_high"),
          r4(col("lo")).as("lo"), r4(col("hi")).as("hi"))
        .orderBy("event_type")),

    // Dashboard heatmap: hour-of-day × value-bin occupancy counts.
    "heatmap_2d" -> ((s, dir) =>
      events(s, dir)
        .groupBy(hour(col("ts")).cast("long").as("hr"),
          floor(col("value") / 25.0).cast("long").as("vbin"))
        .agg(count(lit(1)).as("n"))
        .orderBy("hr", "vbin")),

    // PageRank over the session-transition graph: which event type
    // accumulates visit mass under the 6h-gap session Markov chain.
    "pagerank_types" -> ((s, dir) => {
      val e = events(s, dir).withColumn("ts_us", expr("ts_ns div 1000"))
      val tr = PathOps.transitions(e, "user_id", "event_type", "ts_us",
        "event_id", maxGap = 21600000000L)
      GraphOps.pagerank(tr, "from_type", "to_type", "n", d = 0.85, iters = 5)
        .select(col("node"), r4(col("r")).as("rank"))
        .orderBy("node")
    }),

    // Banded DTW between every event-type pair's first-96-hour
    // integer-cent series: alignment-based similarity beside ccf_lag's
    // fixed-lag correlation. Integer DP → the distance is exact; the
    // oracle replays the DP as an anti-diagonal recursive CTE.
    "dtw_distance" -> ((s, dir) => {
      val ser = hourlyPos(s, dir)
        .where(col("pos") < 96)
        .withColumn("cents", round(col("hv") * 100).cast("long"))
      SeriesMiningOps.dtwPairs(ser, "event_type", "pos", "cents", band = 8)
        .select(col("key_a").as("type_a"), col("key_b").as("type_b"),
          col("dtw_cents"),
          (col("dtw_cents").cast("double") / 100.0).as("dtw"))
        .orderBy("type_a", "type_b")
    }),

    // Walk-forward forecast evaluation: OLS fit on the first 120 hourly
    // positions, scored on the next 24 with MAE / sMAPE / MASE (scaled
    // by in-sample one-step naive MAE) — the honest companion of
    // forecast_linear: not just a fit, but how good the fit is.
    "forecast_eval" -> ((s, dir) => {
      val ser = hourlyPos(s, dir)
        .withColumn("cents", round(col("hv") * 100).cast("long"))
      SeriesMiningOps.olsBacktest(ser, Seq("event_type"), "pos", "cents",
          trainN = 120, evalN = 24)
        .select(col("event_type"), col("n_eval"),
          r4(col("mae") / 100.0).as("mae"),
          r4(col("smape")).as("smape"), r4(col("mase")).as("mase"))
        .orderBy("event_type")
    }),

    // Theil–Sen robust slope of each type's daily-cents series: median
    // of pairwise slopes, the outlier-immune beside forecast_linear's
    // OLS fit. Slope reported back in value units per day.
    "theil_sen" -> ((s, dir) => {
      val d = events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(round(sum(col("value")) * 100).cast("long").as("c"))
        .withColumn("x", unix_date(col("day")).cast("long"))
      SeriesMiningOps.theilSen(d, Seq("event_type"), "x", "c")
        .select(col("event_type"), col("n_pairs"),
          r4(col("med_slope") / 100.0).as("slope"))
        .orderBy("event_type")
    })
  )

  private def w(s: String) = s.stripMargin

  // Shared oracle CTE: hourly sums per type (grid-exact doubles).
  private val hourlySql =
    """hv AS (SELECT event_type, epoch_us(ts) // 3600000000 AS h,
      |         sum(value) AS v FROM events GROUP BY 1, 2)"""

  val oracle: Map[String, String] = Map(

    "acf_lags" -> w(
      """WITH ord AS (
        |  SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events
        |), lags AS (SELECT CAST(k AS BIGINT) AS lag FROM generate_series(1, 10) t(k)),
        |pairs AS (
        |  SELECT o.event_type, l.lag, o.value AS v, p.value AS pv
        |  FROM ord o JOIN lags l ON true
        |  JOIN ord p ON p.event_type = o.event_type AND p.rn = o.rn - l.lag
        |), cr AS (
        |  SELECT event_type, lag, sum(v * pv) AS sxy, sum(v) AS sv,
        |    sum(pv) AS spv, count(*) AS m
        |  FROM pairs GROUP BY 1, 2
        |), st AS (
        |  SELECT event_type, count(*) AS n, sum(value) AS s1,
        |    sum(value * value) AS s2
        |  FROM events GROUP BY 1)
        |SELECT c.event_type, c.lag,
        |  round((sxy - (s1 / n) * (sv + spv) + m * (s1 / n) * (s1 / n))
        |    / (s2 - s1 * s1 / n), 4) AS acf
        |FROM cr c JOIN st s ON c.event_type = s.event_type
        |ORDER BY 1, 2"""),

    "ccf_lag" -> w(
      """WITH x AS (SELECT epoch_us(ts) // 3600000000 AS i, sum(value) AS xv
        |           FROM events WHERE event_type = 'click' GROUP BY 1),
        |y AS (SELECT epoch_us(ts) // 3600000000 AS j, sum(value) AS yv
        |      FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |lags AS (SELECT CAST(k AS BIGINT) AS lag FROM generate_series(-6, 6) t(k)),
        |p AS (SELECT lag, xv, yv FROM x JOIN lags ON true
        |      JOIN y ON j = i + lag),
        |a AS (SELECT lag, count(*) AS m, sum(xv) AS sx, sum(yv) AS sy,
        |        sum(xv * yv) AS sxy, sum(xv * xv) AS sxx, sum(yv * yv) AS syy
        |      FROM p GROUP BY 1)
        |SELECT lag, m,
        |  round((m * sxy - sx * sy)
        |    / sqrt((m * sxx - sx * sx) * (m * syy - sy * sy)), 4) AS ccf
        |FROM a ORDER BY lag"""),

    "sax_symbols" -> w(
      s"""WITH $hourlySql,
        |pos AS (SELECT event_type, v,
        |          row_number() OVER (PARTITION BY event_type ORDER BY h) - 1 AS p
        |        FROM hv),
        |st AS (SELECT event_type, count(*) AS n, sum(v) AS s1, sum(v * v) AS s2
        |       FROM hv GROUP BY 1),
        |seg AS (
        |  SELECT p.event_type, CAST(floor(p.p * 16 / s.n) AS BIGINT) AS segment,
        |    sum(p.v) AS ss, count(*) AS len,
        |    any_value(s.s1) AS s1, any_value(s.s2) AS s2, any_value(s.n) AS n
        |  FROM pos p JOIN st s ON p.event_type = s.event_type
        |  GROUP BY 1, 2
        |), paa AS (
        |  SELECT event_type, segment,
        |    (ss / len - s1 / n) / sqrt((s2 - s1 * s1 / n) / n) AS paa
        |  FROM seg)
        |SELECT event_type, segment, round(paa, 4) AS paa,
        |  CASE WHEN paa < -0.6745 THEN 'a' WHEN paa < 0.0 THEN 'b'
        |       WHEN paa < 0.6745 THEN 'c' ELSE 'd' END AS symbol
        |FROM paa ORDER BY 1, 2"""),

    "forecast_linear" -> w(
      s"""WITH $hourlySql,
        |mins AS (SELECT event_type, min(h) AS minx FROM hv GROUP BY 1),
        |based AS (SELECT hv.event_type, CAST(h - minx AS BIGINT) AS x, v
        |          FROM hv JOIN mins ON hv.event_type = mins.event_type),
        |fit AS (
        |  SELECT event_type, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
        |    sum(v) AS sy, sum(x * v) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx, max(x) AS maxx
        |  FROM based GROUP BY 1
        |), co AS (
        |  SELECT event_type, n, sx, sy, maxx,
        |    (n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE) AS slope
        |  FROM fit
        |), li AS (
        |  SELECT event_type, maxx, slope, (sy - slope * sx) / n AS intercept
        |  FROM co)
        |SELECT event_type, CAST(step AS BIGINT) AS step, round(slope, 4) AS slope,
        |  round(intercept, 4) AS intercept,
        |  round(intercept + slope * (maxx + step), 4) AS yhat
        |FROM li JOIN generate_series(1, 6) g(step) ON true
        |ORDER BY 1, 2"""),

    "changepoints" -> w(
      """WITH hq AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
        |    CAST(round(sum(value) * 100) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2
        |), pre AS (
        |  SELECT event_type, y, row_number() OVER w - 1 AS p,
        |    CAST(sum(y) OVER w AS BIGINT) AS c1,
        |    CAST(sum(y * y) OVER w AS BIGINT) AS c2
        |  FROM hq WINDOW w AS (PARTITION BY event_type ORDER BY h
        |    ROWS UNBOUNDED PRECEDING)
        |), tot AS (
        |  SELECT event_type, count(*) AS n, CAST(sum(y) AS BIGINT) AS s1,
        |    CAST(sum(y * y) AS BIGINT) AS s2
        |  FROM hq GROUP BY 1
        |), cost1 AS (
        |  SELECT p.event_type, p.p + 1 AS t, c1, c2, n, s1, s2,
        |    (c2 - (c1 * c1) / CAST(p.p + 1 AS DOUBLE))
        |      + ((s2 - c2) - ((s1 - c1) * (s1 - c1)) / CAST(n - (p.p + 1) AS DOUBLE)) AS cost
        |  FROM pre p JOIN tot USING (event_type) WHERE p.p + 1 < n
        |), sp1 AS (
        |  SELECT * FROM (SELECT *, row_number() OVER
        |      (PARTITION BY event_type ORDER BY cost, t) AS rk FROM cost1)
        |  WHERE rk = 1
        |), segs AS (
        |  SELECT event_type, CAST(0 AS BIGINT) AS a, t AS b,
        |    CAST(0 AS BIGINT) AS c1a, CAST(0 AS BIGINT) AS c2a,
        |    c1 AS c1b, c2 AS c2b
        |  FROM sp1
        |  UNION ALL
        |  SELECT event_type, t AS a, n AS b, c1 AS c1a, c2 AS c2a,
        |    s1 AS c1b, s2 AS c2b
        |  FROM sp1
        |), cost2 AS (
        |  SELECT p.event_type, g.a, p.p + 1 AS t,
        |    ((p.c2 - g.c2a) - ((p.c1 - g.c1a) * (p.c1 - g.c1a)) / CAST(p.p + 1 - g.a AS DOUBLE))
        |      + ((g.c2b - p.c2) - ((g.c1b - p.c1) * (g.c1b - p.c1)) / CAST(g.b - (p.p + 1) AS DOUBLE)) AS cost
        |  FROM pre p JOIN segs g ON p.event_type = g.event_type
        |  WHERE p.p + 1 > g.a AND p.p + 1 < g.b
        |), sp2 AS (
        |  SELECT * FROM (SELECT *, row_number() OVER
        |      (PARTITION BY event_type, a ORDER BY cost, t) AS rk FROM cost2)
        |  WHERE rk = 1)
        |SELECT event_type, CAST(1 AS BIGINT) AS depth, t, round(cost / 1e8, 4) AS cost
        |FROM sp1
        |UNION ALL
        |SELECT event_type, CAST(2 AS BIGINT) AS depth, t, round(cost / 1e8, 4) AS cost
        |FROM sp2
        |ORDER BY 1, 2, 3"""),

    "outlier_iqr" -> w(
      """WITH q AS (
        |  SELECT event_type, quantile_cont(value, 0.25) AS q1,
        |    quantile_cont(value, 0.75) AS q3
        |  FROM events GROUP BY 1
        |), f AS (
        |  SELECT event_type, q1 - (q3 - q1) * 1.5 AS lo, q3 + (q3 - q1) * 1.5 AS hi
        |  FROM q)
        |SELECT e.event_type, count(*) AS n,
        |  CAST(sum(CASE WHEN value < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
        |  CAST(sum(CASE WHEN value > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
        |  round(any_value(lo), 4) AS lo, round(any_value(hi), 4) AS hi
        |FROM events e JOIN f ON e.event_type = f.event_type
        |GROUP BY 1 ORDER BY 1"""),

    "heatmap_2d" -> w(
      """SELECT CAST(date_part('hour', ts) AS BIGINT) AS hr,
        |  CAST(floor(value / 25.0) AS BIGINT) AS vbin, count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2"""),

    // Anti-diagonal recursive DP: the working set holds diagonals d and
    // d−1 (rows flagged n=1 / n=0); each step fans every cell to its
    // successors (right/down from the new diagonal, diagonal-move from
    // the old), groups by target cell with min(acc), and adds the
    // target's cost — the inner join against the banded cost table
    // prunes out-of-range and out-of-band targets, and carries stop at
    // the last diagonal, terminating the recursion. Integer cents
    // throughout: the min/+ algebra is exact on both engines.
    "dtw_distance" -> w(
      """WITH RECURSIVE hv AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
        |    CAST(round(sum(value) * 100) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |ser AS (
        |  SELECT * FROM (
        |    SELECT event_type, c,
        |      row_number() OVER (PARTITION BY event_type ORDER BY h) - 1 AS p
        |    FROM hv) WHERE p < 96),
        |len AS (SELECT event_type, count(*) AS n FROM ser GROUP BY 1),
        |pr AS (
        |  SELECT la.event_type AS ta, lb.event_type AS tb, la.n AS na, lb.n AS nb
        |  FROM len la, len lb WHERE la.event_type < lb.event_type),
        |cost AS MATERIALIZED (
        |  SELECT pr.ta, pr.tb, pr.na, pr.nb, sa.p AS i, sb.p AS j,
        |    abs(sa.c - sb.c) AS c
        |  FROM pr
        |  JOIN ser sa ON sa.event_type = pr.ta
        |  JOIN ser sb ON sb.event_type = pr.tb
        |  WHERE abs(sa.p - sb.p) <= 8),
        |dp AS (
        |  SELECT ta, tb, na, nb, 0 AS i, 0 AS j, 0 AS d, 1 AS n, c AS acc
        |  FROM cost WHERE i = 0 AND j = 0
        |  UNION ALL
        |  SELECT g.ta, g.tb, g.na, g.nb, g.ti, g.tj, g.td, g.nn,
        |    CASE WHEN g.nn = 1 THEN g.macc + cost.c ELSE g.macc END AS acc
        |  FROM (
        |    SELECT mv.ta, mv.tb, mv.na, mv.nb, mv.ti, mv.tj, mv.td,
        |      max(mv.isnew) AS nn, min(mv.acc) AS macc
        |    FROM (
        |      SELECT unnest(CASE WHEN p.n = 1 THEN
        |        list_concat(
        |          [{'ta': p.ta, 'tb': p.tb, 'na': p.na, 'nb': p.nb,
        |            'ti': p.i + 1, 'tj': p.j, 'td': p.d + 1, 'isnew': 1, 'acc': p.acc},
        |           {'ta': p.ta, 'tb': p.tb, 'na': p.na, 'nb': p.nb,
        |            'ti': p.i, 'tj': p.j + 1, 'td': p.d + 1, 'isnew': 1, 'acc': p.acc}],
        |          CASE WHEN p.d < p.na + p.nb - 2 THEN
        |            [{'ta': p.ta, 'tb': p.tb, 'na': p.na, 'nb': p.nb,
        |              'ti': p.i, 'tj': p.j, 'td': p.d, 'isnew': 0, 'acc': p.acc}]
        |          ELSE [] END)
        |      ELSE
        |        [{'ta': p.ta, 'tb': p.tb, 'na': p.na, 'nb': p.nb,
        |          'ti': p.i + 1, 'tj': p.j + 1, 'td': p.d + 2, 'isnew': 1, 'acc': p.acc}]
        |      END) AS mv
        |      FROM dp p) u
        |    GROUP BY 1, 2, 3, 4, 5, 6, 7) g
        |  JOIN cost ON cost.ta = g.ta AND cost.tb = g.tb
        |    AND cost.i = g.ti AND cost.j = g.tj)
        |SELECT ta AS type_a, tb AS type_b, min(acc) AS dtw_cents,
        |  CAST(min(acc) AS DOUBLE) / 100.0 AS dtw
        |FROM dp WHERE i = na - 1 AND j = nb - 1 AND n = 1
        |GROUP BY 1, 2 ORDER BY 1, 2"""),

    "pagerank_types" -> pagerankOracleSql(5),

    "forecast_eval" -> w(
      """WITH hv AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
        |    CAST(round(sum(value) * 100) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |ser AS (
        |  SELECT event_type, c,
        |    row_number() OVER (PARTITION BY event_type ORDER BY h) - 1 AS p
        |  FROM hv),
        |tr AS (SELECT * FROM ser WHERE p < 120),
        |fit AS (
        |  SELECT event_type, count(*) AS n, sum(p) AS sx, sum(c) AS sy,
        |    sum(p * c) AS sxy, sum(p * p) AS sxx
        |  FROM tr GROUP BY 1),
        |f2 AS (
        |  SELECT event_type, n, sx, sy,
        |    (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope
        |  FROM fit),
        |f3 AS (SELECT event_type, slope,
        |    (sy - slope * sx) / n AS intercept FROM f2),
        |naive AS (
        |  SELECT event_type,
        |    CAST(sum(abs(c - pc)) AS DOUBLE) / count(*) AS naive_mae
        |  FROM (SELECT event_type, c,
        |      lag(c) OVER (PARTITION BY event_type ORDER BY p) AS pc
        |    FROM tr)
        |  WHERE pc IS NOT NULL GROUP BY 1),
        |ev AS (
        |  SELECT s.event_type, s.c, f.intercept + f.slope * s.p AS yhat
        |  FROM ser s JOIN f3 f USING (event_type)
        |  WHERE s.p >= 120 AND s.p < 144),
        |m AS (
        |  SELECT event_type, count(*) AS n_eval,
        |    sum(abs(c - yhat)) / count(*) AS mae,
        |    sum(2.0 * abs(c - yhat) / (abs(c) + abs(yhat))) / count(*)
        |      AS smape
        |  FROM ev GROUP BY 1)
        |SELECT m.event_type, n_eval, round(mae / 100.0, 4) AS mae,
        |  round(smape, 4) AS smape, round(mae / naive_mae, 4) AS mase
        |FROM m JOIN naive USING (event_type) ORDER BY 1"""),

    "theil_sen" -> w(
      """WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(round(sum(value) * 100) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |x AS (SELECT event_type,
        |    CAST(day - DATE '1970-01-01' AS BIGINT) AS x, c FROM d),
        |p AS (SELECT a.event_type,
        |    CAST(b.c - a.c AS DOUBLE) / (b.x - a.x) AS slope
        |  FROM x a JOIN x b ON a.event_type = b.event_type AND a.x < b.x)
        |SELECT event_type, count(*) AS n_pairs,
        |  round(quantile_cont(slope, 0.5) / 100.0, 4) AS slope
        |FROM p GROUP BY 1 ORDER BY 1""")
  )

  /** Shared unrolled power-iteration CTE block: given an `e(src, dst,
    * w)` edge CTE already in scope, appends nodes/nn/ow/r0 and `iters`
    * chained (dangling, incoming, rank) CTE triples ending at
    * `r$iters`. Constants are spelled `(1.0 - 0.85)` / `0.85` so both
    * engines run the same IEEE ops (see GraphOps). Reused by every
    * PageRank-family oracle (session graph, TextRank).
    */
  private[queries] def pagerankIterCtes(iters: Int): String = {
    val steps = (1 to iters).map { k =>
      s"""d$k AS (SELECT coalesce(sum(r), 0.0) AS dm FROM r${k - 1}
        |  WHERE node NOT IN (SELECT src FROM ow)),
        |i$k AS (SELECT e.dst AS node, sum(r.r * e.w / ow.wout) AS s
        |  FROM e JOIN r${k - 1} r ON e.src = r.node
        |  JOIN ow ON e.src = ow.src GROUP BY 1),
        |r$k AS (SELECT n.node,
        |  (1.0 - 0.85) / nn.n + 0.85 * (coalesce(i.s, 0.0) + dd.dm / nn.n) AS r
        |  FROM nodes n CROSS JOIN nn CROSS JOIN d$k dd
        |  LEFT JOIN i$k i ON n.node = i.node)""".stripMargin
    }.mkString(",\n")
    s"""nodes AS MATERIALIZED (
      |  SELECT DISTINCT src AS node FROM e UNION SELECT DISTINCT dst FROM e
      |), nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
      |ow AS MATERIALIZED (SELECT src, sum(w) AS wout FROM e GROUP BY 1),
      |r0 AS (SELECT node, 1.0 / nn.n AS r FROM nodes CROSS JOIN nn),
      |$steps""".stripMargin
  }

  /** pagerank_types oracle: the session-transition edge build (the
    * markov_transitions CTE chain) + the shared iteration block.
    */
  private def pagerankOracleSql(iters: Int): String = {
    s"""WITH g AS (
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
      |), e AS MATERIALIZED (
      |  SELECT from_type AS src, to_type AS dst, CAST(count(*) AS DOUBLE) AS w
      |  FROM tr WHERE to_type IS NOT NULL GROUP BY 1, 2
      |), ${pagerankIterCtes(iters)}
      |SELECT node, round(r, 4) AS rank FROM r$iters ORDER BY node""".stripMargin
  }
}
