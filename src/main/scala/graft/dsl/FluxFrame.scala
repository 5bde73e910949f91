package graft.dsl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fluent Flux-verb surface over a DataFrame (SURVEY.md §2B).
  *
  * A Flux stream of tables ≙ one DataFrame + a group key (the columns
  * that partition it into tables). Each verb is pure plan construction —
  * `parse→analyze→optimize→execute` is Catalyst's own lifecycle
  * (SURVEY.md §3 E3): verbs compose Column expressions, Catalyst pushes
  * filters/projections into the Parquet scan and plans the exchanges.
  *
  * Conventions: `timeCol` is the event-time column (TimestampType),
  * `valueCol` the analyzed value, `groupKey` the current grouping
  * (Flux: series key by default, rewired by `group()`).
  *
  * Scale notes (100 TB discipline):
  *  - per-group verbs compile to window specs partitioned by the group
  *    key — Spark shuffles once per distinct partitioning and reuses it
  *    across consecutive window verbs (same WindowSpec ⇒ same Exchange).
  *  - aggregations use partial (map-side) aggregation automatically.
  *  - nothing here collects to the driver; `yield`/format are the only
  *    materialization points and are caller-controlled.
  */
final case class FluxFrame(
    df: DataFrame,
    groupKey: Seq[String],
    timeCol: String = "_time",
    valueCol: String = "_value"
) {

  private def keyCols: Seq[Column] = groupKey.map(col)
  private def w = {
    val base = if (groupKey.isEmpty) Window.partitionBy() else Window.partitionBy(keyCols: _*)
    base.orderBy(col(timeCol))
  }
  private def rows(lo: Long, hi: Long) = w.rowsBetween(lo, hi)

  // ---------------- projection / filter (Flux: range, filter, keep, drop,
  // rename, duplicate, map, set) ----------------

  /** Flux `range(start:, stop:)` — half-open [start, stop). First verb
    * after `from`. On store-backed frames (which carry the `dt`
    * partition column) the equivalent date bounds are added explicitly:
    * Spark prunes `dt=` directories only on predicates over the
    * partition column itself — it does not infer them from the `time`
    * filter (the time filter still pushes to parquet row-group stats).
    */
  def range(start: java.sql.Timestamp, stop: java.sql.Timestamp): FluxFrame =
    rangeImpl(lit(start), lit(stop))

  def range(start: String, stop: String): FluxFrame =
    rangeImpl(to_timestamp(lit(start)), to_timestamp(lit(stop)))

  private def rangeImpl(start: Column, stop: Column): FluxFrame = {
    val time = col(timeCol) >= start && col(timeCol) < stop
    var pred =
      if (df.columns.contains("dt"))
        time && col("dt") >= to_date(start) && col("dt") <= to_date(stop)
      else time
    // equivalent ns bounds on time_ns: dt and time_ns sit in the LWW
    // window's partitionBy, so THESE predicates push through the dedup
    // window to the scan (row-group stats + partition pruning) even on
    // an uncompacted bucket — the µs `time` filter alone stops at the
    // Window operator. Negative-epoch bounds skip the push (µs
    // truncation direction differs pre-1970); the guard constant-folds
    // away for normal queries, keeping the pushdown.
    if (df.columns.contains("time_ns")) {
      val startUs = unix_micros(start)
      val stopUs = unix_micros(stop)
      pred = pred &&
        (startUs < 0 || col("time_ns") >= startUs * 1000L) &&
        (stopUs < 0 || col("time_ns") < stopUs * 1000L)
    }
    copy(df = df.filter(pred))
  }

  /** Flux `filter(fn:)` — row predicate. */
  def where(pred: Column): FluxFrame = copy(df = df.filter(pred))

  /** Flux `hourSelection(start:, stop:)`: keep rows whose UTC hour of
    * day lies in [start, stop] inclusive; `start > stop` wraps past
    * midnight (22→2 keeps 22,23,0,1,2). Pure row predicate — pushes to
    * the scan like any filter.
    */
  def hourSelection(start: Int, stop: Int): FluxFrame = {
    require(start >= 0 && start <= 23 && stop >= 0 && stop <= 23,
      s"hourSelection hours must be in [0, 23], got ($start, $stop)")
    val h = hour(col(timeCol))
    copy(df = df.filter(
      if (start <= stop) h >= start && h <= stop
      else h >= start || h <= stop))
  }

  /** Flux `keep(columns:)`. Group key is intersected like Flux does. */
  def keep(cols: String*): FluxFrame =
    copy(df = df.select(cols.map(col): _*), groupKey = groupKey.filter(cols.contains))

  /** Flux `drop(columns:)`. */
  def dropCols(cols: String*): FluxFrame =
    copy(df = df.drop(cols: _*), groupKey = groupKey.filterNot(cols.contains))

  /** Flux `rename(columns: {old: new})`. */
  def rename(pairs: (String, String)*): FluxFrame = {
    val renamed = pairs.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) }
    val gk = groupKey.map(k => pairs.toMap.getOrElse(k, k))
    val tc = pairs.toMap.getOrElse(timeCol, timeCol)
    val vc = pairs.toMap.getOrElse(valueCol, valueCol)
    FluxFrame(renamed, gk, tc, vc)
  }

  /** Flux `duplicate(column:, as:)`. */
  def duplicate(column: String, as: String): FluxFrame =
    copy(df = df.withColumn(as, col(column)))

  /** Flux `map(fn:)` — computed column(s); Column-expression form keeps
    * whole-stage codegen (SURVEY.md §2B: translate, don't close over).
    */
  def mapValue(f: Column => Column): FluxFrame =
    copy(df = df.withColumn(valueCol, f(col(valueCol))))

  def withCol(name: String, c: Column): FluxFrame = copy(df = df.withColumn(name, c))

  /** Flux `set(key:, value:)`. */
  def set(key: String, value: String): FluxFrame = copy(df = df.withColumn(key, lit(value)))

  // ---------------- grouping & aggregates ----------------

  /** Flux `group(columns:, mode:"by")`. */
  def group(cols: String*): FluxFrame = copy(groupKey = cols)

  /** Flux `group(columns:, mode:"except")`. */
  def groupExcept(cols: String*): FluxFrame =
    copy(groupKey = df.columns.toSeq.filterNot(c => cols.contains(c) || c == timeCol || c == valueCol))

  /** Generic per-group aggregate: one output row per group. */
  def agg(exprs: Column*): DataFrame =
    if (groupKey.isEmpty) df.agg(exprs.head, exprs.tail: _*)
    else df.groupBy(keyCols: _*).agg(exprs.head, exprs.tail: _*)

  private def agg1(e: Column, as: String): FluxFrame =
    FluxFrame(agg(e.as(as)), groupKey, timeCol, as)

  def countRows(as: String = "_value"): FluxFrame = agg1(count(col(valueCol)), as)
  def sumV(as: String = "_value"): FluxFrame = agg1(sum(col(valueCol)), as)
  def meanV(as: String = "_value"): FluxFrame = agg1(avg(col(valueCol)), as)
  def minV(as: String = "_value"): FluxFrame = agg1(min(col(valueCol)), as)
  def maxV(as: String = "_value"): FluxFrame = agg1(max(col(valueCol)), as)
  def stddevV(as: String = "_value"): FluxFrame = agg1(stddev_samp(col(valueCol)), as)
  def medianV(as: String = "_value"): FluxFrame = agg1(percentile(col(valueCol), lit(0.5)), as)
  def modeV(as: String = "_value"): FluxFrame = agg1(mode(col(valueCol)), as)

  /** Flux `spread()` = max - min. */
  def spread(as: String = "_value"): FluxFrame = agg1(max(col(valueCol)) - min(col(valueCol)), as)

  /** Flux `quantile(q:, method:"exact_mean"/"estimate_tdigest")`.
    * exact → Spark `percentile` (linear interpolation, matches Flux's
    * exact_mean for continuous data); estimate → the engine's own
    * mergeable KLL sketch (functions/KllSketch.scala, InfluxDB's
    * t-digest analogue): O(k·log n) state per group, sketch-only
    * shuffle traffic — the quantile path that survives 100 TB groups.
    */
  def quantile(q: Double, exact: Boolean = true, as: String = "_value"): FluxFrame =
    agg1(
      if (exact) percentile(col(valueCol), lit(q))
      else element_at(call_function("graft_kll_quantiles",
        col(valueCol), array(lit(q)), lit(1024)), 1),
      as)

  /** Flux `first()` / `last()` — selectors: earliest/latest value by time
    * per group. min_by/max_by are single-pass partial aggregates (no
    * window, no second shuffle). The ordering key is struct(time,
    * value) so duplicate timestamps resolve to the smallest/largest
    * VALUE deterministically under any partitioning (Flux resolves by
    * table order — unreproducible after a shuffle; documented
    * divergence, r14 ADVICE).
    */
  def firstV(as: String = "_value"): FluxFrame =
    agg1(min_by(col(valueCol), struct(col(timeCol), col(valueCol))), as)
  def lastV(as: String = "_value"): FluxFrame =
    agg1(max_by(col(valueCol), struct(col(timeCol), col(valueCol))), as)

  /** Flux `distinct(column:)`. */
  def distinctV(column: String = ""): DataFrame = {
    val c = if (column.isEmpty) valueCol else column
    df.select((groupKey :+ c).map(col): _*).distinct()
  }

  /** Flux `unique(column:)` — rows whose column value occurs exactly once
    * within the group.
    */
  def unique(column: String = ""): FluxFrame = {
    val c = if (column.isEmpty) valueCol else column
    val cw = if (groupKey.isEmpty) Window.partitionBy(col(c)) else Window.partitionBy((keyCols :+ col(c)): _*)
    copy(df = df.withColumn("_cnt", count(lit(1)).over(cw)).filter(col("_cnt") === 1).drop("_cnt"))
  }

  /** Flux `integral(unit:)` — trapezoidal integral of value over time.
    * Window algebra: lag pairs → trapezoid areas → sum (SURVEY.md §2B).
    */
  def integral(unitSeconds: Double, as: String = "_value"): FluxFrame = {
    val tSec = col(timeCol).cast("double")
    val prevT = lag(tSec, 1).over(w)
    val prevV = lag(col(valueCol), 1).over(w)
    val area = (col(valueCol) + prevV) / 2 * (tSec - prevT) / lit(unitSeconds)
    val staged = df.withColumn("_area", area)
    FluxFrame(staged, groupKey, timeCol, "_area").agg1(sum(col("_area")), as)
  }

  /** Flux `timeWeightedAvg(unit:)` — the trapezoid integral divided by
    * the group's elapsed time, both in `unit`: the average that
    * irregular sampling can't bias. Same single-window + single-agg
    * shape as integral (the unit cancels; kept for expression parity
    * with the Flux signature).
    */
  def timeWeightedAvg(unitSeconds: Double, as: String = "_value"): FluxFrame = {
    val tSec = col(timeCol).cast("double")
    val prevT = lag(tSec, 1).over(w)
    val prevV = lag(col(valueCol), 1).over(w)
    val area = (col(valueCol) + prevV) / 2 * (tSec - prevT) / lit(unitSeconds)
    val staged = df.withColumn("_area", area).withColumn("_tsec", tSec)
    FluxFrame(staged, groupKey, timeCol, "_area").agg1(
      sum(col("_area")) / ((max(col("_tsec")) - min(col("_tsec"))) / lit(unitSeconds)), as)
  }

  /** Flux `covariance(columns:)` / `pearsonr()`. */
  def covariance(x: String, y: String, as: String = "_value"): FluxFrame = agg1(covar_samp(col(x), col(y)), as)
  def pearsonr(x: String, y: String, as: String = "_value"): FluxFrame = agg1(corr(col(x), col(y)), as)

  /** Flux `histogram(bins:)` — cumulative counts per upper bound. */
  def histogram(bins: Seq[Double], leCol: String = "le", countCol: String = "_value"): DataFrame = {
    val binDf = df.sparkSession.createDataFrame(bins.map(Tuple1(_))).toDF(leCol)
    val joined = df.crossJoin(broadcast(binDf)).filter(col(valueCol) <= col(leCol))
    val g = (groupKey :+ leCol).map(col)
    joined.groupBy(g: _*).agg(count(lit(1)).as(countCol))
  }

  /** Flux `histogramQuantile(quantile:)` — inverse linear interpolation
    * over cumulative bin counts. Pure window algebra over the (small)
    * histogram frame.
    */
  def histogramQuantile(q: Double, leCol: String = "le", countCol: String = "_value", as: String = "_value"): DataFrame = {
    val pw = (if (groupKey.isEmpty) Window.partitionBy() else Window.partitionBy(keyCols: _*)).orderBy(col(leCol))
    val total = (if (groupKey.isEmpty) Window.partitionBy() else Window.partitionBy(keyCols: _*))
      .orderBy(col(leCol)).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val staged = df
      .withColumn("_tot", max(col(countCol)).over(total))
      .withColumn("_target", col("_tot") * q)
      .withColumn("_prevCount", coalesce(lag(col(countCol), 1).over(pw), lit(0.0)))
      .withColumn("_prevLe", coalesce(lag(col(leCol), 1).over(pw), lit(0.0)))
    val hit = staged.filter(col(countCol) >= col("_target") && col("_prevCount") < col("_target"))
    val interp = col("_prevLe") +
      (col(leCol) - col("_prevLe")) * (col("_target") - col("_prevCount")) / (col(countCol) - col("_prevCount"))
    hit.select((keyCols :+ interp.as(as)): _*)
  }

  // ---------------- time windowing ----------------

  /** Flux `window(every:, period:, offset:)` → adds `_start`/`_stop` and
    * extends the group key, exactly Spark's `window()` semantics.
    */
  def window(every: String, period: String = null, offset: String = "0 seconds"): FluxFrame = {
    val p = if (period == null) every else period
    val win = org.apache.spark.sql.functions.window(col(timeCol), p, every,
      FluxFrame.normalizeOffset(offset, every))
    copy(
      df = df.withColumn("_w", win)
        .withColumn("_start", col("_w.start")).withColumn("_stop", col("_w.end")).drop("_w"),
      groupKey = groupKey :+ "_start" :+ "_stop")
  }

  /** Flux `aggregateWindow(every:, fn:, createEmpty:, offset:,
    * location:)` — downsample. Tumbling window + aggregate;
    * `createEmpty=true` left-joins a generated window spine
    * (sequence+explode — distributed, no driver loop) so empty windows
    * emit nulls like Flux does. `offset` shifts the window grid;
    * `location` buckets on that timezone's wall clock (Flux
    * `timezone.location(name:)`): times convert into the zone, window,
    * and the bucket labels convert back to UTC instants — the same
    * from/to_utc_timestamp pair as the InfluxQL `tz()` path.
    */
  def aggregateWindow(
      every: String,
      fn: Column => Column,
      createEmpty: Boolean = false,
      as: String = "_value",
      offset: String = "0 seconds",
      location: String = null
  ): FluxFrame = {
    def toLocal(c: Column) =
      if (location == null) c else from_utc_timestamp(c, location)
    def toUtc(c: Column) =
      if (location == null) c else to_utc_timestamp(c, location)
    // Calendar windows (`every: 1mo`/`1y`, surfaced as "N months"):
    // months have no fixed width, so Spark's time window() rejects
    // them. Bucket by epoch-aligned month arithmetic instead — the
    // same alignment as the task scheduler's calendar cadences (3mo ⇒
    // Jan/Apr/Jul/Oct): monthsSince1970 floor-div n picks the bucket,
    // make_date rebuilds its boundary, and the label stays Flux's
    // `_stop` (window end). Pure Column arithmetic — the groupBy
    // shuffles exactly like the fixed-width path.
    every match {
      case FluxFrame.MonthsEvery(nStr) =>
        val n = nStr.toInt
        require(offset == "0 seconds",
          "offset is not supported with calendar windows (mo/y)")
        require(!createEmpty,
          "createEmpty is not supported with calendar windows (mo/y)")
        val t = toLocal(col(timeCol))
        val ms = year(t) * lit(12) + month(t) - lit(1) - lit(1970 * 12)
        val k = floor(ms.cast("double") / n).cast("int") * n
        def lbl(km: Column) = to_timestamp(make_date(
          lit(1970) + floor(km.cast("double") / 12).cast("int"),
          pmod(km, lit(12)) + 1, lit(1)))
        val agged = df.groupBy((keyCols :+ lbl(k + n).as("_wend")): _*)
          .agg(fn(col(valueCol)).as(as))
          .withColumn(timeCol, toUtc(col("_wend")))
          .drop("_wend")
        FluxFrame(agged, groupKey, timeCol, as)
      case _ => aggregateWindowFixed(every, fn, createEmpty, as, offset, toLocal, toUtc)
    }
  }

  private def aggregateWindowFixed(
      every: String,
      fn: Column => Column,
      createEmpty: Boolean,
      as: String,
      offset0: String,
      toLocal: Column => Column,
      toUtc: Column => Column
  ): FluxFrame = {
    // Flux windows TILE, so any offset is equivalent to offset mod
    // every (and Spark's window() hard-requires |start| < slide —
    // `every: 1h, offset: 1h` threw instead of being the identity
    // grid; metamorphic P2 caught it)
    val offset = FluxFrame.normalizeOffset(offset0, every)
    val win = org.apache.spark.sql.functions.window(
      toLocal(col(timeCol)), every, every, offset)
    val aggCols = (keyCols :+ win.as("_w"))
    val agged = df.groupBy(aggCols: _*)
      .agg(fn(col(valueCol)).as(as))
      .withColumn(timeCol, toUtc(col("_w.end"))) // Flux: timeDst = _stop
      .drop("_w")
    val out =
      if (!createEmpty) agged
      else {
        // spine: every window between global min/max per group key
        // combo, stepped on the (possibly local-wall-clock) grid and
        // converted back to UTC instants to join the aggregate
        val everyExpr = expr(s"INTERVAL $every")
        def wEnd(c: Column) = org.apache.spark.sql.functions
          .window(toLocal(c), every, every, offset).getField("end")
        val bounds = df.groupBy(keyCols: _*)
          .agg(min(col(timeCol)).as("_lo"), max(col(timeCol)).as("_hi"))
        val spine = bounds
          .withColumn("_wlo", wEnd(col("_lo")))
          .withColumn("_whi", wEnd(col("_hi")))
          .withColumn(timeCol, toUtc(explode(sequence(col("_wlo"), col("_whi"), everyExpr))))
          .select((keyCols :+ col(timeCol)): _*)
        spine.join(agged, groupKey :+ timeCol, "left")
      }
    FluxFrame(out, groupKey, timeCol, as)
  }

  // ---------------- sorting / limits / top-k ----------------

  /** Flux `sort(columns:, desc:)` — global sort (Flux sorts within
    * tables; for a keyed frame use the window verbs which order
    * internally). Kept for final, `limit`ed output only (100 TB: a global
    * sort is a last-stage operation).
    */
  def sort(cols: Column*): FluxFrame = copy(df = df.orderBy(cols: _*))

  /** Flux `limit(n:, offset:)` — first n rows per group by time. */
  def limitPerGroup(n: Int, offset: Int = 0): FluxFrame = perGroupRank(col(timeCol).asc, n, offset)

  /** Flux `tail(n:)` — last n rows per group by time. */
  def tail(n: Int): FluxFrame = perGroupRank(col(timeCol).desc, n, 0)

  /** Flux `top(n:)` / `bottom(n:)` — n largest/smallest by value per
    * group. Runs on the engine's own [[graft.plans.TopKPerGroup]]
    * physical operator (bounded per-group heaps — no partition sort,
    * no spill surface), with the µs time as the tie-break so results
    * are bit-identical to the historical row_number formulation.
    */
  def top(n: Int, by: String = ""): FluxFrame =
    topKNative(if (by.isEmpty) valueCol else by, n, desc = true)
  def bottom(n: Int, by: String = ""): FluxFrame =
    topKNative(if (by.isEmpty) valueCol else by, n, desc = false)

  private def topKNative(orderCol: String, n: Int, desc: Boolean): FluxFrame = {
    val tie = df.schema(timeCol).dataType match {
      case org.apache.spark.sql.types.LongType => col(timeCol)
      case _ => unix_micros(col(timeCol).cast("timestamp"))
    }
    val out = graft.plans.TopKPerGroup(
        df.withColumn("_tie", tie), groupKey, orderCol, "_tie", n,
        desc = desc, rankName = "_graft_rank")
      .drop("_tie", "_graft_rank")
    copy(df = out)
  }

  private def perGroupRank(order: Column, n: Int, offset: Int): FluxFrame = {
    // Tie-break on time then all key cols for determinism under shuffle.
    val pw = (if (groupKey.isEmpty) Window.partitionBy() else Window.partitionBy(keyCols: _*))
      .orderBy(order, col(timeCol))
    copy(df = df.withColumn("_rank", row_number().over(pw))
      .filter(col("_rank") > offset && col("_rank") <= offset + n)
      .drop("_rank"))
  }

  /** Flux `sample(n:, pos:)` — every n-th row per group (by time order). */
  def sample(n: Int, pos: Int = 0): FluxFrame =
    copy(df = df.withColumn("_rn", row_number().over(w))
      .filter(((col("_rn") - 1 - pos) % n) === 0 && col("_rn") > pos)
      .drop("_rn"))

  /** Flux `highestMax/highestAverage/highestCurrent(n:)` (+ lowest*):
    * rank whole series by a per-series reduction, keep top n series.
    * Two-phase: tiny per-series agg → top-n (broadcastable) → semi-join
    * back, so the big frame is only scanned once (SURVEY.md §2B).
    */
  def highest(n: Int, reduce: Column => Column, lowest: Boolean = false): FluxFrame = {
    val perSeries = df.groupBy(keyCols: _*).agg(reduce(col(valueCol)).as("_score"))
    // orderBy+limit compiles to TakeOrderedAndProject: each partition
    // keeps its local top-n and the driver merges n·p rows — no global
    // window moving every series row to a single partition.
    val ord = (if (lowest) col("_score").asc else col("_score").desc) +: keyCols
    val ranked = perSeries.orderBy(ord: _*).limit(n).select(keyCols: _*)
    copy(df = df.join(broadcast(ranked), groupKey, "left_semi"))
  }

  def highestMax(n: Int): FluxFrame = highest(n, max)
  def highestAverage(n: Int): FluxFrame = highest(n, avg)
  def lowestMin(n: Int): FluxFrame = highest(n, min, lowest = true)
  def lowestAverage(n: Int): FluxFrame = highest(n, avg, lowest = true)
  def highestCurrent(n: Int): FluxFrame =
    highest(n, v => max_by(v, struct(col(timeCol), v)))
  def lowestCurrent(n: Int): FluxFrame =
    highest(n, v => max_by(v, struct(col(timeCol), v)), lowest = true)

  // ---------------- joins / set ops / pivot ----------------

  /** Flux `join(tables:, on:)` — inner equi-join; Catalyst picks
    * broadcast vs shuffle by stats/AQE.
    */
  def joinOn(other: FluxFrame, on: Seq[String], how: String = "inner"): FluxFrame =
    copy(df = df.join(other.df, on, how))

  /** Flux `union(tables:)` — bag union, schema merged by name. */
  def union(other: FluxFrame): FluxFrame =
    copy(df = df.unionByName(other.df, allowMissingColumns = true))

  /** As-of join (SURVEY §2B optional extension; the time-series join
    * Spark lacks natively): each left row picks up the LATEST right row
    * with `right.time <= left.time` within the same `on` key.
    *
    * Shape: union the two sides, one window pass with
    * last-ignore-nulls — never a per-row range join, so it scales as a
    * single shuffle on (on-key) + in-partition sort, and skew follows
    * the key distribution exactly like any keyed window.
    *
    * @param rightCols columns of `other` to carry (null until the first
    *   right row at or before the left row's time)
    */
  def asofJoin(other: FluxFrame, on: Seq[String], rightCols: Seq[String]): FluxFrame = {
    val leftSide = df
      .withColumn("_src", lit(1))
      .withColumn("_rv", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          rightCols.map(c => org.apache.spark.sql.types.StructField(c,
            other.df.schema(c).dataType)))))
    val rightSide = other.df
      .select((on.map(col) :+ col(other.timeCol).cast(df.schema(timeCol).dataType).as(timeCol) :+
        struct(rightCols.map(col): _*).as("_rv")): _*)
      .withColumn("_src", lit(0))
    val unioned = leftSide.unionByName(rightSide, allowMissingColumns = true)
    // right rows sort before left rows at equal time → inclusive <=
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col(timeCol), col("_src"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = unioned
      .withColumn("_rvf", last(when(col("_src") === 0, col("_rv")), ignoreNulls = true).over(w))
      .filter(col("_src") === 1)
    val projected = rightCols.foldLeft(filled)((d, c) => d.withColumn(c, col(s"_rvf.$c")))
      .drop("_src", "_rv", "_rvf")
    copy(df = projected)
  }

  /** Flux `pivot(rowKey:, columnKey:, valueColumn:)` /
    * `schema.fieldsAsCols()` — long→wide. Callers pass the distinct
    * column-key values when known (skips the extra distinct scan Spark
    * otherwise runs).
    */
  def pivot(rowKey: Seq[String], columnKey: String, values: Seq[String] = Nil): DataFrame = {
    val g = df.groupBy(rowKey.map(col): _*)
    val p = if (values.nonEmpty) g.pivot(columnKey, values) else g.pivot(columnKey)
    p.agg(first(col(valueCol), ignoreNulls = true))
  }

  // ---------------- per-series transforms (window-function shaped;
  // all partition by group key, order by time — one shuffle, reused) ----

  /** Flux `derivative(unit:, nonNegative:)` — rate of change per `unit`;
    * first row of each series dropped (no predecessor); with
    * `nonNegative` a negative rate yields null (counter reset).
    */
  def derivative(unitSeconds: Double, nonNegative: Boolean = false, as: String = "_value"): FluxFrame = {
    val prev = lag(col(valueCol), 1).over(w)
    val dt = col(timeCol).cast("double") - lag(col(timeCol).cast("double"), 1).over(w)
    val d = (col(valueCol) - prev) / (dt / lit(unitSeconds))
    val res = if (nonNegative) when(d < 0, null).otherwise(d) else d
    val staged = df.withColumn("_prev", prev).withColumn(as, res)
    FluxFrame(staged.filter(col("_prev").isNotNull).drop("_prev"), groupKey, timeCol, as)
  }

  /** Flux `difference(nonNegative:, keepFirst:)`. */
  def difference(nonNegative: Boolean = false, keepFirst: Boolean = false, as: String = "_value"): FluxFrame = {
    val prev = lag(col(valueCol), 1).over(w)
    val d0 = col(valueCol) - prev
    val d = if (nonNegative) when(d0 < 0, null).otherwise(d0) else d0
    val staged = df.withColumn("_prev", prev).withColumn(as, d)
    val out = if (keepFirst) staged.drop("_prev")
              else staged.filter(col("_prev").isNotNull).drop("_prev")
    FluxFrame(out, groupKey, timeCol, as)
  }

  /** Flux `increase()` — running sum of positive deltas (counter resets
    * forgiven), emitted per row like Flux does.
    */
  def increase(as: String = "_value"): FluxFrame = {
    val d = col(valueCol) - lag(col(valueCol), 1).over(w)
    val pos = when(d > 0, d).otherwise(lit(0.0))
    val run = sum(pos).over(rows(Window.unboundedPreceding, 0))
    FluxFrame(df.withColumn(as, coalesce(run, lit(0.0))), groupKey, timeCol, as)
  }

  /** Flux `cumulativeSum()`. */
  def cumulativeSum(as: String = "_value"): FluxFrame =
    FluxFrame(df.withColumn(as, sum(col(valueCol)).over(rows(Window.unboundedPreceding, 0))),
      groupKey, timeCol, as)

  /** Flux `movingAverage(n:)` — emitted from the n-th row on. */
  def movingAverage(n: Int, as: String = "_value"): FluxFrame =
    if (groupKey.isEmpty) {
      // an unkeyed series needs only n−1 boundary rows per partition —
      // distribute instead of one global window task
      val out = SeriesScan.ungroupedMovingAvg(df, timeCol, valueCol, n, "_ma_out",
        requireAllNonNull = false, df.sparkSession.sparkContext.defaultParallelism)
      FluxFrame(out.withColumn(as, col("_ma_out")).drop("_ma_out"), groupKey, timeCol, as)
    } else {
      val ma = avg(col(valueCol)).over(rows(-(n - 1), 0))
      val cnt = count(lit(1)).over(rows(-(n - 1), 0))
      FluxFrame(df.withColumn(as, ma).withColumn("_n", cnt).filter(col("_n") === n).drop("_n"),
        groupKey, timeCol, as)
    }

  /** Flux `timedMovingAverage(every:, period:)` — time-range window. */
  def timedMovingAverage(periodSeconds: Long, as: String = "_value"): FluxFrame = {
    val rw = (if (groupKey.isEmpty) Window.partitionBy() else Window.partitionBy(keyCols: _*))
      .orderBy(col(timeCol).cast("long"))
      .rangeBetween(-(periodSeconds - 1), 0)
    FluxFrame(df.withColumn(as, avg(col(valueCol)).over(rw)), groupKey, timeCol, as)
  }

  /** Flux `timeShift(duration:)`. */
  def timeShift(interval: String): FluxFrame =
    copy(df = df.withColumn(timeCol, col(timeCol) + expr(s"INTERVAL $interval")))

  /** Flux `fill(value:)` / `fill(usePrevious: true)`. */
  def fill(value: Double): FluxFrame =
    copy(df = df.withColumn(valueCol, coalesce(col(valueCol), lit(value))))

  def fillPrevious(): FluxFrame =
    copy(df = df.withColumn(valueCol,
      coalesce(col(valueCol), last(col(valueCol), ignoreNulls = true).over(rows(Window.unboundedPreceding, 0)))))

  /** Flux `elapsed(unit:)` — Δt to previous row, first row dropped. */
  def elapsed(unitSeconds: Double = 1.0, as: String = "elapsed"): FluxFrame = {
    val dt = (col(timeCol).cast("double") - lag(col(timeCol).cast("double"), 1).over(w)) / lit(unitSeconds)
    copy(df = df.withColumn(as, dt).filter(col(as).isNotNull))
  }

  /** `events.duration(unit:, stopColumn/stop:)` (InfluxDB contrib
    * events package): Δt to the NEXT row per series — how long the
    * state that this row began stayed current. The final row of each
    * series, having no successor, closes at `stop` (the query range
    * end; the contrib default of now() is caller-supplied here for
    * determinism). Same one-shuffle window algebra as elapsed, lead
    * instead of lag.
    */
  def eventDuration(stop: Column, unitSeconds: Double = 1.0,
                    as: String = "duration"): FluxFrame = {
    val nxt = lead(col(timeCol).cast("double"), 1).over(w)
    val dur = (coalesce(nxt, stop.cast("double")) - col(timeCol).cast("double")) / lit(unitSeconds)
    copy(df = df.withColumn(as, dur))
  }

  /** Flux `stateCount(fn:)` — 1-based running count while predicate
    * holds, -1 otherwise. Reset-group trick: cumsum of !pred makes a
    * stable id per true-run (SURVEY.md §2B; pure window algebra).
    */
  def stateCount(pred: Column, as: String = "stateCount"): FluxFrame = {
    val resetId = sum(when(pred, 0).otherwise(1)).over(rows(Window.unboundedPreceding, 0))
    val staged = df.withColumn("_rst", resetId)
    val rw = (if (groupKey.isEmpty) Window.partitionBy(col("_rst")) else Window.partitionBy((keyCols :+ col("_rst")): _*))
      .orderBy(col(timeCol)).rowsBetween(Window.unboundedPreceding, 0)
    val cnt = sum(when(pred, 1).otherwise(0)).over(rw)
    copy(df = staged.withColumn(as, when(pred, cnt).otherwise(lit(-1))).drop("_rst"))
  }

  /** Flux `stateDuration(fn:, unit:)` — seconds in current true-run,
    * 0 at run start, -1 when predicate false.
    */
  def stateDuration(pred: Column, unitSeconds: Double = 1.0, as: String = "stateDuration"): FluxFrame = {
    val resetId = sum(when(pred, 0).otherwise(1)).over(rows(Window.unboundedPreceding, 0))
    val staged = df.withColumn("_rst", resetId)
    val rw = (if (groupKey.isEmpty) Window.partitionBy(col("_rst")) else Window.partitionBy((keyCols :+ col("_rst")): _*))
      .orderBy(col(timeCol)).rowsBetween(Window.unboundedPreceding, 0)
    val runStart = min(when(pred, col(timeCol))).over(rw)
    val dur = (col(timeCol).cast("double") - runStart.cast("double")) / lit(unitSeconds)
    copy(df = staged.withColumn(as, when(pred, dur).otherwise(lit(-1.0))).drop("_rst"))
  }

  /** InfluxDB 2.x `monitor.check(crit:, warn:, info:, ok:)` [engine
    * 2.0.9: the stdlib check the reference's telemetry-health use case
    * runs, README.md:292-297]: each row is classified into the FIRST
    * matching level — crit, warn, info, then ok — producing v2's status
    * schema: `_level`, `_check_name`, `_type` = "threshold", the
    * original measurement preserved as `_source_measurement`, and
    * `_measurement` rewritten to "statuses" (the monitoring bucket's
    * measurement name). An explicit `ok` predicate that does NOT match
    * yields "unknown", like the stdlib. Pure per-row projection — no
    * shuffle, stays inside whole-stage codegen.
    */
  def monitorCheck(crit: Option[Column], warn: Option[Column],
      info: Option[Column], ok: Option[Column],
      checkName: String): FluxFrame = {
    val base: Column = ok match {
      case Some(c) => when(c, "ok").otherwise("unknown")
      case None => lit("ok")
    }
    val withInfo = info.map(c => when(c, "info").otherwise(base)).getOrElse(base)
    val withWarn = warn.map(c => when(c, "warn").otherwise(withInfo)).getOrElse(withInfo)
    val level = crit.map(c => when(c, "crit").otherwise(withWarn)).getOrElse(withWarn)
    val src = if (df.columns.contains("_measurement")) col("_measurement")
              else lit(null).cast("string")
    copy(df = df
      .withColumn("_level", level)
      .withColumn("_check_name", lit(checkName))
      .withColumn("_type", lit("threshold"))
      .withColumn("_source_measurement", src)
      .withColumn("_measurement", lit("statuses")))
  }

  /** `monitor.stateChanges(fromLevel:, toLevel:)` over check output:
    * keeps the rows whose `_level` DIFFERS from the previous row's in
    * the same series (groupKey order by time), optionally pinned to a
    * specific from/to level ("any" matches every level, the stdlib
    * default for fromLevel). The first row of a series has no previous
    * status and never fires. One keyed window — same shuffle shape as
    * stateCount.
    */
  /** `monitor.deadman(t:)` — the series-liveness check: one row per
    * series (groupKey) carrying its LAST observation time and `dead` =
    * no point at or after `t`. One keyed aggregate; at corpus scale
    * this is the same partial-aggregate shuffle shape as any group
    * count, and the output is series-domain-sized.
    */
  def monitorDeadman(t: Column): FluxFrame = {
    val agged =
      if (groupKey.isEmpty) df.agg(max(col(timeCol)).as(timeCol))
      else df.groupBy(keyCols: _*).agg(max(col(timeCol)).as(timeCol))
    copy(df = agged.withColumn("dead", col(timeCol) < t))
  }

  def monitorStateChanges(fromLevel: String = "any",
      toLevel: String = "any"): FluxFrame = {
    val prev = lag(col("_level"), 1).over(w)
    val base = prev.isNotNull && col("_level") =!= prev
    val fromOk = if (fromLevel == "any") base else base && prev === lit(fromLevel)
    val toOk = if (toLevel == "any") fromOk else fromOk && col("_level") === lit(toLevel)
    copy(df = df.withColumn("_sc", toOk).filter(col("_sc")).drop("_sc"))
  }

  /** Gap-based sessionization (engine extension; the activity-session
    * op every training-data / analytics pipeline needs). A new session
    * starts when Δt to the previous row of the series EXCEEDS maxGap
    * (Δt == maxGap stays in-session); emits a 1-based per-series
    * session index. Pure window algebra: one shuffle on the series key,
    * and a downstream per-(series, session) aggregate reuses that
    * partitioning — grouping on a superset of the window's partition
    * key is already co-located, so Catalyst plans no second exchange.
    * maxGap is in the time column's own unit (seconds for timestamps,
    * ns/µs for long axes — same convention as the delta verbs).
    */
  /** Engine extension: classical additive seasonal decomposition
    * (Kendall & Stuart's moving-average method — the textbook
    * predecessor of STL): `trend` = centered `period`-wide moving
    * average (null at the edges where the window is partial),
    * `seasonal` = per-phase mean of the detrended series (phase =
    * per-series row index mod period), `resid` = value − trend −
    * seasonal. Requires an odd period (7 for day-of-week on daily
    * data) so the centered window is symmetric.
    *
    * Scale shape: one shuffle to co-locate each series (the trend
    * window + row-index share it), then one more keyed on
    * (series, phase) for the seasonal means — both partitioned, no
    * global window. Adds `phase`, `trend`, `seasonal`, `resid`.
    */
  def decompose(period: Int): FluxFrame = {
    require(period >= 3 && period % 2 == 1,
      s"decompose needs an odd period >= 3, got $period")
    val h = period / 2
    val trend = when(count(lit(1)).over(rows(-h, h)) === period,
      avg(col(valueCol)).over(rows(-h, h)))
    val phase = (row_number().over(w) - 1) % period
    val t = df.withColumn("trend", trend).withColumn("phase", phase)
      .withColumn("_detrend", col(valueCol) - col("trend"))
    val ws = Window.partitionBy((groupKey :+ "phase").map(col): _*)
    val out = t.withColumn("seasonal", avg(col("_detrend")).over(ws))
      .withColumn("resid", col(valueCol) - col("trend") - col("seasonal"))
      .drop("_detrend")
    copy(df = out)
  }

  /** Engine extension: per-series MAD outlier flags (adds `med`,
    * `abs_dev`, `mad`, `is_anom`) — [[graft.operators.AnomalyOps
    * .madFlags]] on this frame's group key and value column.
    */
  def anomalies(k: Double = 3.0): FluxFrame =
    copy(df = graft.operators.AnomalyOps.madFlags(df, groupKey, valueCol, k))

  /** Engine extension: per-series one-sided CUSUM drift detection
    * (adds `mu`, `sg`, `cusum`, `alarm`) — [[graft.operators
    * .AnomalyOps.cusum]] ordered on this frame's time column.
    */
  def cusum(slackSigmas: Double = 0.5, threshSigmas: Double = 4.0): FluxFrame =
    copy(df = graft.operators.AnomalyOps.cusum(df, groupKey, timeCol,
      valueCol, slackSigmas, threshSigmas))

  /** Engine extension: per-series winsorization to the [lo, hi]
    * quantile band (adds `p_lo`, `p_hi`, `clamped`) — [[graft
    * .operators.AnomalyOps.winsorize]] on this frame's group key and
    * value column; outlier TREATMENT next to [[anomalies]]' detection.
    */
  def winsorize(lo: Double = 0.01, hi: Double = 0.99): FluxFrame =
    copy(df = graft.operators.AnomalyOps.winsorize(df, groupKey, valueCol, lo, hi))

  /** Engine extension: hysteresis burst flags (enter above μ+hi·σ,
    * hold above μ+lo·σ) — [[graft.operators.AnomalyOps.burstFlags]]
    * ordered on this frame's time column. Adds `mu`, `sg`, `in_burst`.
    */
  def bursts(hiSigmas: Double = 2.0, loSigmas: Double = 0.5): FluxFrame =
    copy(df = graft.operators.AnomalyOps.burstFlags(df, groupKey, timeCol,
      valueCol, hiSigmas, loSigmas))

  /** Engine extension: seasonal (hour-of-week) baseline deviation
    * flags — [[graft.operators.AnomalyOps.seasonalBaseline]] on this
    * frame's group key, with the µs slot axis derived from the
    * timestamp time column. Adds `how`, `mu`, `sg`, `flag`.
    */
  def seasonalBaseline(sigmas: Double = 3.0): FluxFrame =
    copy(df = graft.operators.AnomalyOps.seasonalBaseline(
      df.withColumn("_ts_us", unix_micros(col(timeCol))),
      groupKey, "_ts_us", valueCol, sigmas).drop("_ts_us"))

  /** Engine extension: autocorrelation of the series at lags
    * 1..maxLag — [[graft.operators.SeriesMiningOps.acf]] on this
    * frame's group key, ordered by the time column (the store's LWW
    * upsert guarantees (series, time) uniqueness, so the order is
    * total). Aggregate-shaped result: (key…, lag, acf).
    */
  def acf(maxLag: Int): DataFrame =
    graft.operators.SeriesMiningOps.acf(df, groupKey, Seq(timeCol),
      valueCol, maxLag)

  /** Engine extension: Theil–Sen robust slope per series over a
    * time-bucketed frame (compose after aggregateWindow — the pair
    * count is bucket-bounded); `everySeconds` converts the time axis
    * to the integer step index, and the median pairwise slope is
    * reported in value units per step. Slope is invariant to the
    * constant window-start/stop offset. Result: (key…, n_pairs,
    * med_slope).
    */
  def theilSen(everySeconds: Double): DataFrame = {
    val us = (everySeconds * 1e6).toLong
    require(us > 0, s"every must be positive, got $everySeconds s")
    val stepped = df.withColumn("_step",
      expr(s"unix_micros(`$timeCol`) div ${us}L"))
    graft.operators.SeriesMiningOps.theilSen(
      stepped, groupKey, "_step", valueCol)
  }

  /** Engine extension: least-squares trend + h-step forecast over a
    * time-bucketed frame (compose after aggregateWindow); `everySeconds`
    * converts the time axis to the integer step index the exact-sum
    * fit needs. Result: (key…, step, slope, intercept, yhat).
    */
  def forecastLinear(h: Int, everySeconds: Double): DataFrame = {
    val us = (everySeconds * 1e6).toLong
    require(us > 0, s"every must be positive, got $everySeconds s")
    val stepped = df.withColumn("_step",
      expr(s"unix_micros(`$timeCol`) div ${us}L"))
    graft.operators.SeriesMiningOps.linearForecast(
      stepped, groupKey, "_step", valueCol, h)
  }

  /** Engine extension: depth-2 binary-segmentation changepoints over
    * the per-series value sequence, centi-quantized for the integer-
    * exact cost prefix sums ([[graft.operators.SeriesMiningOps
    * .changepoints]]). Result: (key…, depth, t, cost) with costs in
    * value² units.
    */
  def changepoints(): DataFrame = {
    val q = df
      .withColumn("_pos", (row_number().over(w) - 1).cast("long"))
      .withColumn("_vq", round(col(valueCol) * 100).cast("long"))
    graft.operators.SeriesMiningOps.changepoints(q, groupKey, "_pos", "_vq")
      .withColumn("cost", col("cost") / 1.0e4)
  }

  /** LTTB plot downsampling to n points per series (extension verb —
    * the dashboard downsampler; see [[graft.operators.Lttb]] for the
    * determinism contract). Keeps the frame's key/time/value triple;
    * other columns don't survive the reduction, like an aggregate.
    * Time itself is the tie-break (a (series, time) duplicate would
    * collapse arbitrarily — the store's LWW upsert already forbids it).
    */
  def lttb(n: Int): FluxFrame = {
    val keyed = if (groupKey.nonEmpty) df else df.withColumn("_lttb_k", lit(1))
    val keys = if (groupKey.nonEmpty) groupKey else Seq("_lttb_k")
    val picked = graft.operators.Lttb.lttb(
      keyed.withColumn("_x_us", unix_micros(col(timeCol)))
        .withColumn("_tie", unix_micros(col(timeCol))),
      keys, "_x_us", "_tie", valueCol, n)
    copy(df = picked
      .withColumn(timeCol, timestamp_micros(col("_x_us")))
      .drop("_x_us", "_tie", "_lttb_k"))
  }

  def sessionize(maxGap: Double, as: String = "session"): FluxFrame = {
    val dt = col(timeCol).cast("double") - lag(col(timeCol).cast("double"), 1).over(w)
    val isNew = when(dt.isNull || dt > lit(maxGap), 1).otherwise(0)
    copy(df = df.withColumn(as,
      sum(isNew).over(rows(Window.unboundedPreceding, 0))))
  }

  /** Flux `interpolate.linear(every:)` — regular grid per group with
    * linear interpolation between observed neighbors. Spine generated
    * distributed (sequence+explode), neighbors found via
    * last/first-ignoreNulls windows — no self-join.
    */
  def interpolateLinear(everySeconds: Long, as: String = "_value"): FluxFrame = {
    val bounds = df.groupBy(keyCols: _*)
      .agg(min(col(timeCol)).as("_lo"), max(col(timeCol)).as("_hi"))
    val spine = bounds
      .withColumn(timeCol, explode(sequence(
        (ceil(col("_lo").cast("double") / everySeconds) * everySeconds).cast("timestamp"),
        col("_hi"),
        expr(s"INTERVAL $everySeconds seconds"))))
      .select((keyCols :+ col(timeCol)): _*)
    val unioned = df.select((keyCols ++ Seq(col(timeCol), col(valueCol))): _*)
      .withColumn("_obs", lit(1))
      .unionByName(spine.withColumn(valueCol, lit(null).cast("double")).withColumn("_obs", lit(0)))
    // de-dup grid points that coincide with observations
    val ww = (if (groupKey.isEmpty) Window.partitionBy() else Window.partitionBy(keyCols: _*))
      .orderBy(col(timeCol), col("_obs").desc)
    val dedup = unioned.withColumn("_rn", row_number().over(
        (if (groupKey.isEmpty) Window.partitionBy(col(timeCol)) else Window.partitionBy((keyCols :+ col(timeCol)): _*))
          .orderBy(col("_obs").desc)))
      .filter(col("_rn") === 1).drop("_rn")
    val back = ww.rowsBetween(Window.unboundedPreceding, 0)
    val fwd = ww.rowsBetween(0, Window.unboundedFollowing)
    val tSec = col(timeCol).cast("double")
    val staged = dedup
      .withColumn("_pv", last(col(valueCol), ignoreNulls = true).over(back))
      .withColumn("_pt", last(when(col(valueCol).isNotNull, tSec), ignoreNulls = true).over(back))
      .withColumn("_nv", first(col(valueCol), ignoreNulls = true).over(fwd))
      .withColumn("_nt", first(when(col(valueCol).isNotNull, tSec), ignoreNulls = true).over(fwd))
    val interp = when(col(valueCol).isNotNull, col(valueCol))
      .when(col("_pt") === col("_nt"), col("_pv"))
      .otherwise(col("_pv") + (col("_nv") - col("_pv")) * (tSec - col("_pt")) / (col("_nt") - col("_pt")))
    val out = staged
      .withColumn(as, interp)
      .filter(col("_obs") === 0 || col(valueCol).isNotNull)
      .select((keyCols ++ Seq(col(timeCol), col(as))): _*)
    FluxFrame(out, groupKey, timeCol, as)
  }

  // ---------------- order-sensitive scans (SeriesScan-backed) ----------

  /** Flux `exponentialMovingAverage(n:)` — order-sensitive; one shuffle
    * + in-partition scan (SeriesScan), O(1) state per series.
    */
  def ema(n: Int, as: String = "_value"): FluxFrame = {
    val out = SeriesScan.ema(df, groupKey, timeCol, valueCol, n, "_ema")
      .filter(col("_ema").isNotNull)
      .withColumn(as, col("_ema")).drop("_ema")
    FluxFrame(out, groupKey, timeCol, as)
  }

  /** Flux `doubleEMA(n:)` = 2·EMA_n − EMA_n(EMA_n). */
  def doubleEma(n: Int, as: String = "_value"): FluxFrame = {
    val e1 = SeriesScan.ema(df, groupKey, timeCol, valueCol, n, "_e1").filter(col("_e1").isNotNull)
    val e2 = SeriesScan.ema(e1, groupKey, timeCol, "_e1", n, "_e2").filter(col("_e2").isNotNull)
    FluxFrame(e2.withColumn(as, lit(2) * col("_e1") - col("_e2")).drop("_e1", "_e2"), groupKey, timeCol, as)
  }

  /** Flux `tripleEMA(n:)` = 3·EMA1 − 3·EMA2 + EMA3. */
  def tripleEma(n: Int, as: String = "_value"): FluxFrame = {
    val e1 = SeriesScan.ema(df, groupKey, timeCol, valueCol, n, "_e1").filter(col("_e1").isNotNull)
    val e2 = SeriesScan.ema(e1, groupKey, timeCol, "_e1", n, "_e2").filter(col("_e2").isNotNull)
    val e3 = SeriesScan.ema(e2, groupKey, timeCol, "_e2", n, "_e3").filter(col("_e3").isNotNull)
    FluxFrame(e3.withColumn(as, lit(3) * col("_e1") - lit(3) * col("_e2") + col("_e3")).drop("_e1", "_e2", "_e3"),
      groupKey, timeCol, as)
  }

  /** Flux `tripleExponentialDerivative(n:)` (TRIX): the 1-back percent
    * rate of change of the triple-SMOOTHED EMA (ema∘ema∘ema — not
    * [[tripleEma]]'s 3e1−3e2+e3 combination) — the oscillator that
    * filters noise below three smoothing passes.
    */
  def trix(n: Int, as: String = "_value"): FluxFrame = {
    val e1 = SeriesScan.ema(df, groupKey, timeCol, valueCol, n, "_e1").filter(col("_e1").isNotNull)
    val e2 = SeriesScan.ema(e1, groupKey, timeCol, "_e1", n, "_e2").filter(col("_e2").isNotNull)
    val e3 = SeriesScan.ema(e2, groupKey, timeCol, "_e2", n, "_e3").filter(col("_e3").isNotNull)
    val out = e3.withColumn("_p", lag(col("_e3"), 1).over(w))
      .filter(col("_p").isNotNull)
      .withColumn(as, (col("_e3") - col("_p")) / col("_p") * lit(100.0))
      .drop("_e1", "_e2", "_e3", "_p")
    FluxFrame(out, groupKey, timeCol, as)
  }

  /** Flux `kaufmansER(n:)`: Kaufman's efficiency ratio —
    * |v_t − v_{t−n}| over the window's total absolute movement
    * (Σ|v_i − v_{i−1}|), 0 when the series didn't move (the
    * [[kaufmansAma]] convention). Pure window algebra: one series
    * shuffle, O(n)-frame sliding sums.
    */
  def kaufmansER(n: Int, as: String = "_value"): FluxFrame = {
    val base = df.withColumn("_d1",
      abs(col(valueCol) - lag(col(valueCol), 1).over(w)))
    val out = base
      .withColumn("_chg", abs(col(valueCol) - lag(col(valueCol), n).over(w)))
      .withColumn("_vol", sum(col("_d1")).over(rows(-(n - 1), 0)))
      .withColumn("_cnt", count(col("_d1")).over(rows(-(n - 1), 0)))
      .filter(col("_chg").isNotNull && col("_cnt") === n)
      .withColumn(as,
        when(col("_vol") === 0.0, 0.0).otherwise(col("_chg") / col("_vol")))
      .drop("_d1", "_chg", "_vol", "_cnt")
    FluxFrame(out, groupKey, timeCol, as)
  }

  /** Flux `relativeStrengthIndex(n:)` (Wilder smoothing). */
  def rsi(n: Int, as: String = "_value"): FluxFrame = {
    val out = SeriesScan.rsi(df, groupKey, timeCol, valueCol, n, "_rsi")
      .filter(col("_rsi").isNotNull).withColumn(as, col("_rsi")).drop("_rsi")
    FluxFrame(out, groupKey, timeCol, as)
  }

  /** Flux `chandeMomentumOscillator(n:)`. */
  def chandeMomentum(n: Int, as: String = "_value"): FluxFrame = {
    val out = SeriesScan.chandeMomentum(df, groupKey, timeCol, valueCol, n, "_cmo")
      .filter(col("_cmo").isNotNull).withColumn(as, col("_cmo")).drop("_cmo")
    FluxFrame(out, groupKey, timeCol, as)
  }

  /** Flux `kaufmansAMA(n:)`. */
  def kaufmansAma(n: Int, as: String = "_value"): FluxFrame = {
    val out = SeriesScan.kama(df, groupKey, timeCol, valueCol, n, "_kama")
      .filter(col("_kama").isNotNull).withColumn(as, col("_kama")).drop("_kama")
    FluxFrame(out, groupKey, timeCol, as)
  }

  /** InfluxQL `holtWinters(N, seasonal)`: additive triple exponential
    * smoothing over a regular grid (apply after [[aggregateWindow]]),
    * emitting fitted values + N forecast rows per series. α/β/γ are
    * explicit parameters (the engine fits them; we stay deterministic).
    * Output frame: (_hw_key, time, value, fitted, is_forecast).
    */
  def holtWinters(forecast: Int, season: Int,
      alpha: Double = 0.5, beta: Double = 0.1, gamma: Double = 0.1): DataFrame =
    SeriesScan.holtWinters(df, groupKey, timeCol, valueCol, forecast, season, alpha, beta, gamma)

  /** `holtWinters` with α/β/γ FITTED per series by deterministic grid
    * refinement on one-step-ahead SSE (the v1 engine's fit-by-
    * optimization semantics; see [[SeriesScan.holtWintersFit]]).
    * Output: (_hw_key, time, fitted, alpha, beta, gamma, sse) —
    * `forecast` rows per series.
    */
  def holtWintersFit(forecast: Int, season: Int): DataFrame =
    SeriesScan.holtWintersFit(df, groupKey, timeCol, valueCol, forecast, season)

  /** Flux `yield(name:)` — naming marker; materialization is caller's. */
  def yieldName(name: String): DataFrame = df

  /** Flux `reduce(fn:, identity:)` — the second user-extension point
    * (after `map`): fold each table's rows in time order into an
    * accumulator record, emitting one row per group of
    * (groupKey…, accumulator fields…).
    *
    * Faithful Flux semantics are a sequential per-table fold, so the
    * shape is the [[SeriesScan]] one — one shuffle to co-locate each
    * group, in-partition sort, one streaming pass with O(1) state —
    * NOT a `collect_list` (unbounded per-group memory) and not a
    * Spark `Aggregator` (whose merge step would require the fold to be
    * commutative, which an arbitrary user lambda is not).
    *
    * @param identity accumulator field names with initial values (layout
    *   and output column order)
    * @param step (accumulator, row) => new accumulator; arrays are
    *   positional in `identity` order and must not be mutated in place
    */
  def reduce(identity: Seq[(String, Double)],
      step: (Array[Double], org.apache.spark.sql.Row) => Array[Double]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val inSchema = df.schema
    val keyIdx = groupKey.map(inSchema.fieldIndex)
    val outSchema = StructType(
      groupKey.map(inSchema(_)) ++ identity.map { case (n, _) => StructField(n, DoubleType) })
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
    val init = identity.map(_._2).toArray
    val sorted =
      if (groupKey.isEmpty) df.repartition(1).sortWithinPartitions(col(timeCol))
      else df.repartition(keyCols: _*)
        .sortWithinPartitions((groupKey :+ timeCol).map(col): _*)
    sorted.mapPartitions { it =>
      new Iterator[Row] {
        private val base = it.buffered
        def hasNext: Boolean = base.hasNext
        def next(): Row = {
          val key = keyIdx.map(base.head.get)
          var acc = init.clone()
          while (base.hasNext && keyIdx.map(base.head.get) == key)
            acc = step(acc, base.next())
          Row.fromSeq(key ++ acc.toSeq)
        }
      }
    }
  }

  def toDF: DataFrame = df
}

object FluxFrame {
  /** Adapt any time/value-shaped DataFrame (e.g. the testdata `events`
    * table) into the verb surface.
    */
  def of(df: DataFrame, time: String, value: String, series: String*): FluxFrame =
    FluxFrame(df, series, time, value)

  private val IntervalTokenRe = """(-?\d+)\s*([A-Za-zµ]+)""".r

  /** Fixed-width interval string → microseconds. Accepts everything
    * Spark's own `window()` interval grammar does for fixed units —
    * compound spellings ("1 hour 30 minutes") sum, and the common
    * abbreviations ("90 min", "2h", "500ms") resolve — because
    * [[normalizeOffset]] sits IN FRONT of Spark's parser and must not
    * reject offsets window() previously accepted. Weeks are fixed
    * 7-day spans on this axis; calendar units (months/years) never
    * reach here.
    */
  private def intervalUs(s: String): Long = {
    val toks = IntervalTokenRe.findAllMatchIn(s).toSeq
    if (toks.isEmpty || IntervalTokenRe.replaceAllIn(s, "").exists(!_.isWhitespace))
      throw new IllegalArgumentException(s"cannot parse interval '$s'")
    toks.map { m =>
      val us = m.group(2).toLowerCase match {
        case "microsecond" | "microseconds" | "us" | "µs" => 1L
        case "millisecond" | "milliseconds" | "ms" => 1000L
        case "second" | "seconds" | "sec" | "secs" | "s" => 1000000L
        case "minute" | "minutes" | "min" | "mins" | "m" => 60L * 1000000
        case "hour" | "hours" | "hr" | "hrs" | "h" => 3600L * 1000000
        case "day" | "days" | "d" => 86400L * 1000000
        case "week" | "weeks" | "w" => 7L * 86400 * 1000000
        case other => throw new IllegalArgumentException(
          s"unsupported interval unit '$other' in '$s'")
      }
      m.group(1).toLong * us
    }.sum
  }

  /** Flux windows TILE, so any offset is congruent to offset mod every
    * — normalize into [0, every) (floorMod handles negative offsets)
    * because Spark's `window()` hard-requires |startTime| < slide.
    */
  private[dsl] def normalizeOffset(offset: String, every: String): String = {
    val off = intervalUs(offset)
    // the zero path must not parse `every` (calendar spellings like
    // "1 months" reach here with a zero offset and are not fixed-width
    // intervals) — but it must still emit the CANONICAL spelling: this
    // grammar accepts abbreviations ("0m") Spark's own interval parser
    // rejects, so passing the raw input through would throw inside
    // window() for spellings the non-zero path accepts
    if (off == 0L) "0 microseconds"
    else s"${java.lang.Math.floorMod(off, intervalUs(every))} microseconds"
  }

  /** Calendar `every` spelling ("3 months") from the Flux front-end's
    * `1mo`/`1y` durations — fixed-width intervals never match.
    */
  private[dsl] val MonthsEvery = """^\s*(\d+)\s+months?\s*$""".r
}
