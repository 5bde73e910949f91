package graft.streaming

import graft.dsl.Tsdb
import graft.influxql.InfluxQL._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The v1 CONTINUOUS QUERY registry: `CREATE CONTINUOUS QUERY name ON
  * db BEGIN SELECT agg(f) INTO m2 FROM m1 GROUP BY time(1h) END` maps
  * onto a [[DownsampleTask]] scoped to (m1, f) and relabeled (m2, agg)
  * — the same streaming windowed aggregate the task gate verifies,
  * registered under (db, name) so SHOW / DROP manage its lifecycle.
  *
  * v1 CQ semantics notes (reference engine, v1 compat):
  *  - the CQ writes into its own database; LWW read resolution keeps
  *    the latest refinement of a re-emitted window;
  *  - all tags are preserved on the output series (the common
  *    `GROUP BY time(…), *` form); explicit tag subsets in GROUP BY
  *    are accepted and likewise preserved (a superset grouping);
  *  - output field name = the aggregate function name, v1's naming.
  */
final class ContinuousQueries(tsdb: Tsdb, checkpointRoot: String,
    /** Trigger for CQs created without RESAMPLE EVERY or an explicit
      * per-create trigger. None = live service: the v1 default run
      * schedule, i.e. ProcessingTime of the GROUP BY time() interval —
      * a CQ must keep downsampling points written after CREATE. Drain
      * callers (specs, batch backfills) pass
      * Some(Trigger.AvailableNow()).
      */
    defaultTrigger: Option[Trigger] = None,
    /** Seen-files-log bound forwarded to every CQ's underlying
      * [[DownsampleTask]] (see its `maxFileAge` note: O(window) driver
      * memory on a months-long tail; size to the longest tolerated
      * task outage; `cleanSource` is NOT an option here — the tailed
      * files are the store).
      */
    maxFileAge: String = "7d") {

  private final case class Entry(text: String,
      query: org.apache.spark.sql.streaming.StreamingQuery)
  private val registry =
    new scala.collection.concurrent.TrieMap[(String, String), Entry]

  private def aggFn(fn: String): Column => Column = fn match {
    case "mean" => avg
    case "sum" => sum
    case "count" => count
    case "min" => min
    case "max" => max
    case other =>
      throw new IllegalArgumentException(s"unsupported CQ aggregate '$other'")
  }

  /** Register + start the task. `text` is the original DDL (SHOW
    * CONTINUOUS QUERIES echoes it, as in v1).
    *
    * RESAMPLE mapping onto the streaming task: EVERY becomes the
    * micro-batch trigger cadence (the v1 run schedule) via
    * [[ContinuousQueries.resolveTrigger]]; FOR becomes the watermark
    * lateness — v1 recomputes every bucket overlapping [now − FOR,
    * now] each run, so a point arriving up to FOR late still refines
    * its bucket; update-mode emission + LWW read resolution keep the
    * latest refinement, exactly as the batch path would.
    */
  def create(name: String, db: String, sel: Select, text: String,
      trigger: Option[Trigger] = None,
      resampleEvery: Option[graft.influxql.InfluxQL.Dur] = None,
      resampleFor: Option[graft.influxql.InfluxQL.Dur] = None): Unit = {
    require(!registry.contains((db, name)), s"continuous query '$name' exists on '$db'")
    val (agg, srcMeasurement) = (sel.projs, sel.from) match {
      case (Seq(a: AggProj), FromMeasurements(Seq(m))) => (a, m)
      case _ => throw new IllegalArgumentException(
        "CQ SELECT must be a single aggregate over a single measurement")
    }
    // Clauses the streaming task can't honor must be rejected at CREATE
    // time, not silently dropped — a CQ that ignores its WHERE would
    // downsample the wrong data forever.
    require(sel.fill == FillNull || sel.fill == FillNone,
      "CQ SELECT FILL(...) is not supported (the task emits only observed windows)")
    require(sel.limit.isEmpty && sel.offset.isEmpty &&
      sel.slimit.isEmpty && sel.soffset.isEmpty,
      "CQ SELECT LIMIT/OFFSET is not supported")
    // WHERE: AND-ed tag equality pushes into the stream's scoped filter
    // (the common per-host CQ); anything else — time bounds, OR, field
    // comparisons — is rejected.
    val whereFilter = sel.where.map(ContinuousQueries.tagPredicate)
    val target = sel.into.getOrElse(
      throw new IllegalArgumentException("CQ SELECT needs INTO"))
    val groupBy = sel.groupTime.getOrElse(
      throw new IllegalArgumentException("CQ needs GROUP BY time()"))
    val q = new DownsampleTask(tsdb).start(
      source = db, target = db, every = groupBy.interval,
      fn = aggFn(agg.fn),
      lateness = resampleFor.map(_.interval).getOrElse("0 seconds"),
      checkpoint = s"$checkpointRoot/$db/$name",
      trigger = ContinuousQueries.effectiveTrigger(
        trigger.orElse(defaultTrigger), resampleEvery, groupBy),
      measurement = Some(srcMeasurement), fieldName = Some(agg.field),
      extraFilter = whereFilter,
      intoMeasurement = Some(target),
      intoField = Some(agg.alias.getOrElse(agg.fn)),
      maxFileAge = maxFileAge)
    registry.put((db, name), Entry(text, q))
  }

  /** (db, name, query-text) rows, name-ordered — SHOW CONTINUOUS
    * QUERIES.
    */
  def list: Seq[(String, String, String)] =
    registry.toSeq.map { case ((db, n), e) => (db, n, e.text) }.sortBy(t => (t._1, t._2))

  /** Stop + deregister; false if absent. */
  def drop(name: String, db: String): Boolean =
    registry.remove((db, name)).exists { e => e.query.stop(); true }

  /** Block until every registered task drains (AvailableNow runs). */
  def awaitAll(): Unit = registry.values.foreach(_.query.awaitTermination())
}

object ContinuousQueries {
  /** RESAMPLE EVERY overrides the caller's trigger with the periodic
    * cadence it names; without it the caller's trigger (the GROUP BY
    * interval's schedule in a live service, AvailableNow in drains)
    * stands.
    */
  def resolveTrigger(default: Trigger,
      every: Option[graft.influxql.InfluxQL.Dur]): Trigger =
    every.map(d => Trigger.ProcessingTime((d.seconds * 1000).toLong))
      .getOrElse(default)

  /** Effective trigger for [[ContinuousQueries.create]]: RESAMPLE EVERY
    * cadence wins; else the explicit/constructor trigger (drain
    * callers); else the v1 default run schedule — ProcessingTime of
    * the GROUP BY time() interval, so a live CQ keeps running.
    */
  def effectiveTrigger(explicit: Option[Trigger],
      every: Option[graft.influxql.InfluxQL.Dur],
      groupBy: graft.influxql.InfluxQL.Dur): Trigger =
    resolveTrigger(
      explicit.getOrElse(Trigger.ProcessingTime((groupBy.seconds * 1000).toLong)),
      every)

  /** AND-ed `tag = 'v'` / `tag != 'v'` WHERE → a `tags`-map predicate
    * for the raw stream; any other shape is unsupported in a CQ.
    */
  def tagPredicate(c: graft.influxql.InfluxQL.Cond): Column = c match {
    case CAnd(l, r) => tagPredicate(l) && tagPredicate(r)
    case CCmp("=", key, LStr(v)) if key != "time" =>
      col("tags").getItem(key) === v
    case CCmp("!=", key, LStr(v)) if key != "time" =>
      !(col("tags").getItem(key) <=> v)
    case other => throw new IllegalArgumentException(
      s"unsupported CQ WHERE clause (AND-ed tag = 'v' only): $other")
  }
}
