package graft.streaming

import graft.flux.{FluxEval, FluxParser}
import graft.flux.FluxParser.{VDur, VRec, VStr, Value}
import graft.store.{Catalog, TaskMeta}
import java.util.concurrent.{Executors, ScheduledFuture, TimeUnit}
import scala.collection.concurrent.TrieMap

/** The v2-native scheduled-Flux task registry (`/api/v2/tasks`): a
  * task is a Flux script led by `option task = {name: …, every: …[,
  * offset: …]}` whose body typically downsamples into another bucket
  * via `to()`. The pinned engine re-runs the script every `every` on
  * its task scheduler; here each task is a daemon-scheduled re-run of
  * [[FluxEval.runScript]] (full program, multi-statement and
  * multi-sink — two standalone `|> to()` pipelines run like in the
  * reference task engine) over the same source the HTTP query endpoint
  * serves — the batch-rerun semantics InfluxDB tasks actually have
  * (unbounded lateness: each run re-reads its `range()`), unlike the
  * watermarked streaming path of [[DownsampleTask]], which covers the
  * v1 CQ form.
  *
  * Scale: the scheduler thread only SUBMITS Spark jobs; each run is a
  * distributed batch query, so a task over a 100 TB bucket is exactly
  * as parallel as the same query typed into `/api/v2/query`. Failures
  * of one run are recorded and do not cancel the schedule (matching
  * the engine's task-run error log).
  *
  * Persistence: task records live in the [[Catalog]] next to buckets
  * and tokens (the pinned engine keeps them in its KV store), so a
  * registry built over the same warehouse reschedules every persisted
  * task on construction. Missed-run behavior across a restart: runs
  * that would have fired while the process was down are SKIPPED — the
  * schedule restarts at one full cadence after construction — and the
  * next run backfills whatever its script's `range()` covers, which
  * for the usual re-downsample shape makes skipped runs harmless
  * (LWW dedup keeps re-runs idempotent).
  */
final class FluxTasks(sourceFactory: () => FluxEval.Source,
    catalog: Option[Catalog] = None) {

  private final case class Entry(rec: TaskMeta, handle: Option[ScheduledFuture[_]])
  private val registry = new TrieMap[String, Entry]
  // most-recent-run outcome only: cleared on any successful run
  // (scheduled or manual) so lastRunError never shows a stale failure
  private val lastErrors = new TrieMap[String, String]

  private val scheduler = Executors.newSingleThreadScheduledExecutor { r =>
    val t = new Thread(r, "graft-flux-tasks"); t.setDaemon(true); t
  }

  // reload + reschedule everything the warehouse already knows about
  catalog.foreach(_.listTasks.foreach(schedule))

  private def durNs(v: Value): Long = v match {
    case VDur(n, "ns") => n
    case VDur(n, "us") => n * 1000L
    case VDur(n, "ms") => n * 1000000L
    case VDur(n, "s") => n * 1000000000L
    case VDur(n, "m") => n * 60L * 1000000000L
    case VDur(n, "h") => n * 3600L * 1000000000L
    case VDur(n, "d") => n * 86400L * 1000000000L
    case VDur(n, "w") => n * 7L * 86400L * 1000000000L
    case VDur(n, u @ ("mo" | "y")) => throw new IllegalArgumentException(
      s"calendar unit '$u' in '$n$u' is only valid as a task `every` cadence " +
        "(month-boundary scheduling); offsets need a fixed width (w/d/h/m/s)")
    case other => throw new IllegalArgumentException(s"expected a duration, got $other")
  }

  /** Split an `every` value into (fixed ns, calendar months) — exactly
    * one is non-zero. `mo`/`y` have no fixed ns width; they schedule on
    * UTC calendar boundaries instead (`y` ≡ 12 months).
    */
  private def cadenceOf(v: Value): (Long, Int) = v match {
    case VDur(n, "mo") => (0L, n.toInt)
    case VDur(n, "y") => (0L, n.toInt * 12)
    case other => (durNs(other), 0)
  }

  /** Render ns back to the shortest exact Flux duration literal (the
    * task JSON echoes `every` in the script's own unit scale).
    */
  def nsToFlux(ns: Long): String = {
    val units = Seq(
      "w" -> 7L * 86400L * 1000000000L, "d" -> 86400L * 1000000000L,
      "h" -> 3600L * 1000000000L, "m" -> 60L * 1000000000L,
      "s" -> 1000000000L, "ms" -> 1000000L, "us" -> 1000L, "ns" -> 1L)
    units.collectFirst { case (u, f) if ns % f == 0 && ns / f > 0 => s"${ns / f}$u" }
      .getOrElse("0s")
  }

  /** Echo a record's `every` in Flux literal form — calendar cadences
    * render as `mo`/`y`, fixed ones via [[nsToFlux]].
    */
  def everyToFlux(rec: TaskMeta): String =
    if (rec.everyMonths > 0) {
      if (rec.everyMonths % 12 == 0) s"${rec.everyMonths / 12}y" else s"${rec.everyMonths}mo"
    } else nsToFlux(rec.everyNs)

  /** Next fire instant (epoch ns) for a calendar cadence: the first
    * epoch-aligned month boundary (months-since-1970 divisible by
    * `months`, at 00:00 UTC on the 1st) whose boundary+offset is
    * strictly after `nowNs`. Epoch alignment matches Flux's window
    * alignment: `3mo` fires Jan/Apr/Jul/Oct, `1y` every Jan 1. Pure —
    * spec-testable without sleeping through a month.
    */
  def nextCalendarFireNs(nowNs: Long, months: Int, offsetNs: Long): Long = {
    require(months > 0, "calendar cadence needs months > 0")
    def boundaryNs(epochMonths: Int): Long = {
      val y = 1970 + Math.floorDiv(epochMonths, 12)
      val m = Math.floorMod(epochMonths, 12) + 1
      java.time.ZonedDateTime.of(y, m, 1, 0, 0, 0, 0, java.time.ZoneOffset.UTC)
        .toEpochSecond * 1000000000L
    }
    val nowUtc = java.time.ZonedDateTime.ofInstant(
      java.time.Instant.ofEpochSecond(
        Math.floorDiv(nowNs, 1000000000L), Math.floorMod(nowNs, 1000000000L)),
      java.time.ZoneOffset.UTC)
    val monthsSince = (nowUtc.getYear - 1970) * 12 + nowUtc.getMonthValue - 1
    // start at the current aligned boundary: with an offset the fire
    // time inside the CURRENT period may still be ahead of now
    var k = Math.floorDiv(monthsSince, months) * months
    while (boundaryNs(k) + offsetNs <= nowNs) k += months
    boundaryNs(k) + offsetNs
  }

  /** Register the schedule for an (already validated) record — shared
    * by [[create]] and the catalog reload path. First run fires one
    * `every` (+ offset) after registration; each run re-executes the
    * full script.
    */
  private def schedule(rec: TaskMeta): Unit = {
    if (rec.status != "active") { registry.put(rec.id, Entry(rec, None)); return }
    if (rec.everyMonths > 0) { scheduleCalendar(rec); return }
    val everyMs = math.max(1L, rec.everyNs / 1000000L)
    val offsetMs = rec.offsetNs / 1000000L
    // to() materializes eagerly during eval (FluxEval.scala `to` verb),
    // so running the script IS the side effect — nothing is collected
    // to the driver
    val runnable: Runnable = () =>
      try { FluxEval.runScript(rec.flux, sourceFactory()); lastErrors.remove(rec.id); () }
      catch {
        case e: Throwable =>
          lastErrors.put(rec.id, Option(e.getMessage).getOrElse(e.toString))
      }
    // scheduleAtFixedRate: a run that overshoots `every` makes the
    // next run fire immediately after it (the single-thread executor
    // serializes them, never overlaps). Safe by construction: each run
    // re-reads its full range() and LWW dedup makes re-materialization
    // idempotent, so a burst of catch-up runs converges to the same
    // bucket state the on-time schedule would have produced.
    val handle = scheduler.scheduleAtFixedRate(
      runnable, everyMs + offsetMs, everyMs, TimeUnit.MILLISECONDS)
    registry.put(rec.id, Entry(rec, Some(handle)))
  }

  /** Calendar cadence: months vary in length, so instead of a fixed
    * rate each run is a one-shot at the next epoch-aligned month
    * boundary (+offset) that re-arms itself afterwards. Pausing or
    * deleting the task between runs breaks the chain — the re-arm only
    * happens if the registry still holds this id as active.
    */
  private def scheduleCalendar(rec: TaskMeta): Unit = {
    val nowNs = System.currentTimeMillis() * 1000000L
    val fireNs = nextCalendarFireNs(nowNs, rec.everyMonths, rec.offsetNs)
    val delayMs = math.max(1L, (fireNs - nowNs) / 1000000L)
    val runnable: Runnable = () => {
      try { FluxEval.runScript(rec.flux, sourceFactory()); lastErrors.remove(rec.id); () }
      catch {
        case e: Throwable =>
          lastErrors.put(rec.id, Option(e.getMessage).getOrElse(e.toString))
      }
      FluxTasks.this.synchronized {
        if (registry.get(rec.id).exists(_.rec.status == "active")) scheduleCalendar(rec)
      }
    }
    val handle = scheduler.schedule(runnable, delayMs, TimeUnit.MILLISECONDS)
    registry.put(rec.id, Entry(rec, Some(handle)))
  }

  /** Flip a task between `active` and `inactive` — the engine's PATCH
    * surface. Inactive tasks stay listed and persisted, keep their
    * `lastRunError`, and still honor manual `runNow` triggers, but
    * their schedule is disarmed (including across restarts: the reload
    * path skips arming non-active records).
    */
  def setStatus(id: String, status: String): Option[TaskMeta] = synchronized {
    require(status == "active" || status == "inactive",
      s"status must be active or inactive, got '$status'")
    registry.get(id).map { e =>
      if (e.rec.status == status) e.rec
      else {
        val rec = e.rec.copy(status = status)
        e.handle.foreach(_.cancel(false))
        registry.remove(id)
        schedule(rec) // arms only when active; always re-registers
        catalog.foreach(_.addTask(rec)) // addTask upserts by id
        rec
      }
    }
  }

  /** Validate + register + schedule + persist. */
  def create(flux: String, org: String): TaskMeta = synchronized {
    val prog = FluxParser.parseProgram(flux)
    val taskRec = prog.options.collectFirst { case ("task", r: VRec) => r }
      .getOrElse(throw new IllegalArgumentException(
        "task script needs an `option task = {name: …, every: …}` header"))
    val fields = taskRec.fields.toMap
    val name = fields.get("name") match {
      case Some(VStr(s)) if s.nonEmpty => s
      case _ => throw new IllegalArgumentException("task option needs a name")
    }
    val (everyNs, everyMonths) = cadenceOf(fields.getOrElse("every",
      throw new IllegalArgumentException("task option needs an `every` duration")))
    require(everyNs > 0 || everyMonths > 0, "task `every` must be positive")
    val offsetNs = fields.get("offset").map(durNs).getOrElse(0L)
    require(offsetNs >= 0, "task `offset` must be non-negative")
    require(!registry.values.exists(_.rec.name == name), s"task '$name' exists")

    val id = java.util.UUID.randomUUID().toString.replace("-", "").take(16)
    val rec = TaskMeta(id, name, org, flux, everyNs, offsetNs, "active", everyMonths)
    schedule(rec)
    catalog.foreach(_.addTask(rec))
    rec
  }

  def list: Seq[TaskMeta] = registry.values.map(_.rec).toSeq.sortBy(_.name)
  def get(id: String): Option[TaskMeta] = registry.get(id).map(_.rec)
  def lastError(id: String): Option[String] = lastErrors.get(id)

  def delete(id: String): Boolean = synchronized {
    registry.remove(id) match {
      case Some(e) =>
        e.handle.foreach(_.cancel(false))
        catalog.foreach(_.removeTask(id))
        true
      case None => false
    }
  }

  /** Run a task's script once, synchronously — the `POST
    * /api/v2/tasks/<id>/runs` manual-trigger surface (and what specs
    * use instead of sleeping through a cadence).
    */
  def runNow(id: String): Boolean = registry.get(id) match {
    case Some(e) =>
      // same bookkeeping as a scheduled run, but the failure also
      // propagates so the manual-trigger HTTP call reports it
      try { FluxEval.runScript(e.rec.flux, sourceFactory()); lastErrors.remove(id); true }
      catch {
        case ex: Throwable =>
          lastErrors.put(id, Option(ex.getMessage).getOrElse(ex.toString))
          throw ex
      }
    case None => false
  }

  /** Shutdown: cancel every schedule WITHOUT touching the persisted
    * records — tasks must survive the restart (delete is the only
    * unpersisting path).
    */
  def stopAll(): Unit = synchronized {
    registry.values.foreach(_.handle.foreach(_.cancel(false)))
    registry.clear()
    scheduler.shutdownNow()
  }
}
