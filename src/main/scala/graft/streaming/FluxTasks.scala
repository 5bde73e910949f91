package graft.streaming

import graft.flux.{FluxEval, FluxParser}
import graft.flux.FluxParser.{VDur, VRec, VStr, Value}
import java.util.concurrent.{Executors, ScheduledFuture, TimeUnit}
import scala.collection.concurrent.TrieMap

/** The v2-native scheduled-Flux task registry (`/api/v2/tasks`): a
  * task is a Flux script led by `option task = {name: …, every: …[,
  * offset: …]}` whose body typically downsamples into another bucket
  * via `to()`. The pinned engine re-runs the script every `every` on
  * its task scheduler; here each task is a daemon-scheduled re-run of
  * [[FluxEval.run]] over the same source the HTTP query endpoint
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
  * Registry is in-process like [[ContinuousQueries]]'s; the catalog
  * does not persist tasks across restarts (documented divergence).
  */
final class FluxTasks(sourceFactory: () => FluxEval.Source) {

  final case class TaskRec(
      id: String,
      name: String,
      org: String,
      flux: String,
      everyNs: Long,
      offsetNs: Long,
      status: String)

  private final case class Entry(rec: TaskRec, handle: ScheduledFuture[_])
  private val registry = new TrieMap[String, Entry]
  // most-recent-run outcome only: cleared on any successful run
  // (scheduled or manual) so lastRunError never shows a stale failure
  private val lastErrors = new TrieMap[String, String]

  private val scheduler = Executors.newSingleThreadScheduledExecutor { r =>
    val t = new Thread(r, "graft-flux-tasks"); t.setDaemon(true); t
  }

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
      s"unsupported task cadence unit '$u' in '$n$u': calendar-length units " +
        "have no fixed nanosecond width; use w/d/h/m/s (e.g. 4w ≈ 1mo)")
    case other => throw new IllegalArgumentException(s"expected a duration, got $other")
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

  /** Validate + register + schedule. The first run fires one `every`
    * after creation (the engine schedules at the next cadence
    * boundary); each run re-executes the full script.
    */
  def create(flux: String, org: String): TaskRec = synchronized {
    val prog = FluxParser.parseProgram(flux)
    val taskRec = prog.options.collectFirst { case ("task", r: VRec) => r }
      .getOrElse(throw new IllegalArgumentException(
        "task script needs an `option task = {name: …, every: …}` header"))
    val fields = taskRec.fields.toMap
    val name = fields.get("name") match {
      case Some(VStr(s)) if s.nonEmpty => s
      case _ => throw new IllegalArgumentException("task option needs a name")
    }
    val everyNs = durNs(fields.getOrElse("every",
      throw new IllegalArgumentException("task option needs an `every` duration")))
    require(everyNs > 0, "task `every` must be positive")
    val offsetNs = fields.get("offset").map(durNs).getOrElse(0L)
    require(!registry.values.exists(_.rec.name == name), s"task '$name' exists")

    val id = java.util.UUID.randomUUID().toString.replace("-", "").take(16)
    val everyMs = math.max(1L, everyNs / 1000000L)
    val offsetMs = offsetNs / 1000000L
    // to() materializes eagerly during eval (FluxEval.scala `to` verb),
    // so running the script IS the side effect — nothing is collected
    // to the driver
    val runnable: Runnable = () =>
      try { FluxEval.run(flux, sourceFactory()); lastErrors.remove(id); () }
      catch {
        case e: Throwable =>
          lastErrors.put(id, Option(e.getMessage).getOrElse(e.toString))
      }
    val handle = scheduler.scheduleAtFixedRate(
      runnable, everyMs + offsetMs, everyMs, TimeUnit.MILLISECONDS)
    val rec = TaskRec(id, name, org, flux, everyNs, offsetNs, "active")
    registry.put(id, Entry(rec, handle))
    rec
  }

  def list: Seq[TaskRec] = registry.values.map(_.rec).toSeq.sortBy(_.name)
  def get(id: String): Option[TaskRec] = registry.get(id).map(_.rec)
  def lastError(id: String): Option[String] = lastErrors.get(id)

  def delete(id: String): Boolean = synchronized {
    registry.remove(id) match {
      case Some(e) => e.handle.cancel(false); true
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
      try { FluxEval.run(e.rec.flux, sourceFactory()); lastErrors.remove(id); true }
      catch {
        case ex: Throwable =>
          lastErrors.put(id, Option(ex.getMessage).getOrElse(ex.toString))
          throw ex
      }
    case None => false
  }

  def stopAll(): Unit = synchronized {
    registry.keys.foreach(delete)
    scheduler.shutdownNow()
  }
}
