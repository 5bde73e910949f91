package graft.service

import graft.store.BucketStore

/** Background retention + compaction scheduler.
  *
  * The pinned engine enforces bucket retention continuously with no
  * operator action (the reference configures the bucket's retention at
  * provision time, recipe.yaml:21, and InfluxDB 2.0.9 expires points on
  * its own; TSM compaction likewise runs as a background cycle). This
  * is the serve-loop analogue: a single daemon timer sweeps every
  * catalog bucket —
  *
  *  - [[BucketStore.enforceRetention]] drops whole expired `dt=`
  *    day-partitions: O(metadata), never a data rewrite, so the sweep
  *    cost is independent of bucket size;
  *  - [[BucketStore.compact]] runs only when the bucket is dirty (has
  *    been written since its last compaction), and is INCREMENTAL
  *    inside the bucket: partition-level compaction stamps let it skip
  *    every day whose file set is untouched since its own dedup
  *    rewrite, so a continuously-ingesting bucket pays O(appended
  *    data) per sweep — the hot day, not the archive — then re-arms
  *    the clean marker so steady-state reads skip the LWW shuffle.
  *
  * Both operations take the per-bucket write lock, so sweeps serialize
  * with appends/deletes and can never race a commit; readers are
  * lock-free (they scan a parquet snapshot and dedup via the LWW
  * window when the clean marker is absent), so queries keep running
  * during a sweep.
  */
final class Maintenance(store: BucketStore, periodSeconds: Long,
    /** Runs after each full sweep — the engine hooks its AQE
      * start-width refresh here (the sweep is the natural place the
      * service observes corpus growth; see [[graft.SparkTuning
      * .refreshWidth]]). Failures are logged like a bucket failure.
      */
    postSweep: () => Unit = () => ()) {
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private val exec = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
    (r: Runnable) => {
      val t = new Thread(r, "graft-maintenance")
      t.setDaemon(true)
      t
    })

  def start(): Maintenance = {
    require(periodSeconds > 0, s"maintenance period must be positive, got $periodSeconds")
    exec.scheduleWithFixedDelay(() => sweepAll(),
      periodSeconds, periodSeconds, java.util.concurrent.TimeUnit.SECONDS)
    this
  }

  /** One pass over every bucket. A failing bucket is logged and skipped
    * so one bad directory cannot starve the rest of the sweep.
    */
  def sweepAll(): Unit = {
    store.catalog.listBuckets.foreach { b =>
      try sweep(b.name)
      catch {
        case e: Throwable =>
          log.warn(s"maintenance sweep failed for bucket '${b.name}': ${e.getMessage}")
      }
    }
    try postSweep()
    catch {
      case e: Throwable =>
        log.warn(s"maintenance postSweep hook failed: ${e.getMessage}")
    }
  }

  def sweep(bucket: String): Unit = {
    val dropped = store.enforceRetention(bucket)
    if (dropped.nonEmpty)
      log.info(s"retention: bucket '$bucket' dropped ${dropped.mkString(", ")}")
    // keepExistingLayout: the sweep restores dedup-cleanliness without
    // grinding deliberately Z-ordered/multi-file days back to defaults
    if (!store.isClean(bucket)) store.compact(bucket, keepExistingLayout = true)
  }

  def stop(): Unit = exec.shutdownNow()
}
