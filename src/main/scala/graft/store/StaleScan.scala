package graft.store

/** Retry harness for the lock-free read path racing a partition
  * rewrite (r18, found by the concurrent-service soak).
  *
  * Readers deliberately take no lock: they plan over a directory
  * listing and stream the files. A concurrent delete/compaction
  * rewrites a day partition under NEW paths and removes the old files
  * (`replaceDir`), so a query that listed before the swap can reach a
  * file that no longer exists mid-scan — Spark surfaces it as
  * `FAILED_READ_FILE.FILE_NOT_EXIST` (wrapping a
  * `FileNotFoundException`). Under the soak's sustained load
  * (4 writers + maintenance compaction every 20 s + a delete sweep)
  * this hit ~90% of queries; unguarded it surfaced as a 500 — a server
  * fault for what is client-invisible, retriable contention.
  *
  * The honest semantics is SNAPSHOT-RETRY: re-plan from scratch (a
  * fresh `spark.read` lists the post-swap files) and re-run. The
  * result is exactly what the query would have seen had it arrived a
  * moment later; LWW resolution makes the re-read deterministic. A
  * bounded number of attempts keeps a pathological rewrite loop from
  * pinning a request forever — after that the failure propagates (and
  * the HTTP layer 500s, which is then correct: the service could not
  * serve a consistent snapshot).
  *
  * Effect safety: Flux `to()` sinks inside a retried script re-append
  * the same rows under a fresh `_ingest_seq`; LWW keeps the newest
  * copy per (series, time), so re-materialization is idempotent at
  * read time — the same argument that makes scheduled-task re-runs
  * safe (FluxTasks scaladoc).
  *
  * 100 TB note: the retry re-plans the whole query, so its cost is a
  * re-run of one query on rare rewrite overlap — acceptable while
  * rewrites are per-day-partition and rare. An engine whose every
  * query races continuous rewrites wants a file MANIFEST (snapshot
  * isolation at the metadata layer, the Iceberg/Delta design) so
  * readers pin a generation instead of retrying; the store's
  * incremental `_COMPACTED` stamps are the natural place to grow one.
  */
object StaleScan {
  /** Deleted-under-the-reader signature, anywhere in the cause chain. */
  @annotation.tailrec
  def isStale(e: Throwable): Boolean =
    if (e == null) false
    else {
      val m = Option(e.getMessage).getOrElse("")
      if (e.isInstanceOf[java.io.FileNotFoundException] ||
        m.contains("FAILED_READ_FILE") ||
        m.contains("does not exist. It is possible the underlying files"))
        true
      else isStale(if (e.getCause eq e) null else e.getCause)
    }

  /** Run `f`, re-running it (fresh plan → fresh file listing) up to
    * `attempts` extra times when it failed on a stale scan.
    */
  def retry[A](label: String, attempts: Int = 3)(f: => A): A = {
    var tried = 0
    while (true) {
      try return f
      catch {
        case e: Throwable if isStale(e) && tried < attempts =>
          tried += 1
          System.err.println(s"[graft] $label raced a partition rewrite " +
            s"(stale file listing) — re-planning, attempt $tried/$attempts")
          Thread.sleep(50L * tried)
      }
    }
    sys.error("unreachable")
  }
}
