package graft.streaming

import graft.dsl.Tsdb
import graft.lineprotocol.LpIngest
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming line-protocol ingest (SURVEY.md §7 step 5 — the
  * /api/v2/write streaming path).
  *
  * Any streaming `Dataset[String]` source (file dir, socket, Kafka)
  * flows through the same executor-side parser as the batch path, then
  * lands in the bucket store via `foreachBatch` — each micro-batch is
  * one append-only write (no read-modify-write), and last-write-wins
  * dedup stays a read/compaction-time concern exactly like the batch
  * path, so the streaming sink adds no new merge machinery.
  */
final class StreamIngest(tsdb: Tsdb) {

  /** Start ingesting a streaming Dataset of raw LP lines into `bucket`.
    *
    * Small-file discipline (the TSM-compaction analogue): each batch
    * lands via [[graft.store.BucketStore.writeSized]] — one file per
    * `rowsPerFile` rows instead of one per shuffle partition — and
    * every `compactEvery` micro-batches a
    * [[graft.store.BucketStore.compactFragmented]] sweep rewrites any
    * day partition that crossed `maxFilesPerPartition`. Steady-state
    * files per partition are therefore bounded at `maxFilesPerPartition
    * + compactEvery` for the stream's whole lifetime; without the
    * cadence a long-running ingest accumulates files without bound and
    * the downstream file-stream reader drains them 64 at a time
    * (the 99-batch floor PERF.md documents). The sweep keys off the
    * deterministic micro-batch id, so a checkpoint restart keeps the
    * cadence aligned. `compactEvery = 0` disables the sweep — REQUIRED
    * while a FileStreamSource tails this same bucket live (see
    * compactFragmented's scaladoc for why a rewrite breaks a tailing
    * file source).
    *
    * @param defaultTimeNs server-assigned time for lines without a
    *   timestamp; resolved once per micro-batch for determinism.
    */
  def start(
      bucket: String,
      lines: Dataset[String],
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      defaultTimeNs: () => Long = () => System.currentTimeMillis() * 1000000L,
      rowsPerFile: Long = 1000000L,
      compactEvery: Int = 8,
      maxFilesPerPartition: Int = 16
  ): StreamingQuery = {
    require(lines.isStreaming, "use Tsdb.writeLp for batch input")
    // runtime enforcement of the tailing constraint (r16): while this
    // ingest's sweep cadence is live, a DownsampleTask/CQ on the same
    // bucket REFUSES to start (it would double-count rewritten files);
    // and if a tail was registered first, the sweep itself skips the
    // bucket loudly inside compactFragmented. Registered BEFORE start
    // (provisional liveness bound to the query once it exists) so a
    // task starting concurrently cannot slip between our start() and a
    // later registration; a failed start aborts the entry.
    @volatile var q0: Option[StreamingQuery] = None
    @volatile var aborted = false
    if (compactEvery > 0)
      tsdb.store.registerCompactionCadence(bucket,
        s"ingest:${java.util.UUID.randomUUID()}",
        () => !aborted && q0.forall(_.isActive))
    try {
      val q = lines.writeStream
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(trigger)
        .foreachBatch { (batch: Dataset[String], batchId: Long) =>
          val parsed: DataFrame = LpIngest.parse(batch, defaultTimeNs())
          tsdb.store.writeSized(bucket, parsed, rowsPerFile)
          if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1)
            tsdb.store.compactFragmented(bucket, maxFilesPerPartition)
          ()
        }
        .start()
      q0 = Some(q)
      q
    } catch { case e: Throwable => aborted = true; throw e }
  }

  /** File-directory LP source: every new text file dropped into `dir`
    * is parsed and ingested (the edge-friendly handoff the reference's
    * deployment pattern implies: producers write files/lines, the
    * engine tails them).
    */
  def startFromDir(
      bucket: String,
      dir: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      compactEvery: Int = 8,
      maxFilesPerPartition: Int = 16,
      /** Seen-files-log bound (Spark `maxFileAge`) — same driver-memory
        * rationale as [[DownsampleTask.start]]'s parameter. Unlike a
        * tailed BUCKET, this staging dir could additionally use Spark's
        * `cleanSource=delete` (the files are a handoff queue, not the
        * store) — left off by default because a crash between a batch's
        * commit and its cleanup re-lists the dir on restart, and
        * operators often want the drop-dir audit trail; producers that
        * want cleanup should age files out themselves.
        */
      maxFileAge: String = "7d"
  ): StreamingQuery = {
    val lines = tsdb.spark.readStream
      .option("maxFileAge", maxFileAge).textFile(dir)
    start(bucket, lines, checkpoint, trigger,
      compactEvery = compactEvery, maxFilesPerPartition = maxFilesPerPartition)
  }
}
