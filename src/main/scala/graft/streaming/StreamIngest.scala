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
    * @param defaultTimeNs server-assigned time for lines without a
    *   timestamp; resolved once per micro-batch for determinism.
    */
  def start(
      bucket: String,
      lines: Dataset[String],
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      defaultTimeNs: () => Long = () => System.currentTimeMillis() * 1000000L
  ): StreamingQuery = {
    require(lines.isStreaming, "use Tsdb.writeLp for batch input")
    lines.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[String], _: Long) =>
        val parsed: DataFrame = LpIngest.parse(batch, defaultTimeNs())
        tsdb.store.write(bucket, parsed)
      }
      .start()
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
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery = {
    val lines = tsdb.spark.readStream.textFile(dir)
    start(bucket, lines, checkpoint, trigger)
  }
}
