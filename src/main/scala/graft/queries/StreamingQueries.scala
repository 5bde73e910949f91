package graft.queries

import graft.dsl.Tsdb
import graft.streaming.{DownsampleTask, StreamIngest}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Gate entry for the STREAMING path: events → line-protocol text files
  * → [[StreamIngest]] (Structured Streaming foreachBatch into the
  * bucket store) → [[DownsampleTask]] (streaming windowed aggregate
  * into a second bucket) → read back — hash-compared to the same
  * DuckDB hourly aggregate the batch path matches. Proves end-to-end
  * batch/stream equivalence, not just spec-level behavior.
  *
  * Determinism notes:
  *  - every LP line carries its explicit ns timestamp (ts_ns), so the
  *    server-assigned default never fires;
  *  - `Double.toString → LP parse` round-trips values bit-exactly;
  *  - lateness is wider than the corpus's whole time span, so no point
  *    is ever watermark-dropped regardless of file/batch order;
  *  - repeated runs use fresh temp warehouses/checkpoints (the driver
  *    may invoke a gate more than once in a session).
  */
object StreamingQueries {
  import QueryUtil._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_downsample" -> ((s, dir) => {
      val wh = Files.createTempDirectory("graft-stream-gate")
      val tsdb = Tsdb(s, wh.toString)
      tsdb.catalog.createOrg("greengrass")
      tsdb.catalog.createBucket("raw", "greengrass")
      tsdb.catalog.createBucket("hourly", "greengrass")

      // events as /api/v2/write wire format: one LP line per point
      val lpDir = Files.createTempDirectory("graft-stream-lp").toString
      events(s, dir).select(concat(
        lit("events,event_type="), col("event_type"),
        lit(",user_id="), col("user_id").cast("string"),
        lit(" value="), col("value").cast("string"),
        lit(" "), col("ts_ns").cast("string")).as("line"))
        .write.mode("overwrite").text(lpDir)

      val ingest = new StreamIngest(tsdb).startFromDir("raw", lpDir,
        Files.createTempDirectory("graft-stream-cp-ingest").toString)
      ingest.awaitTermination(600000)

      val task = new DownsampleTask(tsdb).start(
        source = "raw", target = "hourly", every = "1 hour", fn = sum,
        lateness = "60 days", // > corpus span: nothing is ever late-dropped
        checkpoint = Files.createTempDirectory("graft-stream-cp-task").toString)
      task.awaitTermination(600000)

      tsdb.from("hourly").toDF
        .filter(col("measurement") === "events")
        .select(col("time").as("wend"),
          col("tags.event_type").as("event_type"),
          col("tags.user_id").cast("long").as("user_id"),
          r4(col("value_f")).as("sum_v"))
        .orderBy("event_type", "user_id", "wend")
    }),

    // Flux TEXT task body `from |> range |> aggregateWindow |> to` —
    // the canonical InfluxDB scheduled-task pipeline, driven entirely
    // through the text front-end: the downsample materializes into a
    // second bucket via the to() verb, then a second text query reads
    // the written bucket back. Hash-matched to the same 6h aggregate
    // computed by DuckDB over the raw events.
    "flux_to" -> ((s, dir) => {
      val wh = Files.createTempDirectory("graft-fluxto-gate")
      val tsdb = Tsdb(s, wh.toString)
      tsdb.catalog.createOrg("greengrass")
      tsdb.catalog.createBucket("raw", "greengrass")
      tsdb.catalog.createBucket("agg", "greengrass")
      tsdb.store.write("raw", events(s, dir).select(
        lit("events").as("measurement"),
        map(lit("event_type"), col("event_type"),
          lit("user_id"), col("user_id").cast("string")).as("tags"),
        lit("value").as("field"),
        col("value").cast("double").as("value_f"),
        lit(null).cast("long").as("value_i"),
        lit(null).cast("long").as("value_u"),
        lit(null).cast("string").as("value_s"),
        lit(null).cast("boolean").as("value_b"),
        col("ts").as("time"),
        col("ts_ns").as("time_ns")))
      val src = graft.flux.FluxEval.Source(
        resolve = b => tsdb.from(b),
        rename = Map("_time" -> "time", "_value" -> "value_f",
          "_measurement" -> "measurement", "_field" -> "field"),
        write = Some((b, d) => tsdb.to(b, d)))
      graft.flux.FluxEval.run(
        """from(bucket: "raw")
          ||> range(start: 2024-01-08T00:00:00Z, stop: 2024-01-15T00:00:00Z)
          ||> aggregateWindow(every: 6h, fn: sum)
          ||> to(bucket: "agg")""".stripMargin, src).count()
      graft.flux.FluxEval.run("""from(bucket: "agg")""", src)
        .select(col("_time").as("wend"), r4(col("_value")).as("sum_v"))
        .orderBy("wend")
    })
  )

  private def w(s: String) = s.stripMargin

  val oracle: Map[String, String] = Map(
    // the downsampled bucket must equal the batch hourly aggregate:
    // one row per (series, window), time = window END like aggregateWindow
    "stream_downsample" -> w(
      """SELECT time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS wend,
        |  event_type, user_id, round(sum(value), 4) AS sum_v
        |FROM events
        |GROUP BY 1, 2, 3 ORDER BY 2, 3, 1"""),
    "flux_to" -> w(
      """SELECT time_bucket(INTERVAL '6 hours', ts) + INTERVAL '6 hours' AS wend,
        |  round(sum(value), 4) AS sum_v
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-15 00:00:00'
        |GROUP BY 1 ORDER BY 1""")
  )
}
