package graft.streaming

import graft.dsl.Tsdb
import graft.model.Point
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{DateType, LongType, StructType}

/** Continuous downsampling — the Spark-native form of an InfluxDB
  * *task* (`option task = {every: …}` + `aggregateWindow` + `to()`):
  * a streaming windowed aggregate over a source bucket, materialized
  * into a target bucket.
  *
  * Semantics & scale:
  *  - the source is the bucket's parquet directory as a file stream —
  *    ingest appends become micro-batches, no second queue needed.
  *    COMPACTION CONSTRAINT: a FileStreamSource tracks seen file
  *    PATHS, so the source bucket must not be compacted while this
  *    task runs (rewritten files re-surface as new → double counts;
  *    retired files break pending batches). Run the ingest into a
  *    tailed bucket with `compactEvery = 0` and exclude the bucket
  *    from the Maintenance cycle, compacting at task pause points —
  *    the hot/cold shard discipline of the pinned engine's TSM
  *    compactor. (The assembled engine's scheduled Flux tasks re-run
  *    as BATCH queries per schedule and are compaction-safe; this
  *    constraint applies only to the file-tail twin.)
  *  - watermark bounds state: windows older than `lateness` are evicted.
  *    InfluxDB tasks simply re-run over a `range()` — unbounded
  *    lateness — so we run in update mode and version each window
  *    emission into the target bucket, where last-write-wins dedup
  *    keeps the latest refinement (SURVEY.md §2B: documented
  *    divergence — lateness beyond the watermark is bounded on the
  *    streaming path; the batch path stays exact);
  *  - group key = (measurement, field, tags-json): Spark cannot group
  *    by a MapType, so tags travel as canonical JSON and are rebuilt
  *    on write.
  */
final class DownsampleTask(tsdb: Tsdb) {

  private def rawStreamSchema: StructType =
    StructType(Point.schema.fields)
      .add("_ingest_seq", LongType).add("dt", DateType)

  /** Start the task: aggregate `fn(value_f)` per (series, `every`
    * window) from `source` into `target`. Downsampled points carry
    * `time` = window end, like Flux `aggregateWindow`.
    *
    * The optional scoping parameters carry the v1 CONTINUOUS QUERY
    * form (`SELECT mean(f) INTO m2 FROM m1 GROUP BY time(1h)`):
    * `measurement`/`fieldName` filter the source stream to one series
    * family, `intoMeasurement`/`intoField` relabel the output. When
    * source == target (v1 CQs write into the same database), the
    * measurement filter also keeps the task's own output out of its
    * input — downsampled points re-enter the file stream but are
    * dropped at the first filter, so there is no feedback loop.
    */
  def start(
      source: String,
      target: String,
      every: String,
      fn: Column => Column,
      lateness: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      measurement: Option[String] = None,
      fieldName: Option[String] = None,
      /** Extra pushdown over the raw stream (e.g. a CQ WHERE's tag
        * predicate) — applied with the measurement/field scope before
        * the windowed aggregate.
        */
      extraFilter: Option[Column] = None,
      intoMeasurement: Option[String] = None,
      intoField: Option[String] = None,
      /** Bound on the source's SEEN-FILES log (Spark `maxFileAge`).
        * The FileStreamSource tracks every file path it has processed
        * and purges entries older than this, so a months-long tail
        * holds O(window) driver memory instead of O(lifetime files) —
        * the r16 soak's one non-flat curve (24 KB/batch, Spark's own
        * log, benign at 500 batches, unbounded without this). Spark's
        * default is 7d; pass a shorter age for high-file-rate buckets.
        * TRADE-OFF: a file whose modification time falls more than
        * maxFileAge behind the newest seen file is IGNORED at
        * discovery — safe while the task runs (appends carry fresh
        * mtimes), but a task restarted after an outage longer than
        * this skips the gap; size it to the longest tolerated outage.
        * Spark's other remedy, `cleanSource` (delete/archive processed
        * files), is deliberately NOT exposed: on a graft bucket the
        * tailed files ARE the LWW store — deleting a processed file
        * deletes the data it holds, and archiving moves it out of the
        * batch read path. cleanSource is only sound for ingest STAGING
        * directories ([[StreamIngest]]'s line-protocol drop dir).
        */
      maxFileAge: String = "7d"
  ): StreamingQuery = {
    // runtime half of the COMPACTION CONSTRAINT above: refuse to tail a
    // bucket whose ingest stream is actively rewriting it — silently
    // starting would double-count every rewritten row
    // register the tail BEFORE starting (provisional liveness, bound to
    // the query once it exists): the FileStreamSource lists files at
    // start, so a sweep racing the gap between start() and a
    // post-start registration could rewrite what the source just saw.
    // The cadence check runs AFTER the provisional registration so the
    // two guards cannot interleave past each other: whichever side
    // registers first is visible to the other's check.
    @volatile var q0: Option[StreamingQuery] = None
    @volatile var aborted = false
    val tailName = s"downsample:$target:${java.util.UUID.randomUUID()}"
    tsdb.store.registerTail(source, tailName,
      () => !aborted && q0.forall(_.isActive))
    val cadences = tsdb.store.liveCompactionCadences(source)
    if (cadences.nonEmpty) {
      aborted = true
      throw new graft.store.BucketStore.TailConflictException(
        s"DownsampleTask on '$source' refused: ingest compaction cadence(s) " +
          s"${cadences.mkString(", ")} actively rewrite this bucket's files, " +
          "which a FileStreamSource cannot survive. Restart the ingest with " +
          "compactEvery = 0 (service path: GRAFT_INGEST_COMPACT_EVERY=0) or " +
          "stop it before starting the task.")
    }
    // one-shot rewrites (compact/delete/retention sweeps) are transient:
    // a sweep that will SKIP (it sees our provisional tail) clears its
    // intent in milliseconds, and a real in-flight rewrite ends — wait
    // these out instead of prescribing the cadence remedy for them
    // any throw from here on (incl. InterruptedException out of the
    // sleep) must set aborted, or the provisional tail registered above
    // stays live forever and permanently pins the bucket
    try {
      val waitUntil = System.nanoTime() + 30L * 1000000000L
      var rewrites = tsdb.store.liveRewrites(source)
      while (rewrites.nonEmpty && System.nanoTime() < waitUntil) {
        Thread.sleep(50L)
        rewrites = tsdb.store.liveRewrites(source)
      }
      if (rewrites.nonEmpty)
        throw new graft.store.BucketStore.TailConflictException(
          s"DownsampleTask on '$source' refused: in-progress partition " +
            s"rewrite(s) ${rewrites.mkString(", ")} did not finish within 30s — " +
            "retry once the rewrite completes.")
    } catch { case e: Throwable => aborted = true; throw e }
    try {
    val srcPath = tsdb.catalog.bucketPath(source).toString
    // a provisioned-but-never-written bucket has no directory yet (the
    // first append creates it); the FileStreamSource must start on an
    // empty dir, not die with PATH_NOT_FOUND (r18 service soak: a CQ
    // created right after provisioning)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcPath))
    val stream = tsdb.spark.readStream
      .schema(rawStreamSchema)
      .option("maxFilesPerTrigger", "64")
      .option("maxFileAge", maxFileAge)
      .parquet(srcPath)

    val scoped0 = measurement
      .map(m => stream.filter(col("measurement") === m)).getOrElse(stream)
    val scoped1 = fieldName
      .map(f => scoped0.filter(col("field") === f)).getOrElse(scoped0)
    val scoped = extraFilter.map(scoped1.filter).getOrElse(scoped1)

    val agged = scoped
      .withWatermark("time", lateness)
      .groupBy(
        window(col("time"), every).as("_w"),
        col("measurement"), col("field"),
        to_json(map_entries(col("tags"))).as("_tags_json"))
      .agg(fn(col("value_f")).as("value_f"), count(lit(1)).as("_n"))

    val q = agged.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val canon = batch
          .withColumn("time", col("_w.end"))
          .withColumn("time_ns", unix_micros(col("time")) * 1000L)
          .withColumn("tags",
            map_from_entries(from_json(col("_tags_json"),
              org.apache.spark.sql.types.DataTypes.createArrayType(
                new StructType().add("key", "string").add("value", "string")))))
          .withColumn("value_i", lit(null).cast("long"))
          .withColumn("value_u", lit(null).cast("long"))
          .withColumn("value_s", lit(null).cast("string"))
          .withColumn("value_b", lit(null).cast("boolean"))
          .withColumn("measurement",
            intoMeasurement.map(lit).getOrElse(col("measurement")))
          .withColumn("field", intoField.map(lit).getOrElse(col("field")))
          .select(Point.columns.map(col): _*)
        // size-targeted write: an update-mode window batch is usually
        // tiny (refined windows only) — one file, not one per shuffle
        // partition; a backfill batch scales its file count with rows
        tsdb.store.writeSized(target, canon)
        ()
      }
      .start()
    // bind the provisional registration to the real query: from here
    // liveness follows q.isActive, so a finished AvailableNow run or a
    // stopped task frees the bucket with no unregister call
    q0 = Some(q)
    q
    } catch {
      // a failed start must not leave the provisional entry pinning
      // the bucket against compaction forever
      case e: Throwable => aborted = true; throw e
    }
  }
}
