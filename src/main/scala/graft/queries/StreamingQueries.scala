package graft.queries

import graft.dsl.Tsdb
import graft.streaming.{DownsampleTask, StreamDedup, StreamIngest}
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

    // Merge-on-read streaming near-dedup (r15): the corpus seed is 60%
    // of the documents, four 10% "micro-batches" fold sequentially
    // through nearDedupBatchMor — each batch probes the parquet-backed
    // index (fps + df delta log), survivors are appended before the
    // next batch probes. The kept set is hash-compared to a DuckDB
    // fold that replays the same four stages (df cap re-measured over
    // the grown index at every stage), so the growing-index semantics
    // — not just one probe — are oracle-pinned.
    "stream_mor_dedup" -> ((s, dir) => {
      val docs = QueryUtil.documents(s, dir)
      val mor = new StreamDedup.NearDupMorIndex(s,
        Files.createTempDirectory("graft-mor-gate").toString)
      mor.seed(docs.filter(col("doc_id") % 10 < 6), "doc_id", "text")
      (6 to 9).map { b =>
        StreamDedup.nearDedupBatchMor(
          docs.filter(col("doc_id") % 10 === b), mor, "doc_id", "text",
          batchId = b - 6, minShared = 15, maxDf = 25)
          .select(col("doc_id").cast("long").as("doc_id"))
          .localCheckpoint()
      }.reduce(_ unionByName _).orderBy("doc_id")
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
    }),

    // STREAMING sessionization: the same gap-split sessions the batch
    // `sessionize` gate pins, computed by Structured Streaming's
    // session_window state machine over a file stream — proving the
    // 100 TB streaming path (watermarked keyed session state, append
    // emission on watermark passage) agrees with the batch oracle.
    // session_window merges events whose ts gap is STRICTLY below the
    // 6h gap duration; the oracle splits on gap >= 6h to match (the
    // corpus has no exact-boundary gap, but the SQL states the true
    // semantics). Append mode only emits a session once the watermark
    // passes its close, so after draining the corpus two far-future
    // sentinel rows are fed in separate micro-batches: the first
    // advances the watermark past every real session, the second forces
    // the batch in which that watermark evicts and emits them. The
    // sentinel user (-1) is filtered from the result; its own session
    // stays unemitted state, which is fine.
    "stream_sessionize" -> ((s, dir) => {
      val srcDir = Files.createTempDirectory("graft-sess-src").toString
      val ev0 = events(s, dir).select(col("user_id"), col("ts"), col("value"))
      ev0.repartition(4).write.mode("overwrite").parquet(srcDir)

      val qn = "graft_sessions_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val q = s.readStream.schema(ev0.schema).parquet(srcDir)
        .withWatermark("ts", "6 hours")
        .groupBy(col("user_id"), session_window(col("ts"), "6 hours"))
        .agg(count(lit(1)).as("n"), r4(sum(col("value"))).as("sum_v"))
        .select(col("user_id"), col("session_window.start").as("s_start"),
          col("n"), col("sum_v"))
        .writeStream.format("memory").queryName(qn).outputMode("append")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-sess-cp").toString)
        .start()
      q.processAllAvailable()
      import s.implicits._
      for (year <- Seq("2030", "2031")) { // separate batches on purpose
        Seq((-1L, java.sql.Timestamp.valueOf(s"$year-01-01 00:00:00"), 0.0))
          .toDF("user_id", "ts", "value")
          .write.mode("append").parquet(srcDir)
        q.processAllAvailable()
      }
      q.stop()
      s.table(qn).filter(col("user_id") >= 0).orderBy("user_id", "s_start")
    }),

    // STREAMING quantile monitoring: the native KLL sketch aggregate
    // (functions/KllSketch.scala) running INSIDE Structured Streaming
    // state — per (event_type, day) windowed quantiles, append-emitted
    // on watermark passage, hash-matched to the exact batch ranks.
    // Same sentinel-flush pattern as stream_sessionize; k exceeds any
    // window's row count, so the sketch is in exact mode and the
    // oracle is plain row_number arithmetic.
    "stream_quantiles" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{array, call_function, posexplode, window}
      val srcDir = Files.createTempDirectory("graft-squant-src").toString
      val ev0 = events(s, dir).select(col("event_type"), col("ts"), col("value"))
      ev0.repartition(4).write.mode("overwrite").parquet(srcDir)

      val qn = "graft_squant_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val q = s.readStream.schema(ev0.schema).parquet(srcDir)
        .withWatermark("ts", "1 day")
        .groupBy(col("event_type"), window(col("ts"), "1 day"))
        .agg(call_function("graft_kll_quantiles", col("value"),
          array(lit(0.5), lit(0.75)), lit(32768)).as("qv"))
        .select(col("event_type"), col("window.start").as("wstart"), col("qv"))
        .writeStream.format("memory").queryName(qn).outputMode("append")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-squant-cp").toString)
        .start()
      q.processAllAvailable()
      import s.implicits._
      for (year <- Seq("2030", "2031")) { // advance watermark, then flush
        Seq(("__sentinel__", java.sql.Timestamp.valueOf(s"$year-01-01 00:00:00"), 0.0))
          .toDF("event_type", "ts", "value")
          .write.mode("append").parquet(srcDir)
        q.processAllAvailable()
      }
      q.stop()
      s.table(qn).filter(col("event_type") =!= "__sentinel__")
        .select(col("event_type"), col("wstart"),
          posexplode(col("qv")).as(Seq("qi", "qv")))
        .orderBy("event_type", "wstart", "qi")
    }),

    // STREAMING sketch store: foreachBatch appends one KLL sketch row
    // per (event_type, micro-batch) to a parquet metrics store — the
    // continuously-maintained profile a 100 TB ingest keeps — and the
    // final quantile query MERGES the store instead of rescanning
    // events. maxFilesPerTrigger=1 forces multiple batches, so the
    // store genuinely accumulates increments; exact mode makes the
    // merged answer equal the direct whole-table ranks.
    "stream_kll_store" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{array, call_function, posexplode}
      val srcDir = Files.createTempDirectory("graft-kstore-src").toString
      val storeDir = Files.createTempDirectory("graft-kstore-out").toString
      val ev0 = events(s, dir).select(col("event_type"), col("value"))
      ev0.repartition(4).write.mode("overwrite").parquet(srcDir)

      val q = s.readStream.schema(ev0.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.groupBy("event_type")
            .agg(call_function("graft_kll_sketch", col("value"), lit(32768)).as("sk"))
            .write.mode("append").parquet(storeDir)
        }
        .option("checkpointLocation",
          Files.createTempDirectory("graft-kstore-cp").toString)
        .start()
      q.processAllAvailable()
      q.stop()

      s.read.parquet(storeDir)
        .groupBy("event_type")
        .agg(call_function("graft_kll_merge", col("sk"),
          array(lit(0.5), lit(0.875))).as("qv"))
        .select(col("event_type"), posexplode(col("qv")).as(Seq("qi", "qv")))
        .orderBy("event_type", "qi")
    }),

    // STREAMING heavy hitters: the SpaceSaving sketch in streaming
    // state — top-5 users per UTC day, exact mode (capacity over
    // cardinality), sentinel-flushed, hash-matched to batch ranks.
    // Streaming distinct-user monitoring: one HLL per (event_type,
    // micro-batch) appended to a parquet metrics store; the read-side
    // max-merge is register-identical to a direct build over every
    // row seen (the HLL merge property), so the oracle is the same
    // direct-estimator SQL as the batch hll gates — batch/stream
    // equivalence for approximate distinct, KBs of state per batch.
    "stream_hll_store" -> ((s, dir) => {
      import org.apache.spark.sql.functions.call_function
      val srcDir = Files.createTempDirectory("graft-hstore-src").toString
      val storeDir = Files.createTempDirectory("graft-hstore-out").toString
      val ev0 = events(s, dir).select(col("event_type"), col("user_id"))
      ev0.repartition(4).write.mode("overwrite").parquet(srcDir)

      val q = s.readStream.schema(ev0.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.groupBy("event_type")
            .agg(call_function("graft_hll_bytes", col("user_id"), lit(12)).as("sk"))
            .write.mode("append").parquet(storeDir)
        }
        .option("checkpointLocation",
          Files.createTempDirectory("graft-hstore-cp").toString)
        .start()
      q.processAllAvailable()
      q.stop()

      s.read.parquet(storeDir)
        .groupBy("event_type")
        .agg(r4(call_function("graft_hll_merge_count", col("sk"))).as("hll"))
        .orderBy("event_type")
    }),

    // STREAMING CUSUM: the live drift detector with batch-trained
    // moments — one double of state per series across micro-batches.
    // The oracle is the SAME recursive-CTE replay as cusum_drift:
    // batch/stream equivalence for the sequential recurrence itself.
    "stream_cusum" -> ((s, dir) => {
      val srcDir = Files.createTempDirectory("graft-scusum-src").toString
      val ev0 = events(s, dir)
        .withColumn("ts_us", expr("ts_ns div 1000"))
        .select("event_type", "ts_us", "value")
      ev0.repartition(4).write.mode("overwrite").parquet(srcDir)
      val params = ev0.groupBy("event_type").agg(
        round(avg(col("value")), 4).as("mu"),
        round(stddev_pop(col("value")), 4).as("sg"))

      val qn = "graft_scusum_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val q = graft.streaming.StreamAnomaly.cusumStream(
        s.readStream.schema(ev0.schema).parquet(srcDir), params,
        "event_type", "ts_us", "value")
        .writeStream.format("memory").queryName(qn).outputMode("append")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-scusum-cp").toString)
        .start()
      q.processAllAvailable()
      q.stop()
      s.table(qn)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("alarm"), 1L).otherwise(0L)).as("n_alarms"),
          r4(max(col("cusum"))).as("max_s"))
        .orderBy("event_type")
    }),

    // STREAMING BURST: the 1-bit hysteresis automaton surviving REAL
    // micro-batch boundaries — the source is four time-quartile files
    // written sequentially (disjoint ts ranges, distinct mtimes) and
    // fed one per trigger, so the state genuinely crosses four
    // batches in (ts, id) order. Roll-up and oracle are the batch
    // burst_detect's: batch/stream equivalence for the automaton.
    "stream_burst" -> ((s, dir) => {
      val srcDir = Files.createTempDirectory("graft-sburst-src").toString
      val ev0 = events(s, dir)
        .withColumn("ts_us", expr("ts_ns div 1000"))
        .select("event_type", "ts_us", "event_id", "value")
      val Array(t1, t2, t3) =
        ev0.stat.approxQuantile("ts_us", Array(0.25, 0.5, 0.75), 0.0)
      val bounds = Seq((Long.MinValue, t1.toLong), (t1.toLong, t2.toLong),
        (t2.toLong, t3.toLong), (t3.toLong, Long.MaxValue))
      bounds.foreach { case (lo, hi) =>
        ev0.where(col("ts_us") >= lo && col("ts_us") < hi)
          .coalesce(1).write.mode("append").parquet(srcDir)
      }
      val params = ev0.groupBy("event_type").agg(
        round(avg(col("value")), 4).as("mu"),
        round(stddev_pop(col("value")), 4).as("sg"))

      val qn = "graft_sburst_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val q = graft.streaming.StreamAnomaly.burstStream(
        s.readStream.schema(ev0.schema)
          .option("maxFilesPerTrigger", 1).parquet(srcDir),
        params, "event_type", "ts_us", "event_id", "value")
        .writeStream.format("memory").queryName(qn).outputMode("append")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-sburst-cp").toString)
        .start()
      q.processAllAvailable()
      q.stop()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("ts_us", "event_id")
      s.table(qn)
        .withColumn("enter",
          when(col("in_burst") === 1.0 &&
            coalesce(lag(col("in_burst"), 1).over(w), lit(0.0)) === 0.0, 1L)
            .otherwise(0L))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("in_burst").cast("long")).as("n_burst"),
          sum(col("enter")).as("n_episodes"))
        .orderBy("event_type")
    }),

    // STREAMING SEASONAL SCORING: stateless stream-static join against
    // the batch-trained slot baseline, broadcast into each micro-batch
    // — same roll-up and oracle as the batch seasonal_baseline gate.
    "stream_seasonal" -> ((s, dir) => {
      val srcDir = Files.createTempDirectory("graft-sseas-src").toString
      val ev0 = events(s, dir)
        .withColumn("ts_us", expr("ts_ns div 1000"))
        .select("event_type", "ts_us", "value")
      ev0.repartition(4).write.mode("overwrite").parquet(srcDir)
      val baseline = graft.operators.AnomalyOps.seasonalBaseline(
          ev0, Seq("event_type"), "ts_us", "value")
        .select("event_type", "how", "mu", "sg").distinct()

      val qn = "graft_sseas_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val q = graft.streaming.StreamAnomaly.seasonalStream(
        s.readStream.schema(ev0.schema)
          .option("maxFilesPerTrigger", 1).parquet(srcDir),
        baseline, "event_type", "ts_us", "value")
        .writeStream.format("memory").queryName(qn).outputMode("append")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-sseas-cp").toString)
        .start()
      q.processAllAvailable()
      q.stop()
      s.table(qn)
        .groupBy("event_type", "how", "mu", "sg")
        .agg(count(lit(1)).as("n"),
          sum(when(col("flag"), 1L).otherwise(0L)).as("n_flag"))
        .select("event_type", "how", "n", "mu", "sg", "n_flag")
        .orderBy("event_type", "how")
    }),

    // STREAMING MAD: batch-trained reference medians, per-series KLL
    // sketch of absolute deviations in flatMapGroupsWithState state
    // (O(k·log n) per series). maxFilesPerTrigger=1 forces four
    // micro-batches; the final emitted (n_seen, mad) row per series
    // must equal the one-shot computation because the exact-regime
    // sketch state is a batch-boundary-invariant multiset. Flags are
    // recomputed over the static rows against that final mad; the
    // oracle replays med (interpolated, like anomaly_mad) and mad
    // (disc rank — the KLL ceil(q·n) arithmetic) in SQL.
    "stream_mad" -> ((s, dir) => {
      val srcDir = Files.createTempDirectory("graft-smad-src").toString
      val ev0 = events(s, dir)
        .withColumn("ts_us", expr("ts_ns div 1000"))
        .select("event_type", "ts_us", "value")
      ev0.repartition(4).write.mode("overwrite").parquet(srcDir)
      val med = ev0.groupBy("event_type")
        .agg(percentile(col("value"), lit(0.5)).as("med"))

      val qn = "graft_smad_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val q = graft.streaming.StreamAnomaly.madStream(
        s.readStream.schema(ev0.schema)
          .option("maxFilesPerTrigger", 1).parquet(srcDir),
        med, "event_type", "ts_us", "value")
        .writeStream.format("memory").queryName(qn).outputMode("append")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-smad-cp").toString)
        .start()
      q.processAllAvailable()
      q.stop()
      // the row with the largest n_seen per series = the full-data
      // sketch snapshot (ties are identical rows, so max_by is stable)
      val madF = s.table(qn).groupBy("event_type")
        .agg(max_by(col("mad"), col("n_seen")).as("mad_kll"))
      ev0.join(med, "event_type").join(madF, "event_type")
        .withColumn("abs_dev", abs(col("value") - col("med")))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("abs_dev") > lit(3.0) * col("mad_kll"), 1L)
            .otherwise(0L)).as("n_anom"),
          r4(min(col("med"))).as("med"), r4(min(col("mad_kll"))).as("mad"))
        .orderBy("event_type")
    }),

    // STREAMING PSI drift monitor: the second half of the time range
    // streams in (maxFilesPerTrigger=1 forces multiple micro-batches);
    // the current-side bucket histogram is STREAMING AGGREGATION STATE
    // (complete-mode groupBy — Spark keeps one counter per bucket, the
    // monitor's whole state is histogram-sized regardless of stream
    // length). The final snapshot scored against the static first-half
    // reference must equal the one-shot batch computation, so the
    // oracle IS psi_drift's oracle.
    "stream_psi" -> ((s, dir) => {
      val srcDir = Files.createTempDirectory("graft-spsi-src").toString
      val ev0 = events(s, dir)
        .withColumn("tus", expr("ts_ns div 1000")).select("tus", "value")
      val mid = ev0.agg(expr("(min(tus) + max(tus)) div 2").as("mid"))
      val e2 = ev0.crossJoin(broadcast(mid))
      val cur = e2.filter(col("tus") >= col("mid")).select("tus", "value")
      cur.repartition(4).write.mode("overwrite").parquet(srcDir)

      val qn = "graft_spsi_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val q = s.readStream.schema(cur.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
        .select(graft.operators.DriftOps
          .bucketOf(col("value"), 0.0, 25.0, 20).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n_cur"))
        .writeStream.format("memory").queryName(qn).outputMode("complete")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-spsi-cp").toString)
        .start()
      q.processAllAvailable()
      q.stop()

      val refHist = e2.filter(col("tus") < col("mid"))
        .select(graft.operators.DriftOps
          .bucketOf(col("value"), 0.0, 25.0, 20).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n_ref"))
      graft.operators.DriftOps.psiOfHistograms(refHist, s.table(qn))
        .select(col("bucket"), col("n_ref"), col("n_cur"),
          r4(col("p_ref")).as("p_ref"), r4(col("p_cur")).as("p_cur"),
          r4(col("contrib")).as("contrib"))
        .orderBy("bucket")
    }),

    // STREAMING ordered funnel: set-once per-user step state — the
    // live funnel must agree exactly with the batch recompute, so the
    // oracle IS funnel_steps' oracle. Snapshots fold with max()
    // (set-once ⇒ max over snapshots = final value).
    "stream_funnel" -> ((s, dir) => {
      val srcDir = Files.createTempDirectory("graft-sfunnel-src").toString
      val ev0 = events(s, dir).select("user_id", "event_type", "ts_ns")
      ev0.repartition(4).write.mode("overwrite").parquet(srcDir)
      val qn = "graft_sfunnel_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val q = graft.streaming.StreamFunnel.funnelStream(
        s.readStream.schema(ev0.schema).parquet(srcDir),
        "user_id", "event_type", "ts_ns", Seq("view", "click", "purchase"))
        .writeStream.format("memory").queryName(qn).outputMode("append")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-sfunnel-cp").toString)
        .start()
      q.processAllAvailable()
      q.stop()
      s.table(qn)
        .select(col("user_id"),
          element_at(col("ts_steps"), 1).as("t1"),
          element_at(col("ts_steps"), 2).as("t2"),
          element_at(col("ts_steps"), 3).as("t3"))
        .groupBy("user_id")
        .agg(max("t1").as("t1"), max("t2").as("t2"), max("t3").as("t3"))
        .agg(count(col("t1")).as("n_view"), count(col("t2")).as("n_click"),
          count(col("t3")).as("n_purchase"),
          sum(col("t3") - col("t1")).as("conv_ns"))
    }),

    "stream_topk" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{call_function, posexplode, window}
      val srcDir = Files.createTempDirectory("graft-stopk-src").toString
      val ev0 = events(s, dir).select(col("user_id"), col("ts"))
      ev0.repartition(4).write.mode("overwrite").parquet(srcDir)

      val qn = "graft_stopk_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val q = s.readStream.schema(ev0.schema).parquet(srcDir)
        .withWatermark("ts", "1 day")
        .groupBy(window(col("ts"), "1 day"))
        .agg(call_function("graft_topk", col("user_id"), lit(5), lit(1024)).as("tk"))
        .select(col("window.start").as("wstart"), col("tk"))
        .writeStream.format("memory").queryName(qn).outputMode("append")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-stopk-cp").toString)
        .start()
      q.processAllAvailable()
      import s.implicits._
      for (year <- Seq("2030", "2031")) {
        Seq((-1L, java.sql.Timestamp.valueOf(s"$year-01-01 00:00:00")))
          .toDF("user_id", "ts")
          .write.mode("append").parquet(srcDir)
        q.processAllAvailable()
      }
      q.stop()
      s.table(qn)
        .filter(col("wstart") < java.sql.Timestamp.valueOf("2029-01-01 00:00:00"))
        .select(col("wstart"), posexplode(col("tk")).as(Seq("pos", "e")))
        .select(col("wstart"), col("pos"),
          col("e.item").as("item"), col("e.cnt").as("cnt"))
        .orderBy("wstart", "pos")
    }),

    // STREAM-STREAM interval join: purchases arriving on one stream
    // joined to the same user's clicks on another within a 1-hour
    // lookback — Spark's watermarked symmetric-hash join, the shape
    // behind "what did the user click just before buying" attribution
    // at ingest time. Both sides keep bounded state (watermark +
    // range condition bound how long a click must be retained); an
    // INNER join emits each pair exactly once as it matches, so after
    // processAllAvailable the memory sink holds exactly the batch
    // join's rows and the oracle is the plain DuckDB interval join.
    "stream_join" -> ((s, dir) => {
      val ev0 = events(s, dir).select("event_id", "user_id", "event_type", "ts")
      val pDir = Files.createTempDirectory("graft-sjoin-p").toString
      val cDir = Files.createTempDirectory("graft-sjoin-c").toString
      ev0.filter(col("event_type") === "purchase")
        .repartition(4).write.mode("overwrite").parquet(pDir)
      ev0.filter(col("event_type") === "click")
        .repartition(4).write.mode("overwrite").parquet(cDir)
      val schema = ev0.schema

      val p = s.readStream.schema(schema).option("maxFilesPerTrigger", 2)
        .parquet(pDir)
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
          col("ts").as("p_ts"))
        .withWatermark("p_ts", "90 days")
      val c = s.readStream.schema(schema).option("maxFilesPerTrigger", 2)
        .parquet(cDir)
        .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
          col("ts").as("c_ts"))
        .withWatermark("c_ts", "90 days")

      val qn = "graft_sjoin_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val q = p.join(c, expr(
          "p_user = c_user AND c_ts >= p_ts - INTERVAL 1 HOUR AND c_ts <= p_ts"))
        .writeStream.format("memory").queryName(qn).outputMode("append")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-sjoin-cp").toString)
        .start()
      q.processAllAvailable()
      q.stop()
      s.table(qn)
        .select(col("p_id"), col("c_id"),
          (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("dt_us"))
        .orderBy("p_id", "c_id")
    }),

    // STREAMING trend forecast: the stream maintains the forecast's
    // sufficient statistics — per-(series, hour) sums as complete-mode
    // aggregation state (bounded: one counter per series-hour) — and
    // the OLS fit + 6-step extrapolation runs on the final snapshot.
    // Hourly sums are grid-exact, so the incremental state equals the
    // batch aggregate bit-for-bit and the oracle IS forecast_linear's.
    "stream_forecast" -> ((s, dir) => {
      val srcDir = Files.createTempDirectory("graft-sfc-src").toString
      val ev0 = events(s, dir)
        .withColumn("h", expr("(ts_ns div 1000) div 3600000000"))
        .select("event_type", "h", "value")
      ev0.repartition(4).write.mode("overwrite").parquet(srcDir)
      val qn = "graft_sfc_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val q = s.readStream.schema(ev0.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
        .groupBy("event_type", "h")
        .agg(sum("value").as("hv"))
        .writeStream.format("memory").queryName(qn).outputMode("complete")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-sfc-cp").toString)
        .start()
      q.processAllAvailable()
      q.stop()
      // snapshot the sink before the fit: linearForecast self-joins its
      // input (per-series min), and the memory-table View resolves to
      // the SAME attribute ids on both sides of that join
      val snap = s.table(qn).localCheckpoint()
      graft.operators.SeriesMiningOps.linearForecast(
          snap, Seq("event_type"), "h", "hv", horizon = 6)
        .select(col("event_type"), col("step"), r4(col("slope")).as("slope"),
          r4(col("intercept")).as("intercept"), r4(col("yhat")).as("yhat"))
        .orderBy("event_type", "step")
    }),

    // Streaming incremental view maintenance: the cdc changeset
    // arrives as a STREAM of (kind B/A, group, measure) rows; each
    // micro-batch folds into the maintained view via
    // CdcOps.incrementalAgg (deltas commute, so the batch split is
    // irrelevant) and the final view must equal the batch recompute
    // over the merged table — the same oracle as view_maintain.
    // STREAMING CONNECTED COMPONENTS: the customer-chain edge set
    // split into four orderkey-quartile files, one per trigger; each
    // micro-batch CONTRACTS its edges through the persisted assignment
    // index, runs batch CC on the batch-bounded contracted graph, and
    // folds the remap back (StreamGraph). Chains span the quartile
    // boundaries, so components MUST merge across micro-batch
    // boundaries to land on the batch oracle's histogram.
    "stream_components" -> ((s, dir) => {
      val edges = GraphQueries.chainEdges(s, dir)
      val srcDir = Files.createTempDirectory("graft-scc-src").toString
      val Array(b1, b2, b3) =
        edges.stat.approxQuantile("dst", Array(0.25, 0.5, 0.75), 0.0)
      val bounds = Seq((Double.NegativeInfinity, b1), (b1, b2), (b2, b3),
        (b3, Double.PositiveInfinity))
      bounds.foreach { case (lo, hi) =>
        edges.where(col("dst").cast("double") >= lo &&
            col("dst").cast("double") < hi)
          .coalesce(1).write.mode("append").parquet(srcDir)
      }
      // merge-on-read delta log (r13 verdict #4): each trigger APPENDS
      // only (changed ∪ fresh) rows tagged with the batch version —
      // O(batch + touched components) written per trigger, never the
      // O(corpus) index rewrite. The read side reconstructs the index
      // as latest-version-per-id, exactly a Delta/Iceberg MOR scan.
      val idxRoot = Files.createTempDirectory("graft-scc-idx").toString
      def view(): DataFrame = {
        val files = new java.io.File(idxRoot).listFiles()
        if (files == null || files.isEmpty)
          graft.streaming.StreamGraph.emptyIndex(s)
        else {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy("id").orderBy(col("v").desc)
          s.read.parquet(idxRoot)
            .withColumn("rn", row_number().over(w))
            .where(col("rn") === 1).select("id", "cid")
        }
      }
      val q = s.readStream.schema(edges.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
        .writeStream
        .option("checkpointLocation",
          Files.createTempDirectory("graft-scc-cp").toString)
        .foreachBatch { (batch: DataFrame, id: Long) =>
          val d = graft.streaming.StreamGraph
            .componentsDelta(view(), batch, "src", "dst")
          d.changed.unionByName(d.fresh).withColumn("v", lit(id))
            .write.mode("append").parquet(idxRoot)
        }
        .start()
      q.processAllAvailable()
      q.stop()
      view()
        .groupBy(col("cid")).agg(count(lit(1)).as("size"))
        .orderBy("cid")
    }),

    "stream_view_maintain" -> ((s, dir) => {
      val o = orders(s, dir).select(col("o_orderkey").as("k"),
        col("o_orderpriority").as("prio"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val baseView = o.groupBy("prio")
        .agg(count(lit(1)).as("n"), sum(col("cents")).cast("long").as("cents"))
      val before = o.where(col("k") % 10 === 0 ||
          (col("k") % 17 === 0 && col("k") % 10 =!= 0))
        .select(col("prio"), col("cents"), lit("B").as("kind"))
      val afterU = orders(s, dir).where(col("o_orderkey") % 10 === 0)
        .select(col("o_orderpriority").as("prio"),
          round((col("o_totalprice") + 100.0) * 100).cast("long").as("cents"),
          lit("A").as("kind"))
      val ins = orders(s, dir).where(col("o_orderkey") % 23 === 0)
        .select(col("o_orderpriority").as("prio"), lit(0L).as("cents"),
          lit("A").as("kind"))
      val srcDir = Files.createTempDirectory("graft-svm-src").toString
      before.unionByName(afterU).unionByName(ins)
        .repartition(4).write.mode("overwrite").parquet(srcDir)

      var view = baseView.localCheckpoint()
      val q = s.readStream.schema(before.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
        .writeStream
        .option("checkpointLocation",
          Files.createTempDirectory("graft-svm-cp").toString)
        .foreachBatch { (b: DataFrame, _: Long) =>
          val bb = b.where(col("kind") === "B").select("prio", "cents")
          val aa = b.where(col("kind") === "A").select("prio", "cents")
          view = graft.operators.CdcOps
            .incrementalAgg(view, bb, aa, Seq("prio"), "n", Seq("cents"))
            .localCheckpoint()
        }
        .start()
      q.processAllAvailable()
      q.stop()
      view
        .select(col("prio"), col("n"), col("cents"),
          (col("cents").cast("double") / 100.0).as("revenue"))
        .orderBy("prio")
    }),

    // Streaming data-quality monitor: per-type row counts + violation
    // counters (null value, value > 90) as complete-mode aggregation
    // state — the DataQualityOps constraint suite ON the stream; the
    // final snapshot must equal the one-shot batch counts. Violation
    // counters are O(types) state regardless of stream length.
    // STREAMING DEADMAN: the liveness monitor's production shape —
    // streaming state is ONE max-timestamp per series (complete-mode
    // aggregation, series-domain-sized regardless of stream length);
    // the final snapshot classifies dead series against the same
    // cutoff, landing on the batch monitor_deadman oracle exactly.
    "stream_deadman" -> ((s, dir) => {
      val srcDir = Files.createTempDirectory("graft-sdm-src").toString
      val ev0 = events(s, dir).select("event_type", "user_id", "ts")
      ev0.repartition(4).write.mode("overwrite").parquet(srcDir)
      val qn = "graft_sdm_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val q = s.readStream.schema(ev0.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
        .groupBy("event_type", "user_id")
        .agg(max(col("ts")).as("last_ts"))
        .writeStream.format("memory").queryName(qn).outputMode("complete")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-sdm-cp").toString)
        .start()
      q.processAllAvailable()
      q.stop()
      s.table(qn)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_series"),
          sum(when(col("last_ts") < to_timestamp(lit("2024-01-12 00:00:00")), 1L)
            .otherwise(0L)).as("n_dead"))
        .orderBy("event_type")
    }),

    "stream_dq" -> ((s, dir) => {
      val srcDir = Files.createTempDirectory("graft-sdq-src").toString
      val ev0 = events(s, dir).select("event_type", "value")
      ev0.repartition(4).write.mode("overwrite").parquet(srcDir)
      val qn = "graft_sdq_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val q = s.readStream.schema(ev0.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_null"),
          sum(when(col("value") > 90.0, 1L).otherwise(0L)).as("n_over_90"))
        .writeStream.format("memory").queryName(qn).outputMode("complete")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-sdq-cp").toString)
        .start()
      q.processAllAvailable()
      q.stop()
      s.table(qn)
        .select(col("event_type"), col("n"), col("n_null"), col("n_over_90"))
        .orderBy("event_type")
    })
  )

  private def w(s: String) = s.stripMargin

  val oracle: Map[String, String] = Map(
    // the streaming recurrence must land exactly where the batch one
    // does — same recursive-CTE replay as cusum_drift
    "stream_cusum" -> WindowQueries.oracle("cusum_drift"),
    "stream_burst" -> WindowQueries.oracle("burst_detect"),
    "stream_seasonal" -> WindowQueries.oracle("seasonal_baseline"),
    "stream_psi" -> WindowQueries.oracle("psi_drift"),
    // the live funnel must land exactly on the batch answer
    "stream_funnel" -> WindowQueries.oracle("funnel_steps"),
    // streaming-state hourly sums are grid-exact ⇒ the snapshot fit
    // must land exactly on the batch fit
    "stream_forecast" -> MiningQueries.oracle("forecast_linear"),
    // the streamed delta folds must land exactly on the batch recompute
    "stream_view_maintain" -> AnalyticsQueries.oracle("view_maintain"),
    // the incremental index after the last micro-batch must equal
    // batch CC over the full edge set — same histogram oracle
    "stream_components" -> GraphQueries.oracle("graph_components"),
    // the streaming last-seen snapshot must classify the same dead
    // series as the batch monitor verb
    "stream_deadman" -> FluxQueries.oracle("monitor_deadman"),
    // the stream's violation counters must equal the batch scan's
    "stream_dq" -> w(
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_null,
        |  CAST(sum(CASE WHEN value > 90.0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_over_90
        |FROM events GROUP BY 1 ORDER BY 1"""),
    // the stream-stream join must emit exactly the batch interval
    // join's pairs (inner join emits each match once; nothing is
    // watermark-dropped at 90-day lateness)
    "stream_join" -> w(
      """SELECT p.event_id AS p_id, c.event_id AS c_id,
        |  epoch_us(p.ts) - epoch_us(c.ts) AS dt_us
        |FROM events p JOIN events c
        |  ON p.event_type = 'purchase' AND c.event_type = 'click'
        |  AND p.user_id = c.user_id
        |  AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
        |ORDER BY 1, 2"""),
    // streaming MAD: med interpolated (as anomaly_mad), mad replayed
    // with the KLL exact-mode rank arithmetic (ceil(q·n)-th smallest)
    "stream_mad" -> w(
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY 1),
        |d AS (
        |  SELECT e.event_type, abs(e.value - m.med) AS abs_dev, m.med
        |  FROM events e JOIN med m USING (event_type)),
        |r AS (
        |  SELECT event_type, abs_dev,
        |    row_number() OVER (PARTITION BY event_type ORDER BY abs_dev) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM d),
        |mad AS (
        |  SELECT event_type, abs_dev AS mad FROM r
        |  WHERE rn = greatest(1, CAST(ceil(0.5 * n) AS BIGINT)))
        |SELECT d.event_type, count(*) AS n,
        |  CAST(sum(CASE WHEN d.abs_dev > 3.0 * mad.mad THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_anom,
        |  round(min(d.med), 4) AS med, round(min(mad.mad), 4) AS mad
        |FROM d JOIN mad USING (event_type)
        |GROUP BY 1 ORDER BY 1"""),
    // four-stage sequential fold mirroring nearDedupBatchMor: stage i
    // probes idx(i-1) with its df cap measured over THAT index state,
    // survivors join idx(i). Docs too short to fingerprint never join
    // the fp CTE and are kept by construction (no shingles, no pairs).
    "stream_mor_dedup" -> {
      val stages = (1 to 4).map { i =>
        val b = 5 + i
        s"""cex$i AS MATERIALIZED (SELECT doc_id, unnest(fps) AS f FROM idx${i - 1}),
           |ccap$i AS (SELECT * FROM cex$i WHERE f IN (
           |  SELECT f FROM cex$i GROUP BY f HAVING count(*) <= 25)),
           |nex$i AS (SELECT doc_id, unnest(fps) AS f FROM fp WHERE doc_id % 10 = $b),
           |doomed$i AS (SELECT DISTINCT doc_id FROM (
           |  SELECT n.doc_id AS doc_id FROM ccap$i c JOIN nex$i n ON c.f = n.f
           |  GROUP BY n.doc_id, c.doc_id HAVING count(*) >= 15)),
           |idx$i AS MATERIALIZED (SELECT * FROM idx${i - 1} UNION ALL
           |  SELECT doc_id, fps FROM fp WHERE doc_id % 10 = $b
           |    AND doc_id NOT IN (SELECT doc_id FROM doomed$i))""".stripMargin
      }.mkString(",\n")
      LlmQueries.winnowBase.stripSuffix("\n") +
        s""", idx0 AS MATERIALIZED (SELECT doc_id, fps FROM fp WHERE doc_id % 10 < 6),
           |$stages
           |SELECT doc_id FROM documents WHERE doc_id % 10 >= 6
           |  AND doc_id NOT IN (
           |    SELECT doc_id FROM doomed1 UNION SELECT doc_id FROM doomed2
           |    UNION SELECT doc_id FROM doomed3 UNION SELECT doc_id FROM doomed4)
           |ORDER BY doc_id""".stripMargin
    },

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
        |GROUP BY 1 ORDER BY 1"""),
    // batch replay of session_window semantics: split on gap >= 6h,
    // session start = first event ts
    "stream_sessionize" -> w(
      """WITH g AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 21600000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), s AS (
        |  SELECT user_id, ts, value,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS session
        |  FROM g)
        |SELECT user_id, min(ts) AS s_start, count(*) AS n,
        |  round(sum(value), 4) AS sum_v
        |FROM s GROUP BY user_id, session ORDER BY user_id, s_start"""),
    // exact-mode sketch in streaming state == batch rank quantiles per
    // (event_type, UTC day window)
    "stream_quantiles" -> w(
      """WITH ranked AS (
        |  SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS wstart,
        |    value AS v,
        |    row_number() OVER (PARTITION BY event_type, time_bucket(INTERVAL '1 day', ts)
        |      ORDER BY value) AS rn,
        |    count(*) OVER (PARTITION BY event_type, time_bucket(INTERVAL '1 day', ts)) AS n
        |  FROM events),
        |qs AS (SELECT * FROM (VALUES (0, 0.5), (1, 0.75)) AS t(qi, q))
        |SELECT event_type, wstart, qi, v AS qv
        |FROM ranked JOIN qs ON rn = greatest(1, CAST(ceil(q * n) AS BIGINT))
        |ORDER BY event_type, wstart, qi"""),
    // merged per-batch sketches == direct whole-table ranks
    "stream_kll_store" -> w(
      """WITH ranked AS (
        |  SELECT event_type, value AS v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events),
        |qs AS (SELECT * FROM (VALUES (0, 0.5), (1, 0.875)) AS t(qi, q))
        |SELECT event_type, qi, v AS qv
        |FROM ranked JOIN qs ON rn = greatest(1, CAST(ceil(q * n) AS BIGINT))
        |ORDER BY event_type, qi"""),
    // micro-batch max-merge ≡ direct build: same estimator replica as
    // the batch hll gates
    "stream_hll_store" -> w(
      """WITH h AS (
        |  SELECT event_type,
        |    list_reduce(list_transform(range(1, 9), i ->
        |      CAST(strpos('0123456789abcdef',
        |        substring(md5(CAST(user_id AS VARCHAR)), CAST(i AS INTEGER), 1)) - 1
        |        AS BIGINT)),
        |      (a, b) -> a * 16 + b) AS u
        |  FROM events),
        |r AS (
        |  SELECT event_type, u // 1048576 AS bucket,
        |    max(CASE WHEN u % 1048576 = 0 THEN 21
        |        ELSE 20 - (length(format('{:b}', u % 1048576)) - 1) END) AS mx
        |  FROM h GROUP BY 1, 2),
        |regs AS (
        |  SELECT et.event_type, g.j, COALESCE(r.mx, 0) AS reg
        |  FROM (SELECT DISTINCT event_type FROM events) et
        |  CROSS JOIN (SELECT unnest(range(0, 4096)) AS j) g
        |  LEFT JOIN r ON r.event_type = et.event_type AND r.bucket = g.j),
        |s AS (
        |  SELECT event_type,
        |    list_reduce(list(power(2.0, -reg) ORDER BY j), (a, b) -> a + b) AS ssum,
        |    sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS zeros
        |  FROM regs GROUP BY 1),
        |est AS (
        |  SELECT event_type, zeros,
        |    (0.7213 / (1 + 1.079 / 4096)) * 4096 * 4096 / ssum AS raw
        |  FROM s)
        |SELECT event_type,
        |  round(CASE WHEN raw <= 2.5 * 4096 AND zeros > 0
        |             THEN 4096 * ln(4096.0 / zeros)
        |             WHEN raw <= 4294967296.0 / 30.0 THEN raw
        |             ELSE -4294967296.0 * ln(1 - raw / 4294967296.0) END, 4) AS hll
        |FROM est ORDER BY event_type"""),
    // exact-mode SpaceSaving in streaming state == batch per-day top-5
    "stream_topk" -> w(
      """WITH c AS (SELECT time_bucket(INTERVAL '1 day', ts) AS wstart,
        |    user_id, count(*) AS n FROM events GROUP BY 1, 2),
        |r AS (SELECT wstart, user_id, n,
        |    row_number() OVER (PARTITION BY wstart
        |      ORDER BY n DESC, CAST(user_id AS VARCHAR)) AS rn FROM c)
        |SELECT wstart, CAST(rn - 1 AS INTEGER) AS pos,
        |  CAST(user_id AS VARCHAR) AS item, n AS cnt
        |FROM r WHERE rn <= 5 ORDER BY wstart, pos""")
  )
}
