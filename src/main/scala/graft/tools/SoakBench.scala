package graft.tools

import graft.dsl.Tsdb
import graft.streaming.{DownsampleTask, StreamDedup, StreamIngest}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** LIFETIME soak for the bounded-state claims (VERDICT r15 #2): the
  * per-round specs pin 12-batch streams; the claims are lifetime
  * bounds. This drives ≥500 micro-batches through one JVM for each of
  * the two long-running sinks and samples the four curves every 50
  * batches:
  *
  *  1. LP ingest + compaction cadence → files per hot dt partition
  *     (claim: bounded at maxFilesPerPartition + compactEvery forever);
  *  2. a second ingest (compactEvery = 0) tailed by a live
  *     DownsampleTask → Spark state-store rows (claim: watermark
  *     eviction keeps open-window state flat as event time advances);
  *  3. MOR near-dedup sink → fps generation count (claim: ≤ 1 + base +
  *     compactEvery across the stream's lifetime) while the INDEX
  *     grows monotonically (expected, it is the corpus);
  *  4. driver heap after GC (claim: flat — localCheckpoint blocks,
  *     listener state, and progress buffers must not accrete per
  *     batch).
  *
  * Output: one table row per sample plus a closing JSON line. Not a
  * throughput bench — batch contents are tiny by design so 500+
  * triggers fit a round's wall budget; StreamBench measures rows/sec.
  *
  * Env: SOAK_BATCHES (default 500), SOAK_SAMPLE_EVERY (default 50),
  * SPARK_GRAFT_CPUS (default 8 — scheduling floor, not throughput).
  *
  * CRASH AXIS (r17): SOAK_CRASH_EVERY=K (default 0 = off) kills and
  * restarts all three streams every K batches — checkpoint recovery
  * for both ingests and the tailing task, a FRESH store instance over
  * the same warehouse (persisted ingest-seq hwm re-read), and a
  * deterministically injected POST-COMMIT failure on the MOR sink at
  * each crash point, so the restarted query REPLAYS a batchId whose
  * generation already landed (the excludeBatch self-match shield and
  * idempotent overwrite run for real, not just in the unit spec).
  * The same four curves must stay flat across restarts, the index
  * count must stay EXACT (1 seed + 3 novel/batch — a replay that
  * self-matched or double-appended shows up immediately), and
  * per-crash recovery seconds are printed so recovery-cost growth is
  * visible.
  */
object SoakBench {
  private def heapMb(): Long = {
    System.gc(); Thread.sleep(100L); System.gc()
    val r = Runtime.getRuntime
    (r.totalMemory() - r.freeMemory()) / (1024 * 1024)
  }

  def main(args: Array[String]): Unit = {
    val nBatches = sys.env.getOrElse("SOAK_BATCHES", "500").toInt
    val every = sys.env.getOrElse("SOAK_SAMPLE_EVERY", "50").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    // serviceDefaults: the soak measures the LONG-RUNNING configuration —
    // without the status-store caps the SQL listener's retained
    // executions grow the heap ~25 KB/batch toward its 1000-execution
    // default (the r17 jmap diff), drowning the curves the soak pins
    val spark = graft.SparkTuning.serviceDefaults(SparkSession.builder()
      .appName("graft-soak").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val crashEvery = sys.env.getOrElse("SOAK_CRASH_EVERY", "0").toInt

    val wh = Files.createTempDirectory("graft-soak-wh").toString
    var tsdb = Tsdb(spark, wh)
    tsdb.catalog.createOrg("o")
    tsdb.catalog.createBucket("hot", "o")    // compaction cadence soak
    tsdb.catalog.createBucket("tailed", "o") // downsample/state soak
    tsdb.catalog.createBucket("hourly", "o")

    val t0 = 1705276800L * 1000000000L // 2024-01-15 00:00:00 UTC ns
    val day1 = java.time.LocalDate.parse("2024-01-15")

    // ---- streams (vars: the crash axis stops and restarts them from
    // the same checkpoints, through a FRESH store instance) -------------
    val hotCp = Files.createTempDirectory("soak-cp-hot").toString
    val tailCp = Files.createTempDirectory("soak-cp-tail").toString
    val taskCp = Files.createTempDirectory("soak-cp-task").toString
    val morCp = Files.createTempDirectory("soak-cp-mor").toString
    val maxFileAge = sys.env.getOrElse("SOAK_MAX_FILE_AGE", "120s")

    val hotMem = MemoryStream[String]
    val tailMem = MemoryStream[String]
    val morMem = MemoryStream[(Long, String)]

    val morDir = Files.createTempDirectory("graft-soak-mor").toString
    val mor = new StreamDedup.NearDupMorIndex(spark, morDir)
    mor.seed(Seq((0L, (1 to 30).map(i => s"seed$i").mkString(" ")))
      .toDF("doc_id", "text"), "doc_id", "text")
    val morSink = StreamDedup.nearDedupMorSink(mor, "doc_id", "text",
      compactEvery = 16, targetFiles = 4, minShared = 10, maxDf = 50)
    // crash injection: fail the query AFTER the sink fully applied a
    // batch (generation written, marker stamped, df appended) but
    // BEFORE Spark records the batch as committed — the restarted query
    // then replays that batchId over its own landed generation, which
    // is exactly the state the excludeBatch shield exists for
    @volatile var injectCrash = false
    val crashingSink: (org.apache.spark.sql.DataFrame, Long) => Unit =
      (df, id) => {
        morSink(df, id)
        if (injectCrash) {
          injectCrash = false
          throw new RuntimeException(s"soak-injected post-commit crash at mor batch $id")
        }
      }

    def startHot() = new StreamIngest(tsdb).start("hot", hotMem.toDS(),
      hotCp,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L),
      compactEvery = 8, maxFilesPerPartition = 16)
    def startTail() = new StreamIngest(tsdb).start("tailed", tailMem.toDS(),
      tailCp,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L),
      compactEvery = 0) // REQUIRED: a live DownsampleTask tails this bucket
    def startTask() = new DownsampleTask(tsdb).start(
      source = "tailed", target = "hourly", every = "10 minutes", fn = sum,
      lateness = "30 minutes",
      checkpoint = taskCp,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L),
      // the r16 soak's one non-flat curve was this source's seen-files
      // log (~24 KB/batch, O(lifetime files) unbounded): a short
      // maxFileAge lets the purge engage WITHIN the soak window, so the
      // heap slope claim covers the bounded configuration a months-long
      // deployment would run (age >> discovery latency, safe while live)
      maxFileAge = maxFileAge)
    def startMor() = morMem.toDF().toDF("doc_id", "text").writeStream
      .option("checkpointLocation", morCp)
      .foreachBatch(crashingSink)
      .start()

    var hotQ = startHot()
    var tailQ = startTail()
    // prime the bucket directory so the file stream can resolve it
    tsdb.writeLp("tailed", Seq(s"sensor,dev=d0 temp=0.0 ${t0 - 60L * 1000000000L}"))
    var task = startTask()
    var morQ = startMor()

    def morGens(sub: String): Int =
      Option(new java.io.File(morDir, sub).listFiles()).toSeq.flatten
        .count(_.getName.startsWith("b="))

    println(f"${"batch"}%6s ${"hot_files_d1"}%12s ${"state_rows"}%10s " +
      f"${"mor_fps_gens"}%12s ${"mor_df_gens"}%11s ${"idx_docs"}%9s ${"heap_mb"}%8s ${"elapsed_s"}%9s")
    val tStart = System.nanoTime()
    val samples = scala.collection.mutable.ArrayBuffer.empty[Map[String, Long]]
    var lastStateRows = 0L

    (1 to nBatches).foreach { b =>
      // hot ingest: 3 points per batch, all on day1 (one hot partition)
      hotMem.addData((0 until 3).map(j =>
        s"cpu,host=h${(b * 3 + j) % 7} usage=${b % 100}.5 ${t0 + (b * 3 + j) * 1000000L}"): _*)
      hotQ.processAllAvailable()
      // tailed ingest: event time advances 1 min/batch so the watermark
      // closes windows behind it
      tailMem.addData((0 until 3).map(j =>
        s"sensor,dev=d$j temp=${b % 50}.25 ${t0 + b * 60L * 1000000000L + j * 1000000L}"): _*)
      tailQ.processAllAvailable()
      // the tailing task drains every 10 ingest batches (and at every
      // sample point) — the 500-batch lifetime requirement is on the
      // ingest + MOR sinks; the file-tail just has to keep up
      if (b % 10 == 0 || b % every == 0 || b == nBatches) task.processAllAvailable()
      // near-dedup: 4 docs — 3 novel, 1 replay of the seed that must
      // keep being doomed forever. Novel words are md5-derived: winnow
      // fingerprints are CHARACTER 8-grams, so a low-entropy template
      // ("w{b}_{d}_{i}") makes every doc share digit-boilerplate grams
      // with the whole index and the stream legitimately dooms itself —
      // the soak needs genuinely novel text, like a real crawl
      def word(d: Int, i: Int): String = {
        val md = java.security.MessageDigest.getInstance("MD5")
        md.digest(s"$b/$d/$i".getBytes("UTF-8")).take(5).map("%02x".format(_)).mkString
      }
      val crashNow = crashEvery > 0 && b % crashEvery == 0 && b < nBatches
      if (crashNow) injectCrash = true
      morMem.addData(
        (Seq.tabulate(3)(d => (b * 10L + d,
          (1 to 25).map(i => word(d, i)).mkString(" "))) :+
          (b * 10L + 9, (1 to 30).map(i => s"seed$i").mkString(" ") + s" tail$b")): _*)
      if (crashNow) {
        // the injected failure lands AFTER the sink applied this batch:
        // Spark never records the commit, so the restarted query must
        // REPLAY the batchId over its own landed generation
        try morQ.processAllAvailable()
        catch { case _: Throwable => () }
        val tCrash = System.nanoTime()
        hotQ.stop(); tailQ.stop(); task.stop()
        try morQ.stop() catch { case _: Throwable => () }
        // fresh store instance over the same warehouse: persisted
        // ingest-seq hwm re-read, registries rebuilt from liveness
        tsdb = Tsdb(spark, wh)
        hotQ = startHot(); tailQ = startTail(); task = startTask()
        morQ = startMor()
        morQ.processAllAvailable() // forces the batchId replay through
        val recSecs = (System.nanoTime() - tCrash) / 1e9
        println(f"[crash] batch $b%5d: killed + restarted all streams, recovery ${recSecs}%.1f s")
      } else morQ.processAllAvailable()

      Option(task.lastProgress).foreach { p =>
        val s = p.stateOperators.map(_.numRowsTotal).sum
        // a restarted query's first trigger can be a NO-DATA batch that
        // reports numRowsTotal=0 before the state store partitions load
        // (observed in the crash-soak: the next data batch reports the
        // true 12 again) — a zero-state report from a zero-input batch
        // is a non-observation, not an observation of zero
        if (s > 0 || p.numInputRows > 0) lastStateRows = s
      }
      if (b % every == 0 || b == nBatches) {
        // a task restarted at this very batch has no progress yet; its
        // state lives in the checkpoint unchanged — report the last
        // observed value rather than a spurious 0
        val stateRows = lastStateRows
        val idxDocs = mor.fps().count()
        val m = Map(
          "batch" -> b.toLong,
          "hot_files_d1" -> tsdb.store.partFiles("hot", day1).toLong,
          "state_rows" -> stateRows,
          "mor_fps_gens" -> morGens("fps").toLong,
          "mor_df_gens" -> morGens("df").toLong,
          "idx_docs" -> idxDocs,
          "heap_mb" -> heapMb(),
          "elapsed_s" -> ((System.nanoTime() - tStart) / 1000000000L))
        samples += m
        println(f"${m("batch")}%6d ${m("hot_files_d1")}%12d ${m("state_rows")}%10d " +
          f"${m("mor_fps_gens")}%12d ${m("mor_df_gens")}%11d ${m("idx_docs")}%9d " +
          f"${m("heap_mb")}%8d ${m("elapsed_s")}%9d")
      }
    }
    // EXACT index count: 1 seed + 3 novel per batch — any crash-replay
    // that self-matched (kept 0) or double-appended (kept 6) breaks this
    val finalDocs = mor.fps().count()
    val expectDocs = 1L + 3L * nBatches
    assert(finalDocs == expectDocs,
      s"index count $finalDocs != exact $expectDocs — a replay skewed the corpus")
    println(s"[soak] exact index count OK: $finalDocs docs = 1 seed + 3 x $nBatches batches" +
      (if (crashEvery > 0) s" across ${(nBatches - 1) / crashEvery} crash/restart cycles" else ""))
    hotQ.stop(); tailQ.stop(); task.stop(); morQ.stop()

    val keys = Seq("batch", "hot_files_d1", "state_rows", "mor_fps_gens",
      "mor_df_gens", "idx_docs", "heap_mb", "elapsed_s")
    println("{\"soak\":[" + samples.map(m =>
      "{" + keys.map(k => s""""$k":${m(k)}""").mkString(",") + "}").mkString(",") + "]}")
    spark.stop()
  }
}
