package graft.streaming

import graft.SparkSpec
import graft.dsl.Tsdb
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end streaming: LP lines → stream ingest → bucket; bucket →
  * windowed downsample task → target bucket (SURVEY.md §5 item 5).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1705276800L * 1000000000L // 2024-01-15 00:00:00 UTC ns

  private def freshTsdb(): Tsdb = {
    val dir = Files.createTempDirectory("graft-stream-spec")
    val t = Tsdb(spark, dir.toString)
    t.catalog.createOrg("greengrass")
    t.catalog.createBucket("raw", "greengrass")
    t.catalog.createBucket("downsampled", "greengrass")
    t
  }

  test("memory-stream LP lines land in the bucket via foreachBatch") {
    val tsdb = freshTsdb()
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    mem.addData(
      s"cpu,host=h1 usage=0.5 $t0",
      s"cpu,host=h1 usage=0.7 ${t0 + 60L * 1000000000L}",
      "garbage line that is dropped",
      s"cpu,host=h2 usage=0.9 ${t0 + 30L * 1000000000L}")
    val cp = Files.createTempDirectory("cp-ingest").toString
    val q = new StreamIngest(tsdb).start("raw", mem.toDS(), cp)
    q.awaitTermination(60000)
    val rows = tsdb.from("raw").toDF
    assert(rows.count() == 3) // malformed line dropped, not fatal
    assert(rows.filter(col("tags.host") === "h1").count() == 2)
  }

  test("streaming exact dedup: in-stream duplicates collapse, corpus members drop") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    def ts(s: Long) = new java.sql.Timestamp(1705276800000L + s * 1000)
    mem.addData(
      (ts(0), "fresh document one"),
      (ts(1), "Fresh   DOCUMENT one"),  // normalizes to the same fp
      (ts(2), "already in the corpus"),
      (ts(3), "fresh document two"))
    val docs = mem.toDF().toDF("event_ts", "text")
    val corpus = Seq("already in the corpus").toDF("t")
      .select(graft.llmops.TextOps.fingerprint(col("t")).as("fp"))
    val out = StreamDedup.exactDedupStream(docs, corpus, "text", "event_ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("cp-dedup").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val kept = spark.table("dedup_out").select("text").as[String].collect().toSet
    assert(kept == Set("fresh document one", "fresh document two"))
  }

  test("streaming near-dedup: foreachBatch probe drops corpus near-dups, keeps novel docs") {
    implicit val sqlCtx = spark.sqlContext
    import graft.llmops.TextOps
    // corpus doc and its near-dup share a long verbatim run (>= 15
    // winnow fingerprints); the novel doc shares nothing
    val run = (1 to 40).map(i => s"tok$i").mkString(" ")
    val corpusText = s"$run corpus tail words here"
    val nearDup = s"$run different tail entirely now"
    val novel = (101 to 140).map(i => s"new$i").mkString(" ")
    val corpusIdx = TextOps.winnowFingerprints(
      Seq((1000L, corpusText)).toDF("doc_id", "text"), "doc_id", "text")
      .localCheckpoint()
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    def ts(s: Long) = new java.sql.Timestamp(1705276800000L + s * 1000)
    mem.addData((ts(0), 1L, nearDup), (ts(1), 2L, novel))
    val docs = mem.toDF().toDF("event_ts", "doc_id", "text")
    val kept = scala.collection.mutable.Set.empty[Long]
    val q = docs.writeStream
      .option("checkpointLocation", Files.createTempDirectory("cp-neardup").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        kept ++= StreamDedup.nearDedupBatch(batch, corpusIdx, "doc_id", "text",
          minShared = 15)
          .select("doc_id").as[Long].collect()
        () // Unit — foreachBatch sinks, the pipeline would append here
      }
      .start()
    q.awaitTermination(60000)
    assert(kept.toSet == Set(2L)) // near-dup dropped, novel doc kept
  }

  test("maintained-df near-dedup folds batches identically to the per-batch aggregate") {
    import graft.llmops.TextOps
    // corpus: two near-dup families + the batches replay one family
    // member, one novel doc, and a doc that near-dups a BATCH-ADDED
    // survivor (so the growing-index semantics are exercised)
    def run(a: Int, b: Int, p: String) = (a to b).map(i => s"$p$i").mkString(" ")
    val corpus = Seq(
      (1L, run(1, 40, "a") + " corpus one"),
      (2L, run(50, 90, "b") + " corpus two")).toDF("doc_id", "text")
    val batches = Seq(
      Seq((10L, run(1, 40, "a") + " replay tail"),       // dup of corpus 1
          (11L, run(200, 240, "c") + " novel one")),     // novel → joins index
      Seq((12L, run(200, 240, "c") + " other ending"),   // dup of the r10-added 11
          (13L, run(300, 340, "d") + " novel two")))
      .map(_.toDF("doc_id", "text"))

    // fold through BOTH paths
    var inc = StreamDedup.nearDupIndex(corpus, "doc_id", "text")
    inc = inc.copy(fps = inc.fps.localCheckpoint(), df = inc.df.localCheckpoint())
    var keptInc = Vector.empty[Long]
    var fpsBase = TextOps.winnowFingerprints(corpus, "doc_id", "text").localCheckpoint()
    var keptBase = Vector.empty[Long]
    for (b <- batches) {
      val (k, next) = StreamDedup.nearDedupBatchIncremental(b, inc, "doc_id", "text")
      keptInc ++= k.select("doc_id").as[Long].collect().sorted
      inc = next
      val kb = StreamDedup.nearDedupBatch(b, fpsBase, "doc_id", "text").localCheckpoint()
      keptBase ++= kb.select("doc_id").as[Long].collect().sorted
      fpsBase = fpsBase.unionByName(
        TextOps.winnowFingerprints(kb, "doc_id", "text")).localCheckpoint()
    }
    assert(keptInc == keptBase && keptInc == Vector(11L, 13L))
    // the maintained df table equals a from-scratch recompute over the
    // final index
    val recomputed = inc.fps.select(explode(col("fps")).as("shingle"))
      .groupBy("shingle").agg(count(lit(1)).as("df"))
    assert(inc.df.join(recomputed, Seq("shingle"), "full")
      .where(inc.df("df") =!= recomputed("df") ||
        inc.df("df").isNull || recomputed("df").isNull)
      .count() == 0)
  }

  test("streaming substring screen: corpus passages cut at ingest, index grows per batch") {
    implicit val sqlCtx = spark.sqlContext
    import graft.llmops.DedupOps
    val run = (1 to 10).map(i => s"c$i").mkString(" ")     // corpus passage
    val fresh = (1 to 8).map(i => s"n$i").mkString(" ")    // novel passage
    var idx = DedupOps.substringWindows(
      Seq((1000L, s"$run old tail")).toDF("doc_id", "text"),
      "doc_id", "text", 4).select("h").localCheckpoint()
    val mem = MemoryStream[(Long, String)]
    // batch 1: doc 1 embeds the corpus run (cut), doc 2 is novel (kept
    // whole, and its windows join the index)
    // batch 2: doc 3 repeats doc 2's passage -> screened by the GROWN index
    mem.addData((1L, s"lead $run trail words"), (2L, s"$fresh alone"))
    val out = scala.collection.mutable.Map.empty[Long, (String, Long)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .option("checkpointLocation", Files.createTempDirectory("cp-substr").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val screened = StreamDedup.substrScreenBatch(batch, idx, "doc_id", "text", 4)
          .localCheckpoint()
        screened.select("doc_id", "trimmed", "kept_tokens")
          .as[(Long, String, Long)].collect()
          .foreach { case (id, t, n) => out(id) = (t, n) }
        // the pipeline stage: survivors' windows append to the index
        idx = idx.union(DedupOps.substringWindows(
          screened.select(col("doc_id"), col("trimmed").as("text")),
          "doc_id", "text", 4).select("h")).distinct().localCheckpoint()
        ()
      }.start()
    q.awaitTermination(60000)
    assert(out(1L) == (("lead trail words", 3L)))  // corpus run cut
    assert(out(2L) == ((s"$fresh alone", 9L)))     // novel: untouched
    // second pass with a fresh checkpoint replays docs 1-2 (idempotent
    // against the grown index: doc 2 is now fully covered and drops,
    // so its batch-1 value stands) and screens the new doc 3 — a dup
    // of a passage ingested in the FIRST pass, cut by the grown index
    mem.addData((3L, s"$fresh alone again"))
    val q2 = mem.toDF().toDF("doc_id", "text").writeStream
      .option("checkpointLocation", Files.createTempDirectory("cp-substr2").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamDedup.substrScreenBatch(batch, idx, "doc_id", "text", 4)
          .select("doc_id", "trimmed", "kept_tokens")
          .as[(Long, String, Long)].collect()
          .foreach { case (id, t, n) => out(id) = (t, n) }
        ()
      }.start()
    q2.awaitTermination(60000)
    // doc 3's 4-token windows over the 9-token "fresh… alone" prefix
    // are all indexed -> span [1, 9]; only "again" survives
    assert(out(3L) == (("again", 1L)))
  }

  test("curation ops run unchanged under structured streaming (stateless projections)") {
    // redactPii / qualityScore / langId / urlDomain are pure scan-stage
    // Column expressions — the same columns drive a readStream with no
    // state, no watermark, and per-batch results identical to batch.
    implicit val sqlCtx = spark.sqlContext
    import graft.llmops.TextOps
    val mem = MemoryStream[(Long, String)]
    val rows = Seq(
      (0L, "the cat and the dog mail me at a@b.co or https://Ex.COM/x?q=1"),
      (1L, "der hund und die katze ist nicht hier"))
    mem.addData(rows: _*)
    def curate(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"),
      TextOps.redactPii(col("text")).as("clean"),
      TextOps.langId(col("text")).as("lang"),
      TextOps.urlDomain(get(TextOps.extractUrls(col("text")), lit(0))).as("domain"))
    val q = curate(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("curate_out").outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("cp-curate").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val streamed = spark.table("curate_out").orderBy("doc_id")
      .as[(Long, String, String, String)].collect().toSeq
    val batch = curate(rows.toDF("doc_id", "text")).orderBy("doc_id")
      .as[(Long, String, String, String)].collect().toSeq
    assert(streamed == batch) // stream ≡ batch for stateless curation
    assert(streamed(0)._2.contains("<EMAIL>") && streamed(0)._3 == "en"
      && streamed(0)._4 == "ex.com")
    assert(streamed(1)._3 == "de" && streamed(1)._4 == null)
  }

  test("downsample task materializes windowed means into the target bucket") {
    val tsdb = freshTsdb()
    // 4 points across two 1-minute windows for h1, one window for h2
    tsdb.writeLp("raw", Seq(
      s"cpu,host=h1 usage=1.0 $t0",
      s"cpu,host=h1 usage=3.0 ${t0 + 10L * 1000000000L}",
      s"cpu,host=h1 usage=5.0 ${t0 + 70L * 1000000000L}",
      s"cpu,host=h2 usage=2.0 ${t0 + 5L * 1000000000L}"))
    val cp = Files.createTempDirectory("cp-task").toString
    val q = new DownsampleTask(tsdb).start(
      source = "raw", target = "downsampled",
      every = "1 minute", fn = avg, lateness = "5 minutes", checkpoint = cp)
    q.awaitTermination(120000)
    val out = tsdb.from("downsampled").toDF
      .filter(col("measurement") === "cpu")
      .orderBy(col("tags.host"), col("time_ns"))
      .select(col("tags.host"), col("time"), col("value_f"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString, r.getDouble(2)))
    assert(out.toSeq == Seq(
      ("h1", "2024-01-15 00:01:00.0", 2.0), // mean(1,3), window end 00:01
      ("h1", "2024-01-15 00:02:00.0", 5.0),
      ("h2", "2024-01-15 00:01:00.0", 2.0)))
  }

  test("late refinement: a second run upserts the window (LWW)") {
    val tsdb = freshTsdb()
    tsdb.writeLp("raw", Seq(s"cpu,host=h1 usage=1.0 $t0"))
    val cp = Files.createTempDirectory("cp-lww").toString
    val task = new DownsampleTask(tsdb)
    val q1 = task.start("raw", "downsampled", "1 minute", avg, "5 minutes", cp)
    q1.awaitTermination(120000)
    // late point in the same window arrives after the first materialization
    tsdb.writeLp("raw", Seq(s"cpu,host=h1 usage=3.0 ${t0 + 1000000000L}"))
    val q2 = task.start("raw", "downsampled", "1 minute", avg, "5 minutes", cp)
    q2.awaitTermination(120000)
    val vals = tsdb.from("downsampled").toDF
      .filter(col("measurement") === "cpu").select("value_f")
      .as[Double].collect()
    assert(vals.toSeq == Seq(2.0)) // refined mean replaced the first emission
  }

  test("streaming cusum: state carries across micro-batches, equals batch detector") {
    implicit val sqlCtx = spark.sqlContext
    // stable prefix then a sustained +1.5σ shift, split mid-drift so
    // the recurrence MUST survive a batch boundary to alarm
    val all = (1 to 200).map(i => ("a", i.toLong, 10.0 + (i % 5 - 2) * 0.1)) ++
      (201 to 300).map(i => ("a", i.toLong, 10.6 + (i % 5 - 2) * 0.1))
    val batchOut = graft.operators.AnomalyOps
      .cusum(all.toDF("k", "t", "v"), Seq("k"), "t", "v")
      .select("t", "cusum", "alarm").as[(Long, Double, Boolean)]
      .collect().sortBy(_._1)
    val params = all.toDF("k", "t", "v").groupBy("k").agg(
      round(avg(col("v")), 4).as("mu"), round(stddev_pop(col("v")), 4).as("sg"))

    val mem = MemoryStream[(String, Long, Double)]
    val q = graft.streaming.StreamAnomaly.cusumStream(
      mem.toDS().toDF("k", "t", "v"), params, "k", "t", "v")
      .writeStream.format("memory").queryName("scusum_spec")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("cp-scusum").toString)
      .start()
    all.grouped(120).foreach { chunk => mem.addData(chunk); q.processAllAvailable() }
    q.stop()
    val streamOut = spark.table("scusum_spec")
      .select("t", "cusum", "alarm").as[(Long, Double, Boolean)]
      .collect().sortBy(_._1)
    assert(streamOut.toSeq == batchOut.toSeq) // bit-identical recurrence
    assert(streamOut.exists(_._3) && streamOut.filter(_._3).map(_._1).min > 200)
  }

  test("streaming mad: sketch state across micro-batches equals the one-shot sketch") {
    implicit val sqlCtx = spark.sqlContext
    // two series with different spreads; batch boundaries fall mid-series
    val all = (1 to 101).map(i => ("a", i.toLong, 10.0 + (i % 7 - 3) * 0.5)) ++
      (1 to 80).map(i => ("b", i.toLong, 50.0 + (i % 11 - 5) * 2.0))
    val med = all.toDF("k", "t", "v").groupBy("k")
      .agg(percentile(col("v"), lit(0.5)).as("med"))
    // one-shot reference: the same sketch fed all deviations at once
    val medMap = med.as[(String, Double)].collect().toMap
    val expect = all.groupBy(_._1).map { case (k, rows) =>
      val st = new graft.functions.KllState(32768)
      rows.sortBy(_._2).foreach { case (_, _, v) => st.update(math.abs(v - medMap(k))) }
      k -> (st.totalN, st.quantiles(Array(0.5))(0))
    }

    val mem = MemoryStream[(String, Long, Double)]
    val q = graft.streaming.StreamAnomaly.madStream(
      mem.toDS().toDF("k", "t", "v"), med, "k", "t", "v")
      .writeStream.format("memory").queryName("smad_spec")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("cp-smad").toString)
      .start()
    all.grouped(60).foreach { chunk => mem.addData(chunk); q.processAllAvailable() }
    q.stop()
    val got = spark.table("smad_spec")
      .groupBy("k").agg(max("n_seen").as("n"), max_by(col("mad"), col("n_seen")).as("mad"))
      .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == expect) // exact-regime multiset: boundary-invariant
  }

  test("streaming funnel: set-once state across batches equals the batch verb") {
    implicit val sqlCtx = spark.sqlContext
    val ev = Seq(
      ("A", "view", 10L), ("A", "click", 20L), ("A", "purchase", 30L),
      ("B", "click", 5L), ("B", "view", 10L), ("B", "click", 50L),
      ("C", "purchase", 1L), ("C", "view", 2L),
      ("D", "click", 1L))
    val batch = graft.operators.FunnelOps
      .funnel(ev.toDF("u", "t", "ts"), "u", "t", "ts", Seq("view", "click", "purchase"))
      .collect().map(r => (r.getString(0), r.get(1), r.get(2), r.get(3))).toSet

    val mem = MemoryStream[(String, String, Long)]
    val q = graft.streaming.StreamFunnel.funnelStream(
      mem.toDS().toDF("u", "t", "ts"), "u", "t", "ts", Seq("view", "click", "purchase"))
      .writeStream.format("memory").queryName("sfunnel_spec")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("cp-sfunnel").toString)
      .start()
    // split mid-funnel: A's purchase and B's qualifying click arrive in
    // a LATER batch than the steps they depend on
    ev.grouped(4).foreach { chunk => mem.addData(chunk); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("sfunnel_spec")
      .groupBy("u")
      .agg(max(element_at(col("ts_steps"), 1)).as("t1"),
        max(element_at(col("ts_steps"), 2)).as("t2"),
        max(element_at(col("ts_steps"), 3)).as("t3"))
      .filter(col("t1").isNotNull)
      .collect().map(r => (r.getString(0), r.get(1), r.get(2), r.get(3))).toSet
    assert(streamed == batch)
  }

  test("stream-stream attribution join: bounded-delay matches only") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: Long) = new java.sql.Timestamp(1705276800000L + s * 1000)
    val imps = MemoryStream[(Long, java.sql.Timestamp, String)]
    val convs = MemoryStream[(Long, java.sql.Timestamp, Double)]
    imps.addData((1L, ts(0), "adA"), (2L, ts(10), "adB"), (3L, ts(20), "adC"))
    convs.addData(
      (1L, ts(30), 9.99),   // 30 s after imp 1 → inside 1 minute
      (2L, ts(100), 5.00),  // 90 s after imp 2 → outside
      (3L, ts(15), 1.00))   // BEFORE imp 3 → outside (no pre-click credit)
    val out = StreamJoin.attributionJoin(
      imps.toDF().toDF("user", "imp_ts", "ad"),
      convs.toDF().toDF("user", "conv_ts", "amount"),
      key = "user", impTimeCol = "imp_ts", convTimeCol = "conv_ts",
      maxDelay = "1 minute", lateness = "10 seconds")
    val q = out.writeStream.format("memory").queryName("attr_out")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("cp-attr").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val matched = spark.table("attr_out")
      .select("user", "ad", "amount").as[(Long, String, Double)].collect().toSet
    assert(matched == Set((1L, "adA", 9.99)))
  }

  test("attribution join refuses colliding non-key columns") {
    val a = Seq((1L, ts0, "x")).toDF("user", "t1", "dup")
    val b = Seq((1L, ts0, "y")).toDF("user", "t2", "dup")
    val e = intercept[IllegalArgumentException] {
      StreamJoin.attributionJoin(a, b, "user", "t1", "t2", "1 minute", "1 minute")
    }
    assert(e.getMessage.contains("dup"))
  }
  private def ts0 = new java.sql.Timestamp(1705276800000L)
}
