package graft.tools

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

/** Concurrent-service soak (r18, verdict r17 #4): the lifetime/crash
  * soaks cover the STREAMS; this drives the HTTP SERVICE's contention
  * surfaces under sustained parallel load — per-bucket write locks
  * (N writers + delete sweeps + maintenance compaction on one bucket),
  * the Dekker register-then-check rewrite-intent guard (delete vs a
  * live CQ tail), tail-guard 409s (a v1 CONTINUOUS QUERY tails the
  * bucket as a file stream while /api/v2/delete rewrites it), and the
  * ingest-seq space under service concurrency.
  *
  * It boots the REAL [[graft.Main]] (same composition: bootstrap →
  * HTTPS HttpApi → maintenance → streaming LP ingest) on a daemon
  * thread, harvests the provisioned tokens from the catalog like the
  * reference's token vendor does, and runs parallel client classes
  * against `https://127.0.0.1:8086` for GRAFT_SOAK_SECONDS (default
  * 600):
  *
  *  - writers:   POST /api/v2/write (LP batches, distinct series/ts)
  *  - flux:      POST /api/v2/query (range→filter→aggregateWindow)
  *  - v1:        GET  /query (InfluxQL SELECT + SHOW MEASUREMENTS)
  *  - admin:     bucket create → write → list → delete cycles
  *  - cq:        CREATE/DROP CONTINUOUS QUERY cycles (arms/disarms the
  *               bucket tail — the 409 pressure source)
  *  - deletes:   POST /api/v2/delete over old slices (204 or 409 ONLY)
  *  - feeder:    LP text files into the ingest dir (streaming ingest
  *               contends with HTTP writes inside one store instance)
  *
  * In-code invariants (exit 1 on violation):
  *  1. ZERO 5xx across every class — contention may surface only as
  *     the typed 409 (TailedBucketException → 409 is the contract).
  *  2. Delete responses ∈ {204, 409}; at least one 409 observed when
  *     the soak ran long enough for a CQ window to overlap a sweep.
  *  3. NO STUCK TAILS: after the final DROP CONTINUOUS QUERY, a delete
  *     must succeed within a bounded retry window (tails unregister
  *     with their stream, never outlive it).
  *  4. WRITE LEDGER: every 204'd write batch survives exactly once —
  *     on-disk `soak` rows == 200 × (write 204s). Unique (series, ts)
  *     per line and delete sweeps scoped to the feeder measurement
  *     make the count exact: a lost append (write-lock race) reads
  *     low, a double-applied batch reads high. Seqs are PER BATCH by
  *     design (LWW orders batches), so row-level seq uniqueness is not
  *     the invariant; instead the persisted hwm must cover the max
  *     on-disk seq (restart monotonicity held live).
  *
  * Run (the maintenance knob makes compaction contend every sweep;
  * COMPACT_EVERY=0 is the DOCUMENTED service config for live tails —
  * with the ingest's own sweep cadence on, a CQ correctly refuses to
  * start with the typed 409, and the tail-guard path never arms):
  *   GRAFT_INGEST_COMPACT_EVERY=0 GRAFT_MAINTENANCE_SECONDS=20 \
  *     GRAFT_SOAK_SECONDS=600 \
  *     java -cp "target/scala-2.13/classes:<spark jars>" \
  *     graft.tools.ServiceSoak
  */
object ServiceSoak {
  private val Bucket = "greengrass-telemetry"
  private val Org = "greengrass"

  private final class Stats(val name: String) {
    val lat = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val byClass = new java.util.concurrent.ConcurrentHashMap[Int, AtomicLong]()
    val errSamples = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def rec(status: Int, nanos: Long, body: => String = ""): Unit = {
      lat.add(nanos)
      byClass.computeIfAbsent(status, _ => new AtomicLong()).incrementAndGet()
      if (status >= 500 && errSamples.size() < 3)
        errSamples.add(body.replace('\n', ' ').take(400))
      ()
    }
    def count(p: Int => Boolean): Long = {
      var n = 0L
      byClass.forEach((k, v) => if (p(k)) n += v.get())
      n
    }
    def json(elapsedS: Double): String = {
      val ls = lat.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted
      def pct(p: Double): Double =
        if (ls.isEmpty) 0.0
        else ls(math.min(ls.length - 1, (p * ls.length).toInt)) / 1e6
      val codes = {
        val sb = new StringBuilder
        val ks = byClass.keySet().toArray(Array.empty[Integer]).map(_.toInt).sorted
        ks.foreach(k => sb.append(s""""$k":${byClass.get(k).get()},"""))
        if (sb.nonEmpty) sb.setLength(sb.length - 1)
        sb.toString
      }
      f"""{"class":"$name","ops":${ls.length},"ops_per_s":${ls.length / elapsedS}%.1f,""" +
        f""""p50_ms":${pct(0.50)}%.1f,"p99_ms":${pct(0.99)}%.1f,"codes":{$codes}}"""
    }
  }

  /** Diagnostic report: (rows, distinct `_ingest_seq`) summed over
    * every bucket of the warehouse. Seqs are per write BATCH (and
    * compaction drops the column once LWW is physically applied), so
    * these are context for the artifact, not an invariant. Runnable
    * standalone against a finished soak's warehouse:
    * GRAFT_SOAK_CHECK_ONLY=<warehouse dir>.
    */
  private def seqCheck(warehouse: String,
      spark: org.apache.spark.sql.SparkSession): (Long, Long) = {
    val cat = new graft.store.Catalog(Paths.get(warehouse))
    var rows = 0L; var distinctSeqs = 0L
    cat.listBuckets.foreach { b =>
      val p = cat.bucketPath(b.name)
      if (Files.exists(p) && Files.list(p).findFirst().isPresent) {
        val df = spark.read.parquet(p.toString)
        if (df.columns.contains("_ingest_seq")) {
          val a = df.agg(
            org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)),
            org.apache.spark.sql.functions.countDistinct(
              org.apache.spark.sql.functions.col("_ingest_seq"))).head()
          rows += a.getLong(0); distinctSeqs += a.getLong(1)
          println(s"[soak] seq-check bucket '${b.name}': ${a.getLong(0)} rows, " +
            s"${a.getLong(1)} distinct seqs")
        } else println(s"[soak] seq-check bucket '${b.name}': no _ingest_seq " +
          s"column (cols: ${df.columns.mkString(",")})")
      } else println(s"[soak] seq-check bucket '${b.name}': no data at $p")
    }
    (rows, distinctSeqs)
  }

  def main(args: Array[String]): Unit = {
    sys.env.get("GRAFT_SOAK_CHECK_ONLY").foreach { wh =>
      val spark = org.apache.spark.sql.SparkSession.builder()
        .master("local[8]").config("spark.ui.enabled", "false").getOrCreate()
      val (rows, ds) = seqCheck(wh, spark)
      println(s"""{"soak_check":"$wh","rows":$rows,"distinct_seqs":$ds}""")
      sys.exit(0)
    }
    val soakS = sys.env.getOrElse("GRAFT_SOAK_SECONDS", "600").toLong
    val nWriters = sys.env.getOrElse("GRAFT_SOAK_WRITERS", "4").toInt
    val warehouse = Files.createTempDirectory("graft-service-soak").toString
    val ingestDir = Files.createDirectories(
      Paths.get(warehouse).resolveSibling("graft-soak-ingest")).toString

    // the REAL service entry point, unmodified, on a daemon thread
    val engine = new Thread(() => graft.Main.main(Array(warehouse, ingestDir)),
      "soak-engine")
    engine.setDaemon(true)
    engine.start()

    val trustAll = javax.net.ssl.SSLContext.getInstance("TLS")
    trustAll.init(null, Array[javax.net.ssl.TrustManager](
      new javax.net.ssl.X509TrustManager {
        def checkClientTrusted(c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
        def checkServerTrusted(c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
        def getAcceptedIssuers: Array[java.security.cert.X509Certificate] = Array.empty
      }), new java.security.SecureRandom())
    val client = HttpClient.newBuilder().sslContext(trustAll).build()
    val base = "https://127.0.0.1:8086"

    def send(method: String, path: String, body: String = "",
        token: String, contentType: String = ""): HttpResponse[String] = {
      val b = HttpRequest.newBuilder(URI.create(s"$base$path"))
        .header("Authorization", s"Token $token")
      if (contentType.nonEmpty) b.header("Content-Type", contentType)
      val built = method match {
        case "GET" => b.GET()
        case "DELETE" => b.DELETE()
        case _ => b.POST(HttpRequest.BodyPublishers.ofString(body, UTF_8))
      }
      client.send(built.build(), HttpResponse.BodyHandlers.ofString())
    }

    // readiness: /health then provisioned tokens in the catalog
    val healthDeadline = System.nanoTime() + 180L * 1000000000L
    var healthy = false
    while (!healthy && System.nanoTime() < healthDeadline) {
      try healthy = send("GET", "/health", token = "-").statusCode() == 200
      catch { case _: Throwable => Thread.sleep(500) }
    }
    require(healthy, "engine never served /health 200 (is :8086 free?)")
    def tokens() =
      try new graft.store.Catalog(Paths.get(warehouse)).listTokens
      catch { case _: Throwable => Seq.empty }
    while (!tokens().exists(_.description == "greengrass_readwrite"))
      Thread.sleep(200)
    val toks = tokens()
    val rw = toks.find(_.description == "greengrass_readwrite").get.token
    val admin = toks.find(_.description.endsWith("'s Token")).get.token
    println(s"[soak] engine up (warehouse=$warehouse), tokens harvested; " +
      s"${soakS}s of load begins")

    val running = new AtomicBoolean(true)
    val stop = System.nanoTime() + soakS * 1000000000L
    val t0Ns = System.currentTimeMillis() * 1000000L
    val writeStats = new Stats("write")
    val fluxStats = new Stats("flux_query")
    val v1Stats = new Stats("v1_query")
    val adminStats = new Stats("admin")
    val cqStats = new Stats("cq_ddl")
    val delStats = new Stats("delete")
    val seq = new AtomicLong(0L)

    // bisection aid: GRAFT_SOAK_DISABLE=admin,delete,… skips client classes
    val disabled = sys.env.getOrElse("GRAFT_SOAK_DISABLE", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    def loopThread(name: String)(body: () => Unit): Thread = {
      val t = new Thread(() => {
        if (!disabled.exists(name.startsWith)) {
          while (running.get() && System.nanoTime() < stop) {
            try body()
            catch { case e: Throwable =>
              System.err.println(s"[soak] $name client threw: $e"); Thread.sleep(500) }
          }
        }
      }, name)
      t.start(); t
    }
    def timed(st: Stats)(f: => HttpResponse[String]): HttpResponse[String] = {
      val a = System.nanoTime(); val r = f
      st.rec(r.statusCode(), System.nanoTime() - a, r.body()); r
    }

    val threads = scala.collection.mutable.ArrayBuffer.empty[Thread]
    // writers: distinct series per thread, strictly advancing timestamps
    for (w <- 0 until nWriters) threads += loopThread(s"writer-$w") { () =>
      // 1ms steps off a shared counter: every line is a distinct
      // (series, ts) key, so LWW never collapses two writer lines and
      // the final ledger count is exact
      val lines = (0 until 200).map { _ =>
        val i = seq.incrementAndGet()
        s"soak,host=w$w,case=c${i % 50} v=${(i % 997).toDouble} ${t0Ns + i * 1000000L}"
      }.mkString("\n")
      timed(writeStats)(send("POST", s"/api/v2/write?org=$Org&bucket=$Bucket",
        lines, rw))
      ()
    }
    threads += loopThread("flux-1") { () =>
      timed(fluxStats)(send("POST", "/api/v2/query",
        s"""from(bucket: "$Bucket") |> range(start: -2h)""" +
          """ |> filter(fn: (r) => r._measurement == "soak")""" +
          """ |> aggregateWindow(every: 1m, fn: mean)""",
        rw, "application/vnd.flux"))
      ()
    }
    threads += loopThread("flux-2") { () =>
      timed(fluxStats)(send("POST", "/api/v2/query",
        s"""from(bucket: "$Bucket") |> range(start: -2h)""" +
          """ |> filter(fn: (r) => r._measurement == "soak")""" +
          """ |> group(columns: ["host"]) |> count()""",
        rw, "application/vnd.flux"))
      ()
    }
    threads += loopThread("v1") { () =>
      val q = java.net.URLEncoder.encode(
        "SELECT mean(v) FROM soak WHERE time > now() - 1h GROUP BY time(5m)", "UTF-8")
      timed(v1Stats)(send("GET", s"/query?db=$Bucket&q=$q", token = rw))
      val s = java.net.URLEncoder.encode("SHOW MEASUREMENTS", "UTF-8")
      timed(v1Stats)(send("GET", s"/query?db=$Bucket&q=$s", token = rw))
      ()
    }
    val orgIdVal = new graft.store.Catalog(Paths.get(warehouse)).orgId(Org)
    val adminCycle = new AtomicLong(0L)
    threads += loopThread("admin") { () =>
      val n = adminCycle.incrementAndGet()
      val mk = timed(adminStats)(send("POST", "/api/v2/buckets",
        s"""{"name":"soak-tmp-$n","orgID":"$orgIdVal"}""", admin, "application/json"))
      if (mk.statusCode() == 201) {
        val id = "\"id\"\\s*:\\s*\"([^\"]+)\"".r
          .findFirstMatchIn(mk.body()).map(_.group(1)).getOrElse("")
        timed(adminStats)(send("POST", s"/api/v2/write?org=$Org&bucket=soak-tmp-$n",
          s"tmp v=1 ${t0Ns + n}", admin))
        timed(adminStats)(send("GET", "/api/v2/buckets", token = admin))
        timed(adminStats)(send("DELETE", s"/api/v2/buckets/$id", token = admin))
      }
      Thread.sleep(1000)
    }
    // CQ lifecycle: live ~20s, down ~5s — the tail-guard pressure wave
    val cqLive = new AtomicBoolean(false)
    def cqDdl(text: String): HttpResponse[String] = {
      val q = java.net.URLEncoder.encode(text, "UTF-8")
      timed(cqStats)(send("POST", s"/query?db=$Bucket&q=$q", token = admin))
    }
    threads += loopThread("cq") { () =>
      val mk = cqDdl(s"""CREATE CONTINUOUS QUERY soakcq ON "$Bucket" BEGIN """ +
        s"SELECT mean(v) INTO soak_1m FROM soak GROUP BY time(1m) END")
      if (mk.statusCode() == 200) cqLive.set(true)
      Thread.sleep(20000)
      cqDdl(s"""DROP CONTINUOUS QUERY soakcq ON "$Bucket"""")
      cqLive.set(false)
      Thread.sleep(5000)
    }
    threads += loopThread("delete") { () =>
      // an already-written slice: the rewrite contends with the write
      // lock and, under a live CQ tail, must surface as the typed 409.
      // Scoped to the feeder measurement so the writer ledger (inv. 4)
      // stays exact — the REWRITE cost is identical (delete rewrites
      // every intersecting day partition regardless of match count).
      val startIso = java.time.Instant.ofEpochMilli(t0Ns / 1000000L).toString
      val stopIso = java.time.Instant
        .ofEpochMilli(t0Ns / 1000000L + 3600L * 1000L).toString
      timed(delStats)(send("POST", s"/api/v2/delete?org=$Org&bucket=$Bucket",
        s"""{"start":"$startIso","stop":"$stopIso","predicate":"_measurement=\\"ing\\""}""",
        admin, "application/json"))
      Thread.sleep(3000)
    }
    // LP feeder: streaming ingest (10s trigger in Main) into the same
    // bucket/store the HTTP writers append to
    threads += loopThread("feeder") { () =>
      val i = seq.addAndGet(500L) - 499L // reserve [i, i+499]
      val lines = (0 until 500).map(j =>
        s"ing,src=f v=${j.toDouble} ${t0Ns + (i + j) * 1000000L}").mkString("\n")
      Files.write(Paths.get(ingestDir, s"feed-$i.txt"), lines.getBytes(UTF_8))
      Thread.sleep(2000)
    }

    threads.foreach(_ => ()) // all started
    while (System.nanoTime() < stop) Thread.sleep(1000)
    running.set(false)
    threads.foreach(_.join(30000))
    val elapsedS = soakS.toDouble

    // ---- invariant 3: no stuck tails — after the final DROP, a delete
    // must go through within a bounded retry window
    cqDdl(s"""DROP CONTINUOUS QUERY soakcq ON "$Bucket"""")
    var finalDelete = -1
    var tries = 0
    while (finalDelete != 204 && tries < 15) {
      val startIso = java.time.Instant.ofEpochMilli(t0Ns / 1000000L).toString
      val stopIso = java.time.Instant.ofEpochMilli(t0Ns / 1000000L + 2000L).toString
      finalDelete = send("POST", s"/api/v2/delete?org=$Org&bucket=$Bucket",
        s"""{"start":"$startIso","stop":"$stopIso","predicate":"_measurement=\\"ing\\""}""",
        admin, "application/json").statusCode()
      tries += 1
      if (finalDelete != 204) Thread.sleep(2000)
    }
    val healthAfter = send("GET", "/health", token = "-").statusCode()

    // ---- invariant 4: the write ledger + hwm coverage. StaleScan on
    // the reads: the live service's CQ/maintenance can still rewrite
    // while we audit.
    val spark = org.apache.spark.sql.SparkSession.builder().getOrCreate()
    val (rows, distinctSeqs) = graft.store.StaleScan.retry("soak audit")(
      seqCheck(warehouse, spark))
    val telePath = new graft.store.Catalog(Paths.get(warehouse))
      .bucketPath(Bucket).toString
    import org.apache.spark.sql.functions.{col, max => smax}
    val soakRows = graft.store.StaleScan.retry("soak ledger")(
      spark.read.parquet(telePath)
        .where(col("measurement") === "soak").count())
    val write204s = writeStats.count(_ == 204)
    val maxSeqOnDisk = graft.store.StaleScan.retry("soak hwm audit")(
      Option(spark.read.parquet(telePath)
        .agg(smax(col("_ingest_seq"))).head().get(0))
        .fold(0L)(_.asInstanceOf[Long]))
    val hwm = new String(Files.readAllBytes(
      Paths.get(warehouse, "_ingest_seq_hwm")), UTF_8).trim.toLong

    val all = Seq(writeStats, fluxStats, v1Stats, adminStats, cqStats, delStats)
    all.foreach(s => println(s.json(elapsedS)))
    val s5xx = all.map(s => s.name -> s.count(_ >= 500)).filter(_._2 > 0)
    all.filter(s => !s.errSamples.isEmpty).foreach { s =>
      s.errSamples.forEach(b => System.err.println(s"[soak] ${s.name} 5xx sample: $b"))
    }
    val del409 = delStats.count(_ == 409)
    val delBad = delStats.count(c => c != 204 && c != 409)
    println(s"""{"soak":"service","seconds":$soakS,"rows":$rows,""" +
      s""""distinct_seqs":$distinctSeqs,"soak_rows":$soakRows,""" +
      s""""write_204s":$write204s,"delete_409s":$del409,""" +
      s""""max_seq":$maxSeqOnDisk,"hwm":$hwm,""" +
      s""""final_delete":$finalDelete,"final_health":$healthAfter}""")

    def fail(msg: String): Unit = { System.err.println(s"[soak] FAIL: $msg"); sys.exit(1) }
    if (s5xx.nonEmpty) fail(s"5xx responses under contention: $s5xx")
    if (delBad > 0) fail(s"$delBad delete responses outside {204, 409}")
    if (soakS >= 120 && del409 == 0)
      fail("no 409 observed — the tail-guard was never exercised")
    if (finalDelete != 204) fail(s"STUCK TAIL: delete still refused " +
      s"($finalDelete) ${tries}x after the CQ was dropped")
    if (healthAfter != 200) fail(s"service unhealthy after soak: $healthAfter")
    if (soakRows != 200L * write204s)
      fail(s"WRITE LEDGER broke: $soakRows soak rows on disk, " +
        s"expected ${200L * write204s} (200 x $write204s acked batches) — " +
        "an append was lost or double-applied under contention")
    if (maxSeqOnDisk > hwm)
      fail(s"hwm $hwm below max on-disk seq $maxSeqOnDisk — " +
        "a restart could re-issue a used sequence")
    if (rows == 0L) fail("no rows survived — the soak wrote nothing?")
    println("[soak] PASS: all service-contention invariants held")
    sys.exit(0)
  }
}
