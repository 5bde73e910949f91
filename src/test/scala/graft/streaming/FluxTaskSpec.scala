package graft.streaming

import graft.SparkSpec
import graft.dsl.Tsdb
import graft.service.{HttpApi, Json}
import graft.store.TokenRecord
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

/** /api/v2/tasks lifecycle: POST a Flux script led by `option task =
  * {…}`, it downsamples into the target bucket when it runs, GET
  * lists it (with `every` echoed from the option header), DELETE
  * stops it — the v2-native scheduled-downsampling path
  * (DownsampleTask covers the v1 CQ form of the same pipeline).
  */
class FluxTaskSpec extends SparkSpec {

  private lazy val tsdb: Tsdb = {
    val t = Tsdb(spark, Files.createTempDirectory("graft-task-spec").toString)
    t.catalog.createOrg("greengrass")
    t.catalog.createBucket("raw", "greengrass")
    t.catalog.createBucket("agg", "greengrass")
    t.catalog.addToken(TokenRecord("1", "greengrass_readwrite", "rwTok",
      "active", "admin", "u1", Seq("read:buckets", "write:buckets")))
    t
  }
  private lazy val api = new HttpApi(tsdb).start()
  private lazy val base = s"http://127.0.0.1:${api.boundPort}"
  private val client = HttpClient.newHttpClient()
  private val mapper = Json.mapper

  private def req(method: String, path: String, body: String = ""): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(s"$base$path"))
      .header("Authorization", "Token rwTok")
    val built = method match {
      case "GET" => b.GET()
      case "DELETE" => b.DELETE()
      case "POST" => b.POST(HttpRequest.BodyPublishers.ofString(body))
    }
    client.send(built.build(), HttpResponse.BodyHandlers.ofString())
  }

  private val t0 = 1705276800L // 2024-01-15T00:00:00Z
  private def lp(sec: Long, host: String, v: Double) =
    s"cpu,host=$host usage=$v ${(t0 + sec) * 1000000000L}"

  private lazy val seeded: Boolean = {
    val body = (0 until 120).map(i => lp(i * 30L, if (i % 2 == 0) "h1" else "h2",
      (i % 10).toDouble)).mkString("\n")
    val r = req("POST", "/api/v2/write?bucket=raw", body)
    assert(r.statusCode() == 204, r.body())
    true
  }

  private val taskFlux =
    """option task = {name: "downsample-cpu", every: 1h, offset: 5m}
      |from(bucket: "raw")
      ||> range(start: 2024-01-15T00:00:00Z, stop: 2024-01-16T00:00:00Z)
      ||> filter(fn: (r) => r._measurement == "cpu")
      ||> aggregateWindow(every: 10m, fn: mean)
      ||> to(bucket: "agg")""".stripMargin

  private var taskId: String = _

  test("POST /api/v2/tasks parses the option header and registers the task") {
    assert(seeded)
    // a script without the option header is rejected
    val bad = req("POST", "/api/v2/tasks", mapper.writeValueAsString {
      val n = mapper.createObjectNode()
      n.put("org", "greengrass")
      n.put("flux", "from(bucket: \"raw\") |> range(start: 2024-01-15T00:00:00Z) |> to(bucket: \"agg\")")
      n
    })
    assert(bad.statusCode() == 400, bad.body())

    val n = mapper.createObjectNode()
    n.put("org", "greengrass")
    n.put("flux", taskFlux)
    val r = req("POST", "/api/v2/tasks", mapper.writeValueAsString(n))
    assert(r.statusCode() == 201, r.body())
    val node = mapper.readTree(r.body())
    assert(node.get("name").asText() == "downsample-cpu")
    assert(node.get("every").asText() == "1h")
    assert(node.get("offset").asText() == "5m")
    assert(node.get("status").asText() == "active")
    assert(node.get("org").asText() == "greengrass")
    assert(node.get("flux").asText() == taskFlux)
    taskId = node.get("id").asText()
    assert(taskId.nonEmpty)
  }

  test("the task materializes downsampled rows into the target bucket on trigger") {
    // manual trigger (the /runs surface) instead of sleeping through
    // the 1h cadence
    val run = req("POST", s"/api/v2/tasks/$taskId/runs")
    assert(run.statusCode() == 201, run.body())
    val out = tsdb.from("agg").df
    val rows = out.count()
    // 120 points over 1h at 30s spacing → 10m windows × 2 hosts
    assert(rows > 0, "task run wrote nothing")
    import org.apache.spark.sql.functions._
    val windows = out.select(col("time")).distinct().count()
    assert(windows >= 6, s"expected >=6 distinct 10m windows, got $windows")
    // re-running refines, not duplicates: LWW dedup keeps one point
    // per (series, window)
    req("POST", s"/api/v2/tasks/$taskId/runs")
    assert(tsdb.from("agg").df.count() == rows)
  }

  test("GET lists the task; GET by id fetches it") {
    val list = req("GET", "/api/v2/tasks")
    assert(list.statusCode() == 200)
    val tasks = mapper.readTree(list.body()).get("tasks")
    assert(tasks.size() == 1)
    assert(tasks.get(0).get("name").asText() == "downsample-cpu")
    val one = req("GET", s"/api/v2/tasks/$taskId")
    assert(one.statusCode() == 200)
    assert(mapper.readTree(one.body()).get("id").asText() == taskId)
    // duplicate names are rejected while the task exists
    val n = mapper.createObjectNode()
    n.put("org", "greengrass")
    n.put("flux", taskFlux)
    assert(req("POST", "/api/v2/tasks", mapper.writeValueAsString(n)).statusCode() == 400)
  }

  test("DELETE stops and removes the task") {
    assert(req("DELETE", s"/api/v2/tasks/$taskId").statusCode() == 204)
    assert(req("GET", s"/api/v2/tasks/$taskId").statusCode() == 404)
    assert(req("DELETE", s"/api/v2/tasks/$taskId").statusCode() == 404)
    assert(mapper.readTree(req("GET", "/api/v2/tasks").body()).get("tasks").size() == 0)
    // manual runs on a deleted task 404 too
    assert(req("POST", s"/api/v2/tasks/$taskId/runs").statusCode() == 404)
  }

  test("a failing script surfaces lastRunError without cancelling the schedule") {
    val flux =
      """option task = {name: "bad-task", every: 1s}
        |from(bucket: "raw") |> range(start: 2024-01-15T00:00:00Z) |> to(bucket: "missing-sink")""".stripMargin
    val n = mapper.createObjectNode()
    n.put("org", "greengrass")
    n.put("flux", flux)
    val r = req("POST", "/api/v2/tasks", mapper.writeValueAsString(n))
    assert(r.statusCode() == 201, r.body())
    val id = mapper.readTree(r.body()).get("id").asText()
    // wait for at least one scheduled run to fail
    val deadline = System.nanoTime() + 15000000000L
    var errSeen = false
    while (!errSeen && System.nanoTime() < deadline) {
      Thread.sleep(200)
      val one = req("GET", s"/api/v2/tasks/$id")
      errSeen = mapper.readTree(one.body()).has("lastRunError")
    }
    assert(errSeen, "scheduled run never recorded an error")
    // still listed (the schedule survives failures), then clean up
    assert(req("GET", s"/api/v2/tasks/$id").statusCode() == 200)
    assert(req("DELETE", s"/api/v2/tasks/$id").statusCode() == 204)
  }

  test("POST without an org 400s; an unknown org or orgID 404s") {
    val flux = taskFlux.replace("downsample-cpu", "org-checks")
    val none = mapper.createObjectNode()
    none.put("flux", flux)
    assert(req("POST", "/api/v2/tasks", mapper.writeValueAsString(none)).statusCode() == 400)
    val badName = mapper.createObjectNode()
    badName.put("flux", flux); badName.put("org", "no-such-org")
    assert(req("POST", "/api/v2/tasks", mapper.writeValueAsString(badName)).statusCode() == 404)
    val badId = mapper.createObjectNode()
    badId.put("flux", flux); badId.put("orgID", "ffffffffffffffff")
    assert(req("POST", "/api/v2/tasks", mapper.writeValueAsString(badId)).statusCode() == 404)
    // an orgID that resolves works (no silent fallback to a default org)
    val goodId = mapper.createObjectNode()
    goodId.put("flux", flux)
    goodId.put("orgID", tsdb.catalog.orgId("greengrass"))
    val ok = req("POST", "/api/v2/tasks", mapper.writeValueAsString(goodId))
    assert(ok.statusCode() == 201, ok.body())
    val node = mapper.readTree(ok.body())
    assert(node.get("org").asText() == "greengrass")
    req("DELETE", s"/api/v2/tasks/${node.get("id").asText()}")
  }

  test("calendar cadences (1mo/1y) register, echo, persist, and honor manual runs") {
    val flux =
      """option task = {name: "monthly", every: 1mo}
        |from(bucket: "raw")
        ||> range(start: 2024-01-15T00:00:00Z, stop: 2024-01-16T00:00:00Z)
        ||> aggregateWindow(every: 1h, fn: mean)
        ||> to(bucket: "agg")""".stripMargin
    val n = mapper.createObjectNode()
    n.put("org", "greengrass"); n.put("flux", flux)
    val r = req("POST", "/api/v2/tasks", mapper.writeValueAsString(n))
    assert(r.statusCode() == 201, r.body())
    val node = mapper.readTree(r.body())
    val id = node.get("id").asText()
    assert(node.get("every").asText() == "1mo", node.toString)
    // persisted as months, not a fake ns width
    val rec = tsdb.catalog.listTasks.find(_.id == id).get
    assert(rec.everyMonths == 1 && rec.everyNs == 0L)
    // manual trigger works like any task
    assert(req("POST", s"/api/v2/tasks/$id/runs").statusCode() == 201)
    assert(req("DELETE", s"/api/v2/tasks/$id").statusCode() == 204)

    // 2y echoes in years; calendar units stay invalid as offsets
    val yearly = flux.replace("monthly", "yearly").replace("every: 1mo", "every: 2y")
    val ny = mapper.createObjectNode()
    ny.put("org", "greengrass"); ny.put("flux", yearly)
    val ry = req("POST", "/api/v2/tasks", mapper.writeValueAsString(ny))
    assert(ry.statusCode() == 201, ry.body())
    val yNode = mapper.readTree(ry.body())
    assert(yNode.get("every").asText() == "2y", yNode.toString)
    req("DELETE", s"/api/v2/tasks/${yNode.get("id").asText()}")
    val badOffset = flux.replace("monthly", "bad-offset")
      .replace("every: 1mo", "every: 1mo, offset: 1mo")
    val nb = mapper.createObjectNode()
    nb.put("org", "greengrass"); nb.put("flux", badOffset)
    val rb = req("POST", "/api/v2/tasks", mapper.writeValueAsString(nb))
    assert(rb.statusCode() == 400, rb.body())
    assert(rb.body().contains("calendar unit"), rb.body())
  }

  test("nextCalendarFireNs lands on epoch-aligned UTC month boundaries") {
    val tasks = new FluxTasks(() => graft.flux.FluxEval.Source(
      resolve = b => sys.error(s"no bucket $b")))
    def ns(iso: String): Long =
      java.time.Instant.parse(iso).toEpochMilli * 1000000L
    // mid-January → next month boundary
    assert(tasks.nextCalendarFireNs(ns("2024-01-15T12:00:00Z"), 1, 0L)
      == ns("2024-02-01T00:00:00Z"))
    // quarters are epoch-aligned: Jan/Apr/Jul/Oct
    assert(tasks.nextCalendarFireNs(ns("2024-02-10T00:00:00Z"), 3, 0L)
      == ns("2024-04-01T00:00:00Z"))
    // a year fires Jan 1
    assert(tasks.nextCalendarFireNs(ns("2024-05-01T00:00:00Z"), 12, 0L)
      == ns("2025-01-01T00:00:00Z"))
    // an offset inside the CURRENT period still fires this period
    assert(tasks.nextCalendarFireNs(ns("2024-01-01T00:30:00Z"), 1, 3600L * 1000000000L)
      == ns("2024-01-01T01:00:00Z"))
    // exactly on the fire instant → strictly after: next period
    assert(tasks.nextCalendarFireNs(ns("2024-02-01T00:00:00Z"), 1, 0L)
      == ns("2024-03-01T00:00:00Z"))
    // leap-year February has its true length (Feb→Mar 2024 is 29 days)
    assert(tasks.nextCalendarFireNs(ns("2024-02-15T00:00:00Z"), 1, 0L)
      == ns("2024-03-01T00:00:00Z"))
    tasks.stopAll()
  }

  test("lastRunError records on a failed manual run and clears once a run succeeds") {
    val flux =
      """option task = {name: "late-sink", every: 1h}
        |from(bucket: "raw")
        ||> range(start: 2024-01-15T00:00:00Z, stop: 2024-01-15T01:00:00Z)
        ||> aggregateWindow(every: 10m, fn: mean)
        ||> to(bucket: "late-bucket")""".stripMargin
    val n = mapper.createObjectNode()
    n.put("org", "greengrass"); n.put("flux", flux)
    val r = req("POST", "/api/v2/tasks", mapper.writeValueAsString(n))
    assert(r.statusCode() == 201, r.body())
    val id = mapper.readTree(r.body()).get("id").asText()
    // manual run against a missing sink bucket: fails AND records
    val fail = req("POST", s"/api/v2/tasks/$id/runs")
    assert(fail.statusCode() >= 400, fail.body())
    assert(mapper.readTree(req("GET", s"/api/v2/tasks/$id").body()).has("lastRunError"))
    // create the sink; the next run succeeds and clears the stale error
    tsdb.catalog.createBucket("late-bucket", "greengrass")
    assert(req("POST", s"/api/v2/tasks/$id/runs").statusCode() == 201)
    assert(!mapper.readTree(req("GET", s"/api/v2/tasks/$id").body()).has("lastRunError"))
    req("DELETE", s"/api/v2/tasks/$id")
  }

  test("PATCH toggles task status; inactive persists to the catalog unarmed") {
    val flux = taskFlux.replace("downsample-cpu", "pausable")
    val n = mapper.createObjectNode()
    n.put("org", "greengrass"); n.put("flux", flux)
    val r = req("POST", "/api/v2/tasks", mapper.writeValueAsString(n))
    assert(r.statusCode() == 201, r.body())
    val id = mapper.readTree(r.body()).get("id").asText()
    def patch(status: String) = {
      val b = mapper.createObjectNode(); b.put("status", status)
      val rb = java.net.http.HttpRequest.newBuilder(URI.create(s"$base/api/v2/tasks/$id"))
        .header("Authorization", "Token rwTok")
        .method("PATCH", HttpRequest.BodyPublishers.ofString(mapper.writeValueAsString(b)))
      client.send(rb.build(), HttpResponse.BodyHandlers.ofString())
    }
    val off = patch("inactive")
    assert(off.statusCode() == 200, off.body())
    assert(mapper.readTree(off.body()).get("status").asText() == "inactive")
    // persisted inactive: a reload would skip arming it
    assert(tsdb.catalog.listTasks.find(_.id == id).exists(_.status == "inactive"))
    // manual trigger still honored while paused
    assert(req("POST", s"/api/v2/tasks/$id/runs").statusCode() == 201)
    assert(patch("active").statusCode() == 200)
    assert(tsdb.catalog.listTasks.find(_.id == id).exists(_.status == "active"))
    assert(patch("bogus").statusCode() == 400)
    assert(req("DELETE", s"/api/v2/tasks/$id").statusCode() == 204)
  }

  test("a multi-statement task with two standalone to() sinks runs both (runScript)") {
    // two unnamed standalone pipelines both default to result name
    // `_result` — the HTTP query surface rejects that (duplicate CSV
    // section keys), but the TASK surface has no result sections: the
    // reference task engine runs every sink, so runScript must too
    tsdb.catalog.createBucket("sink-a", "greengrass")
    tsdb.catalog.createBucket("sink-b", "greengrass")
    val flux =
      """option task = {name: "dual-sink", every: 1h}
        |base = from(bucket: "raw")
        ||> range(start: 2024-01-15T00:00:00Z, stop: 2024-01-16T00:00:00Z)
        ||> filter(fn: (r) => r._measurement == "cpu")
        |base |> aggregateWindow(every: 10m, fn: mean) |> to(bucket: "sink-a")
        |base |> aggregateWindow(every: 1h, fn: max) |> to(bucket: "sink-b")""".stripMargin
    val n = mapper.createObjectNode()
    n.put("org", "greengrass"); n.put("flux", flux)
    val r = req("POST", "/api/v2/tasks", mapper.writeValueAsString(n))
    assert(r.statusCode() == 201, r.body())
    val id = mapper.readTree(r.body()).get("id").asText()
    assert(req("POST", s"/api/v2/tasks/$id/runs").statusCode() == 201)
    assert(tsdb.from("sink-a").df.count() > 0, "first to() sink not written")
    assert(tsdb.from("sink-b").df.count() > 0, "second to() sink not written")
    // no stale error: the multi-result script ran, it was not refused
    assert(!mapper.readTree(req("GET", s"/api/v2/tasks/$id").body()).has("lastRunError"))
    assert(req("DELETE", s"/api/v2/tasks/$id").statusCode() == 204)
  }

  test("tasks persist in the catalog and reschedule after an engine restart") {
    val root = Files.createTempDirectory("graft-task-restart").toString
    def boot(): (Tsdb, HttpApi, String) = {
      val t = Tsdb(spark, root)
      val a = new HttpApi(t).start()
      (t, a, s"http://127.0.0.1:${a.boundPort}")
    }
    def reqAt(b: String, method: String, path: String, body: String = "") = {
      val rb = java.net.http.HttpRequest.newBuilder(URI.create(s"$b$path"))
        .header("Authorization", "Token rwTok2")
      val built = method match {
        case "GET" => rb.GET()
        case "POST" => rb.POST(HttpRequest.BodyPublishers.ofString(body))
        case "DELETE" => rb.DELETE()
      }
      client.send(built.build(), HttpResponse.BodyHandlers.ofString())
    }

    // boot 1: provision + seed + create the task
    val (t1, api1, base1) = boot()
    t1.catalog.createOrg("greengrass")
    t1.catalog.createBucket("raw2", "greengrass")
    t1.catalog.createBucket("agg2", "greengrass")
    t1.catalog.addToken(TokenRecord("2", "greengrass_readwrite", "rwTok2",
      "active", "admin", "u1", Seq("read:buckets", "write:buckets")))
    val seed = (0 until 60).map(i =>
      s"cpu,host=h1 usage=${(i % 7).toDouble} ${(t0 + i * 60L) * 1000000000L}").mkString("\n")
    assert(reqAt(base1, "POST", "/api/v2/write?bucket=raw2", seed).statusCode() == 204)
    val flux =
      """option task = {name: "restart-survivor", every: 1h}
        |from(bucket: "raw2")
        ||> range(start: 2024-01-15T00:00:00Z, stop: 2024-01-16T00:00:00Z)
        ||> aggregateWindow(every: 10m, fn: mean)
        ||> to(bucket: "agg2")""".stripMargin
    val n = mapper.createObjectNode()
    n.put("org", "greengrass"); n.put("flux", flux)
    val created = reqAt(base1, "POST", "/api/v2/tasks", mapper.writeValueAsString(n))
    assert(created.statusCode() == 201, created.body())
    val id = mapper.readTree(created.body()).get("id").asText()
    api1.stop()

    // boot 2: same warehouse, fresh Tsdb + HttpApi — the task must be
    // listed (reloaded from the catalog) and fire on manual trigger
    val (t2, api2, base2) = boot()
    try {
      val list = mapper.readTree(reqAt(base2, "GET", "/api/v2/tasks").body()).get("tasks")
      assert(list.size() == 1, list.toString)
      assert(list.get(0).get("id").asText() == id)
      assert(list.get(0).get("name").asText() == "restart-survivor")
      assert(list.get(0).get("every").asText() == "1h")
      assert(reqAt(base2, "POST", s"/api/v2/tasks/$id/runs").statusCode() == 201)
      assert(t2.from("agg2").df.count() > 0, "rescheduled task run wrote nothing")
      // delete is the only unpersisting path: a third boot sees nothing
      assert(reqAt(base2, "DELETE", s"/api/v2/tasks/$id").statusCode() == 204)
    } finally api2.stop()
    val (_, api3, base3) = boot()
    try assert(mapper.readTree(
      reqAt(base3, "GET", "/api/v2/tasks").body()).get("tasks").size() == 0)
    finally api3.stop()
  }
}
