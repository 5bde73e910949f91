package graft.streaming

import graft.SparkSpec
import graft.dsl.Tsdb
import graft.service.{HttpApi, Json}
import graft.store.TokenRecord
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The reference deployment's actual use case is telemetry HEALTH
  * monitoring (reference: README.md:292-297) — the stdlib pattern a v2
  * user runs next is a scheduled `monitor.check` task writing level
  * statuses into a monitoring bucket, then `monitor.stateChanges`
  * over it for alerting. End-to-end here: a task registered over
  * /api/v2/tasks classifies every point (crit/warn/ok), `to()` folds
  * the status dimensions into tags on the `statuses` measurement, the
  * status bucket accumulates idempotently across runs, and
  * stateChanges recovers the exact crit-entry count of the seeded
  * waveform.
  */
class MonitorTaskSpec extends SparkSpec {

  private lazy val tsdb: Tsdb = {
    val t = Tsdb(spark, Files.createTempDirectory("graft-monitor-spec").toString)
    t.catalog.createOrg("greengrass")
    t.catalog.createBucket("raw", "greengrass")
    t.catalog.createBucket("status", "greengrass")
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

  // Sawtooth per host: value = i % 12 at 30s spacing, hosts alternate.
  // h1 sees 0,2,4,6,8,10 repeating; h2 sees 1,3,5,7,9,11 — each host
  // ENTERS crit (v > 8) exactly once per 12-step cycle.
  private lazy val seeded: Boolean = {
    val body = (0 until 120).map { i =>
      val host = if (i % 2 == 0) "h1" else "h2"
      s"cpu,host=$host usage=${(i % 12).toDouble} ${(t0 + i * 30L) * 1000000000L}"
    }.mkString("\n")
    val r = req("POST", "/api/v2/write?bucket=raw", body)
    assert(r.statusCode() == 204, r.body())
    true
  }

  private val checkFlux =
    """option task = {name: "cpu-health", every: 1h}
      |from(bucket: "raw")
      ||> range(start: 2024-01-15T00:00:00Z, stop: 2024-01-16T00:00:00Z)
      ||> filter(fn: (r) => r._measurement == "cpu")
      ||> monitor.check(crit: (r) => r._value > 8.0, warn: (r) => r._value > 5.0, data: {_check_name: "cpu-check"})
      ||> to(bucket: "status")""".stripMargin

  private var taskId: String = _

  test("a scheduled monitor.check task registers over /api/v2/tasks") {
    assert(seeded)
    val n = mapper.createObjectNode()
    n.put("org", "greengrass")
    n.put("flux", checkFlux)
    val r = req("POST", "/api/v2/tasks", mapper.writeValueAsString(n))
    assert(r.statusCode() == 201, r.body())
    val node = mapper.readTree(r.body())
    assert(node.get("name").asText() == "cpu-health")
    taskId = node.get("id").asText()
    assert(taskId.nonEmpty)
  }

  test("a run classifies every point and accumulates statuses idempotently") {
    val run = req("POST", s"/api/v2/tasks/$taskId/runs")
    assert(run.statusCode() == 201, run.body())

    val status = tsdb.from("status").df
    assert(status.count() == 120, "one status row per seeded point")
    assert(status.select("measurement").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("statuses"))

    val byLevel = status.groupBy(col("tags")("_level").as("level"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // per 12-cycle and host pair: v in 9..11 → crit (3), 6..8 → warn
    // (3), 0..5 → ok (6); 120 points = 10 cycles
    assert(byLevel == Map("crit" -> 30L, "warn" -> 30L, "ok" -> 60L), byLevel.toString)
    assert(status.select(col("tags")("_check_name")).distinct().collect()
      .map(_.getString(0)).toSeq == Seq("cpu-check"))
    assert(status.select(col("tags")("_source_measurement")).distinct().collect()
      .map(_.getString(0)).toSeq == Seq("cpu"))

    // re-run: LWW dedup keeps one status per (series, time) — the
    // schedule re-firing must not double the bucket
    req("POST", s"/api/v2/tasks/$taskId/runs")
    assert(tsdb.from("status").df.count() == 120)
  }

  test("monitor.stateChanges over the status bucket finds every crit entry") {
    val status = tsdb.from("status")
    val withCols = status.copy(df = status.df
      .withColumn("host", col("tags")("host"))
      .withColumn("_level", col("tags")("_level")))
      .group("host")
    val entries = withCols.monitorStateChanges(toLevel = "crit").df
    // each host enters crit once per cycle; 10 cycles × 2 hosts —
    // minus nothing at the seam (the sawtooth leaves crit every cycle)
    assert(entries.count() == 20, s"crit entries: ${entries.count()}")
    val perHost = entries.groupBy("host").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perHost == Map("h1" -> 10L, "h2" -> 10L), perHost.toString)
    // stateChangesOnly-style: no pinned levels → every level flip
    val flips = withCols.monitorStateChanges().df.count()
    assert(flips > 20, s"expected more unpinned flips than crit entries, got $flips")
  }
}
