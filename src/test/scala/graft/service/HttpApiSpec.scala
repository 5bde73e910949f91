package graft.service

import graft.SparkSpec
import graft.dsl.Tsdb
import graft.store.TokenRecord
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

/** Drives the /api/v2 HTTP surface end-to-end with a real client:
  * token-authed LP write → Flux query → annotated-CSV response.
  */
class HttpApiSpec extends SparkSpec {

  private lazy val tsdb: Tsdb = {
    val t = Tsdb(spark, Files.createTempDirectory("graft-http-spec").toString)
    t.catalog.createBucket("telemetry", "greengrass")
    // modern catalog: capability comes from recorded permission strings
    // (the unscoped all-access form here — per-bucket scoping has its
    // own dedicated test below)
    t.catalog.addToken(TokenRecord("1", "admin's Token", "admTok", "active", "admin", "u1",
      Seq("read:authorizations", "write:authorizations")))
    t.catalog.addToken(TokenRecord("2", "greengrass_read", "roTok", "active", "admin", "u1",
      Seq("read:buckets")))
    t.catalog.addToken(TokenRecord("3", "greengrass_readwrite", "rwTok", "active", "admin", "u1",
      Seq("read:buckets", "write:buckets")))
    t
  }
  private lazy val api = new HttpApi(tsdb).start()
  private lazy val base = s"http://127.0.0.1:${api.boundPort}"
  private val client = HttpClient.newHttpClient()

  private def post(path: String, body: String, token: Option[String]): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(s"$base$path"))
      .POST(HttpRequest.BodyPublishers.ofString(body))
    token.foreach(t => b.header("Authorization", s"Token $t"))
    client.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }
  private def get(path: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"$base$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  private val t0 = 1705276800L * 1000000000L

  test("health and ping respond like the engine") {
    assert(get("/health").statusCode() == 200)
    assert(get("/health").body().contains("\"pass\""))
    assert(get("/ping").statusCode() == 204)
  }

  test("write requires a write-capable token") {
    val lp = s"cpu,host=h1 usage=0.5 $t0"
    assert(post("/api/v2/write?bucket=telemetry", lp, None).statusCode() == 401)
    // active token without a write grant: 403 (insufficient SCOPE,
    // distinct from 401 = no/invalid token)
    assert(post("/api/v2/write?bucket=telemetry", lp, Some("roTok")).statusCode() == 403)
    assert(post("/api/v2/write?bucket=telemetry", lp, Some("rwTok")).statusCode() == 204)
    assert(post("/api/v2/write?bucket=nope", lp, Some("rwTok")).statusCode() == 404)
  }

  test("write accepts gzip-encoded bodies (the Telegraf default)") {
    import org.apache.spark.sql.functions.col
    tsdb.catalog.createBucket("gzb", "greengrass")
    val lp = s"gz,host=h9 v=42 ${1706400000L * 1000000000L}"
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.GZIPOutputStream(bos)
    z.write(lp.getBytes("UTF-8")); z.close()
    val req = HttpRequest.newBuilder(URI.create(s"$base/api/v2/write?bucket=gzb"))
      .header("Authorization", "Token rwTok")
      .header("Content-Encoding", "gzip")
      .POST(HttpRequest.BodyPublishers.ofByteArray(bos.toByteArray)).build()
    assert(client.send(req, HttpResponse.BodyHandlers.ofString()).statusCode() == 204)
    val got = tsdb.from("gzb").toDF
      .filter(col("measurement") === "gz").select("value_f")
    assert(got.collect().map(_.getDouble(0)).toSeq == Seq(42.0))
  }

  test("/write v1-compat endpoint: db param maps onto the bucket, then /query reads it") {
    tsdb.catalog.createBucket("v1wb", "greengrass")
    val sec = 1706486400L // 2024-01-29T00:00:00Z
    assert(post(s"/write?db=v1wb&precision=s",
      s"temp,room=a c=21.5 $sec", Some("rwTok")).statusCode() == 204)
    assert(post(s"/write?db=nope", "x y=1", Some("rwTok")).statusCode() == 404)
    assert(post(s"/write?db=v1wb", "x y=1", Some("roTok")).statusCode() == 403)
    val r = get(s"/query?db=v1wb&epoch=s&q=${java.net.URLEncoder.encode(
      "SELECT last(\"c\") FROM \"temp\"", "UTF-8")}&auth=ignored")
    assert(r.statusCode() == 401) // no token on the bare GET helper
    val req = HttpRequest.newBuilder(URI.create(s"$base/query?db=v1wb&epoch=s&q=" +
      java.net.URLEncoder.encode("SELECT last(\"c\") FROM \"temp\"", "UTF-8")))
      .header("Authorization", "Token roTok").GET().build()
    val body = client.send(req, HttpResponse.BodyHandlers.ofString()).body()
    assert(body ==
      s"""{"results":[{"statement_id":0,"series":[{"name":"temp","columns":["time","last"],"values":[[$sec,21.5]]}]}]}""")
  }

  test("write precision= param scales timestamps to the same stored ns") {
    import org.apache.spark.sql.functions.col
    tsdb.catalog.createBucket("precb", "greengrass")
    val sec = 1706313600L // 2024-01-27T00:00:00Z
    // the same instant written at four precisions must store one time_ns
    assert(post(s"/api/v2/write?bucket=precb&precision=s",
      s"p,u=s v=1 $sec", Some("rwTok")).statusCode() == 204)
    assert(post(s"/api/v2/write?bucket=precb&precision=ms",
      s"p,u=ms v=1 ${sec * 1000L}", Some("rwTok")).statusCode() == 204)
    assert(post(s"/api/v2/write?bucket=precb&precision=us",
      s"p,u=us v=1 ${sec * 1000000L}", Some("rwTok")).statusCode() == 204)
    assert(post(s"/api/v2/write?bucket=precb",
      s"p,u=ns v=1 ${sec * 1000000000L}", Some("rwTok")).statusCode() == 204)
    val stored = tsdb.from("precb").df
      .select(col("time_ns")).distinct().collect().map(_.getLong(0)).toSeq
    assert(stored == Seq(sec * 1000000000L))
    assert(post("/api/v2/write?bucket=precb&precision=m", "p v=1", Some("rwTok"))
      .statusCode() == 400)
  }

  test("to() in a query body needs a write-capable token") {
    val q = """from(bucket: "telemetry") |> to(bucket: "telemetry")"""
    val r = post("/api/v2/query", q, Some("roTok"))
    assert(r.statusCode() == 403)
    assert(r.body().contains("no write grant"))
    val missing = post("/api/v2/query",
      """from(bucket: "telemetry") |> to(bucket: "nope")""", Some("rwTok"))
    assert(missing.statusCode() == 400)
    assert(missing.body().contains("not found"))
  }

  test("malformed line protocol is a 400, not a 500") {
    val r = post("/api/v2/write?bucket=telemetry", "cpu,host= broken", Some("rwTok"))
    assert(r.statusCode() == 400)
    assert(r.body().contains("message"))
  }

  test("flux query round-trips to annotated CSV") {
    post("/api/v2/write?bucket=telemetry",
      Seq(s"cpu,host=h1 usage=0.25 $t0",
          s"cpu,host=h1 usage=0.75 ${t0 + 60L * 1000000000L}").mkString("\n"),
      Some("rwTok"))
    val q =
      """from(bucket: "telemetry")
        ||> filter(fn: (r) => r._measurement == "cpu" and r._field == "usage")
        ||> mean()""".stripMargin
    val r = post("/api/v2/query", q, Some("roTok"))
    assert(r.statusCode() == 200)
    val body = r.body()
    assert(body.startsWith("#datatype"))
    assert(body.contains("#group"))
    assert(body.contains("#default,_result"))
    assert(body.contains(",result,table"))
    assert(body.contains("0.5")) // mean of 0.25, 0.75
  }

  test("schema package resolves over the canonical store (tags map path)") {
    post("/api/v2/write?bucket=telemetry",
      Seq(s"cpu,host=h1 usage=0.25 $t0",
          s"cpu,host=h2 usage=0.75 ${t0 + 60L * 1000000000L}",
          s"mem,host=h1 used=0.5 $t0").mkString("\n"),
      Some("rwTok"))
    def values(q: String): Seq[String] = {
      val r = post("/api/v2/query", q, Some("roTok"))
      assert(r.statusCode() == 200, r.body())
      // annotated CSV: data rows are ,_result,<table>,<value>
      r.body().linesIterator.filterNot(l => l.startsWith("#") || l.trim.isEmpty)
        .drop(1).map(_.split(",").last).toSeq
    }
    assert(values(
      """import "influxdata/influxdb/schema"
        |schema.measurements(bucket: "telemetry")""".stripMargin) == Seq("cpu", "mem"))
    assert(values(
      """import "influxdata/influxdb/schema"
        |schema.tagValues(bucket: "telemetry", tag: "host")""".stripMargin) == Seq("h1", "h2"))
    assert(values(
      """import "influxdata/influxdb/schema"
        |schema.tagKeys(bucket: "telemetry")""".stripMargin) == Seq("host"))
    assert(values(
      """import "influxdata/influxdb/schema"
        |schema.fieldKeys(bucket: "telemetry")""".stripMargin) == Seq("usage", "used"))
  }

  test("buckets() lists the catalog (Grafana Flux health check)") {
    val r = post("/api/v2/query", "buckets()", Some("roTok"))
    assert(r.statusCode() == 200, r.body())
    assert(r.body().startsWith("#datatype"))
    assert(r.body().contains("telemetry"))
    assert(r.body().contains("retentionPeriod"))
  }

  test("query accepts the JSON envelope form") {
    val r = post("/api/v2/query",
      """{"query": "from(bucket: \"telemetry\") |> count()"}""", Some("admTok"))
    assert(r.statusCode() == 200 && r.body().startsWith("#datatype"))
  }

  test("bad flux is a 400 with the parse message") {
    val r = post("/api/v2/query", "from(bucket: )", Some("roTok"))
    assert(r.statusCode() == 400)
    assert(r.body().contains("message"))
  }

  test("query without a registered token is a 401") {
    assert(post("/api/v2/query", "from(bucket: \"telemetry\") |> count()", Some("bogus")).statusCode() == 401)
  }

  test("delete removes only predicate-matched points in the time range") {
    tsdb.catalog.createBucket("delbkt", "greengrass")
    post("/api/v2/write?bucket=delbkt",
      Seq(s"cpu,host=h1 usage=0.1 $t0",
          s"cpu,host=h2 usage=0.2 $t0",
          s"cpu,host=h1 usage=0.3 ${t0 + 3600L * 1000000000L}").mkString("\n"),
      Some("rwTok"))
    // delete host=h1 points in [t0, t0+1s) only
    val body =
      """{"start": "2024-01-15T00:00:00Z", "stop": "2024-01-15T00:00:01Z",
        | "predicate": "_measurement=\"cpu\" AND host=\"h1\""}""".stripMargin
    assert(post("/api/v2/delete?bucket=delbkt", body, Some("roTok")).statusCode() == 403)
    assert(post("/api/v2/delete?bucket=delbkt", body, Some("rwTok")).statusCode() == 204)
    val left = tsdb.from("delbkt").toDF.select("tags", "time_ns").collect()
    assert(left.length == 2) // h2@t0 and h1@t0+1h survive
    assert(post("/api/v2/delete?bucket=delbkt", """{"start": "2024-01-15T00:00:00Z"}""",
      Some("rwTok")).statusCode() == 400) // stop required
    assert(post("/api/v2/delete?bucket=nope", body, Some("rwTok")).statusCode() == 404)
  }

  test("error bodies are valid JSON even with quotes in the message") {
    val r = post("/api/v2/query", "from(bucket: )", Some("roTok"))
    assert(r.statusCode() == 400)
    val node = Json.mapper.readTree(r.body()) // throws if not valid JSON
    assert(node.get("message").asText().nonEmpty)
  }

  test("https serves /health with a self-signed cert") {
    val dir = Files.createTempDirectory("graft-tls-spec")
    val tlsApi = new HttpApi(tsdb, 0, "127.0.0.1", Some(Tls.selfSigned(dir))).start()
    try {
      // trust-all client (the reference's skipTlsVerify path)
      val trustAll = javax.net.ssl.SSLContext.getInstance("TLS")
      trustAll.init(null, Array[javax.net.ssl.TrustManager](new javax.net.ssl.X509TrustManager {
        def checkClientTrusted(c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
        def checkServerTrusted(c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
        def getAcceptedIssuers: Array[java.security.cert.X509Certificate] = Array.empty
      }), new java.security.SecureRandom())
      val httpsClient = HttpClient.newBuilder().sslContext(trustAll).build()
      val r = httpsClient.send(
        HttpRequest.newBuilder(URI.create(s"https://127.0.0.1:${tlsApi.boundPort}/health")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() == 200 && r.body().contains("\"pass\""))
      assert(tlsApi.scheme == "https")
    } finally tlsApi.stop()
  }

  test("token scope is enforced PER BUCKET (the reference's scoped-token model)") {
    tsdb.catalog.createBucket("scopeA", "greengrass")
    tsdb.catalog.createBucket("scopeB", "greengrass")
    val oid = tsdb.catalog.orgId("greengrass")
    val aId = tsdb.catalog.bucket("scopeA").get.id
    // tokens minted exactly like the reference's create_token
    // (src/influxdb_utils.sh:80-84): RW and RO scoped to bucket A only
    tsdb.catalog.addToken(TokenRecord("sA", "scoped_rw", "aRwTok", "active", "admin", "u1",
      Seq(s"read:orgs/$oid/buckets/$aId", s"write:orgs/$oid/buckets/$aId")))
    tsdb.catalog.addToken(TokenRecord("sB", "scoped_ro", "aRoTok", "active", "admin", "u1",
      Seq(s"read:orgs/$oid/buckets/$aId")))
    val lp = s"m v=1 $t0"
    // bucket-A RW token: full access to A …
    assert(post("/api/v2/write?bucket=scopeA", lp, Some("aRwTok")).statusCode() == 204)
    assert(post("/api/v2/query", """from(bucket: "scopeA") |> count()""",
      Some("aRwTok")).statusCode() == 200)
    // … and NO access to B: 403 on write, Flux query, v1 query, delete
    assert(post("/api/v2/write?bucket=scopeB", lp, Some("aRwTok")).statusCode() == 403)
    val q = post("/api/v2/query", """from(bucket: "scopeB") |> count()""", Some("aRwTok"))
    assert(q.statusCode() == 403, q.body())
    assert(q.body().contains("no read grant"))
    val v1 = client.send(HttpRequest.newBuilder(URI.create(
      s"$base/query?db=scopeB&q=${java.net.URLEncoder.encode("SELECT * FROM m", "UTF-8")}"))
      .header("Authorization", "Token aRwTok").GET().build(),
      HttpResponse.BodyHandlers.ofString())
    assert(v1.statusCode() == 403)
    assert(post("/api/v2/delete?bucket=scopeB",
      """{"start": "2024-01-15T00:00:00Z", "stop": "2024-01-16T00:00:00Z"}""",
      Some("aRwTok")).statusCode() == 403)
    // RO token cannot write EVEN its own bucket (write ⊄ read)
    assert(post("/api/v2/write?bucket=scopeA", lp, Some("aRoTok")).statusCode() == 403)
    assert(post("/api/v2/query", """from(bucket: "scopeA") |> count()""",
      Some("aRoTok")).statusCode() == 200)
    // v1 mutating statements need the write grant, not just read
    val drop = client.send(HttpRequest.newBuilder(URI.create(
      s"$base/query?db=scopeA&q=${java.net.URLEncoder.encode("DROP MEASUREMENT m", "UTF-8")}"))
      .header("Authorization", "Token aRoTok").GET().build(),
      HttpResponse.BodyHandlers.ofString())
    assert(drop.statusCode() == 403)
    // operator token keeps global access
    assert(post("/api/v2/write?bucket=scopeB", lp, Some("admTok")).statusCode() == 204)
  }

  test("permission-less records get data access only via the legacy opt-in flag") {
    tsdb.catalog.addToken(TokenRecord("lg", "greengrass_readwrite", "legacyTok",
      "active", "admin", "u1", Nil))
    // default HttpApi: a record with no permission strings has no grant
    assert(post("/api/v2/write?bucket=telemetry", s"m v=1 $t0",
      Some("legacyTok")).statusCode() == 403)
    // opt-in instance: description-based fallback for pre-permission catalogs
    val legacyApi = new HttpApi(tsdb, legacyDescriptionAuth = true).start()
    try {
      val legacyBase = s"http://127.0.0.1:${legacyApi.boundPort}"
      val r = client.send(HttpRequest.newBuilder(URI.create(
        s"$legacyBase/api/v2/write?bucket=telemetry"))
        .header("Authorization", "Token legacyTok")
        .POST(HttpRequest.BodyPublishers.ofString(s"m v=1 $t0")).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() == 204)
    } finally legacyApi.stop()
  }

  test("health responds while a query is in flight (request pool)") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val slow = Future(post("/api/v2/query",
      "from(bucket: \"telemetry\") |> mean()", Some("roTok")))
    val health = Future(get("/health"))
    assert(Await.result(health, 10.seconds).statusCode() == 200)
    assert(Await.result(slow, 60.seconds).statusCode() == 200)
  }
}
