package graft.service

import graft.SparkSpec
import graft.dsl.Tsdb
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** Reenacts the reference's `provision_influxdb` sequence
  * (src/influxdb_utils.sh:136-221) END TO END over HTTP — the exact
  * calls the stock influx CLI issues against these endpoints:
  *
  *  1. probe `influx auth list` (expects failure pre-setup, :190-199)
  *  2. `influx setup --username … --password … --org … --bucket …` (:209-213)
  *  3. `influx bucket list --json --name <bucket>` → `[0]['id']` (:70-75)
  *  4. `influx auth create --read-bucket <id> --description
  *     greengrass_read` (:77-92), then `--read-bucket … --write-bucket
  *     … --description greengrass_readwrite`
  *  5. harvest `influx auth list --json` → `[0]['token']`
  *     (src/influxDBTokenPublisher.py:67-90)
  *
  * and asserts the reference's recorded JSON field names at each step
  * (test/test_influxDBTokenStreamHandler.py:15-51).
  */
class ProvisioningSpec extends SparkSpec {

  private lazy val tsdb: Tsdb =
    Tsdb(spark, Files.createTempDirectory("graft-provision-spec").toString)
  private lazy val api = new HttpApi(tsdb).start()
  private lazy val base = s"http://127.0.0.1:${api.boundPort}"
  private val client = HttpClient.newHttpClient()
  private val mapper = Json.mapper

  private def get(path: String, token: Option[String] = None): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(s"$base$path")).GET()
    token.foreach(t => b.header("Authorization", s"Token $t"))
    client.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  private def post(path: String, body: String,
      token: Option[String] = None): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(s"$base$path"))
      .POST(HttpRequest.BodyPublishers.ofString(body))
    token.foreach(t => b.header("Authorization", s"Token $t"))
    client.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  private def send(method: String, path: String, body: String,
      token: Option[String] = None): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(s"$base$path"))
      .method(method, HttpRequest.BodyPublishers.ofString(body))
    token.foreach(t => b.header("Authorization", s"Token $t"))
    client.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  // provisioning state threaded through the ordered steps
  private var adminToken: String = _
  private var bucketId: String = _
  private var orgId: String = _
  private var roToken: String = _
  private var rwToken: String = _

  test("step 1: pre-setup, the auth-list probe fails and setup is allowed") {
    // provision_influxdb's branch condition: `influx auth list` exits
    // non-zero on a blank instance (src/influxdb_utils.sh:190-199)
    assert(get("/api/v2/authorizations").statusCode() == 401)
    val probe = get("/api/v2/setup")
    assert(probe.statusCode() == 200)
    assert(mapper.readTree(probe.body()).get("allowed").asBoolean())
  }

  test("step 2: influx setup — password policy enforced, then user+org+bucket+operator token") {
    // validate_password (src/influxdb_utils.sh:104-112): ≥16 chars,
    // upper+lower+digit+special — a weak password is rejected
    val weak = post("/api/v2/setup",
      """{"username":"test","password":"short","org":"greengrass","bucket":"greengrass-telemetry"}""")
    assert(weak.statusCode() == 422, weak.body())

    val r = post("/api/v2/setup",
      """{"username":"test","password":"Mm1#aaaaaaaaaaaaaa","org":"greengrass","bucket":"greengrass-telemetry"}""")
    assert(r.statusCode() == 201, r.body())
    val node = mapper.readTree(r.body())
    assert(node.get("user").get("name").asText() == "test")
    assert(node.get("org").get("name").asText() == "greengrass")
    assert(node.get("bucket").get("name").asText() == "greengrass-telemetry")
    // the operator token the CLI stores: description "<user>'s Token",
    // authorizations-scope permissions (fixture record 0)
    val auth = node.get("auth")
    assert(auth.get("description").asText() == "test's Token")
    val perms = auth.get("permissions").elements().asScala.map(_.asText()).toSeq
    assert(perms == Seq("read:authorizations", "write:authorizations"))
    adminToken = auth.get("token").asText()
    orgId = node.get("org").get("id").asText()
    assert(adminToken.nonEmpty)
  }

  test("step 2b: setup is idempotent — the probe flips and a re-run conflicts") {
    val probe = get("/api/v2/setup")
    assert(!mapper.readTree(probe.body()).get("allowed").asBoolean())
    val again = post("/api/v2/setup",
      """{"username":"test","password":"Mm1#aaaaaaaaaaaaaa","org":"greengrass","bucket":"greengrass-telemetry"}""")
    assert(again.statusCode() == 422)
    assert(mapper.readTree(again.body()).get("code").asText() == "conflict")
    // the reuse branch: `influx auth list` now succeeds → "Reusing
    // existing InfluxDB setup"
    assert(get("/api/v2/authorizations", Some(adminToken)).statusCode() == 200)
  }

  test("step 3: bucket-ID lookup via bucket list --json --name") {
    val r = get("/api/v2/buckets?name=greengrass-telemetry", Some(adminToken))
    assert(r.statusCode() == 200, r.body())
    val buckets = mapper.readTree(r.body()).get("buckets")
    assert(buckets.size() == 1)
    // the script parses json[0]['id'] (src/influxdb_utils.sh:70-73)
    bucketId = buckets.get(0).get("id").asText()
    assert(bucketId.matches("[0-9a-f]{16}"), bucketId)
    assert(buckets.get(0).get("orgID").asText() == orgId)
    assert(buckets.get(0).get("retentionRules").get(0).get("everySeconds").asLong() == 0L)
    // the ?name= filter actually filters
    val none = get("/api/v2/buckets?name=nope", Some(adminToken))
    assert(mapper.readTree(none.body()).get("buckets").size() == 0)
  }

  test("step 4: auth create RO then RW with bucket-scoped permissions") {
    // influx auth create --read-bucket <id> --org greengrass
    // --description greengrass_read: the CLI posts object-form
    // permissions; the recorded list output is the string form
    val ro = post("/api/v2/authorizations",
      s"""{"orgID":"$orgId","description":"greengrass_read","permissions":[
         |{"action":"read","resource":{"type":"buckets","id":"$bucketId","orgID":"$orgId"}}]}""".stripMargin,
      Some(adminToken))
    assert(ro.statusCode() == 201, ro.body())
    val roNode = mapper.readTree(ro.body())
    assert(roNode.get("description").asText() == "greengrass_read")
    assert(roNode.get("permissions").elements().asScala.map(_.asText()).toSeq ==
      Seq(s"read:orgs/$orgId/buckets/$bucketId"))
    roToken = roNode.get("token").asText()

    val rw = post("/api/v2/authorizations",
      s"""{"orgID":"$orgId","description":"greengrass_readwrite","permissions":[
         |{"action":"read","resource":{"type":"buckets","id":"$bucketId","orgID":"$orgId"}},
         |{"action":"write","resource":{"type":"buckets","id":"$bucketId","orgID":"$orgId"}}]}""".stripMargin,
      Some(adminToken))
    assert(rw.statusCode() == 201, rw.body())
    val rwNode = mapper.readTree(rw.body())
    assert(rwNode.get("permissions").elements().asScala.map(_.asText()).toSeq ==
      Seq(s"read:orgs/$orgId/buckets/$bucketId", s"write:orgs/$orgId/buckets/$bucketId"))
    rwToken = rwNode.get("token").asText()

    // a non-operator token cannot mint authorizations
    assert(post("/api/v2/authorizations",
      s"""{"orgID":"$orgId","permissions":["read:orgs/$orgId/buckets/$bucketId"]}""",
      Some(roToken)).statusCode() == 401)
  }

  test("step 5: auth list harvest matches the recorded fixture shape") {
    val r = get("/api/v2/authorizations", Some(adminToken))
    assert(r.statusCode() == 200)
    val auths = mapper.readTree(r.body()).get("authorizations")
    assert(auths.size() == 3)
    // the token publisher takes [0]['token'] — record 0 is the operator
    // (src/influxDBTokenPublisher.py:86-90 pairs with the stream
    // handler's "'s Token" selector)
    assert(auths.get(0).get("description").asText().contains("'s Token"))
    assert(auths.get(0).get("token").asText() == adminToken)
    // EXACT field-name set of the recorded fixture
    // (test/test_influxDBTokenStreamHandler.py:15-51)
    (0 until auths.size()).foreach { i =>
      val fields = auths.get(i).fieldNames().asScala.toSet
      assert(fields == Set("id", "description", "token", "status",
        "userName", "userID", "permissions"), fields.toString)
      assert(auths.get(i).get("status").asText() == "active")
      assert(auths.get(i).get("userName").asText() == "test")
    }
    // all three share the setup user's userID, like the fixture
    val userIds = (0 until auths.size()).map(auths.get(_).get("userID").asText()).toSet
    assert(userIds.size == 1)
    val byDesc = (0 until auths.size())
      .map(i => auths.get(i).get("description").asText() -> auths.get(i)).toMap
    assert(byDesc.contains("greengrass_read") && byDesc.contains("greengrass_readwrite"))
    // the TokenStreamHandler (C13-C17 plane) selects from this harvest
    val handler = new TokenStreamHandler(() => tsdb.catalog.listTokens, Nil)
    val rwOut = handler.getPublishJson("""{"action":"RetrieveToken","accessLevel":"RW"}""")
    assert(rwOut.exists(_.contains(rwToken)))
    val roOut = handler.getPublishJson("""{"action":"RetrieveToken","accessLevel":"RO"}""")
    assert(roOut.exists(_.contains(roToken)))
  }

  test("the provisioned engine serves reads and writes with the minted tokens") {
    val w = post("/api/v2/write?bucket=greengrass-telemetry",
      "cpu,host=h1 usage=42 1705276800000000000", Some(rwToken))
    assert(w.statusCode() == 204, w.body())
    // RO token cannot write
    assert(post("/api/v2/write?bucket=greengrass-telemetry",
      "cpu,host=h1 usage=43 1705276801000000000", Some(roToken)).statusCode() == 403)
    val q = post("/api/v2/query",
      """from(bucket:"greengrass-telemetry") |> range(start: 2020-01-01T00:00:00Z) |> count()""",
      Some(roToken))
    assert(q.statusCode() == 200, q.body())
    assert(q.body().contains("_value"), q.body())
  }

  test("auth list requires an authorizations-scope token — no secret harvest by RO/RW") {
    // a bucket-scoped token must not be able to list (and thus harvest)
    // the operator token's plaintext secret: privilege escalation
    assert(get("/api/v2/authorizations", Some(roToken)).statusCode() == 401)
    assert(get("/api/v2/authorizations", Some(rwToken)).statusCode() == 401)
    // non-secret admin metadata stays readable by any registered token
    assert(get("/api/v2/buckets", Some(roToken)).statusCode() == 200)
  }

  test("write capability follows the token's permissions, not its description") {
    // a write-scoped token under a custom description must write
    val r = post("/api/v2/authorizations",
      s"""{"orgID":"$orgId","description":"custom-writer","permissions":[
         |{"action":"write","resource":{"type":"buckets","id":"$bucketId","orgID":"$orgId"}}]}""".stripMargin,
      Some(adminToken))
    assert(r.statusCode() == 201, r.body())
    val writerTok = mapper.readTree(r.body()).get("token").asText()
    assert(post("/api/v2/write?bucket=greengrass-telemetry",
      "cpu,host=h9 usage=1 1705276802000000000", Some(writerTok)).statusCode() == 204)
    // and a read-only scoped token cannot, whatever its description says
    val r2 = post("/api/v2/authorizations",
      s"""{"orgID":"$orgId","description":"definitely-not-admin","permissions":[
         |{"action":"read","resource":{"type":"buckets","id":"$bucketId","orgID":"$orgId"}}]}""".stripMargin,
      Some(adminToken))
    assert(r2.statusCode() == 201, r2.body())
    val roTok2 = mapper.readTree(r2.body()).get("token").asText()
    assert(post("/api/v2/write?bucket=greengrass-telemetry",
      "cpu,host=h9 usage=2 1705276803000000000", Some(roTok2)).statusCode() == 403)
  }

  test("orgs endpoint lists and creates organizations") {
    val r = get("/api/v2/orgs", Some(adminToken))
    assert(r.statusCode() == 200)
    val orgs = mapper.readTree(r.body()).get("orgs")
    assert((0 until orgs.size()).exists(i =>
      orgs.get(i).get("name").asText() == "greengrass" &&
        orgs.get(i).get("id").asText() == orgId))
    assert(post("/api/v2/orgs", """{"name":"second"}""",
      Some(adminToken)).statusCode() == 201)
    val dup = post("/api/v2/orgs", """{"name":"second"}""", Some(adminToken))
    assert(dup.statusCode() == 422)
    val filtered = get("/api/v2/orgs?org=second", Some(adminToken))
    assert(mapper.readTree(filtered.body()).get("orgs").size() == 1)
  }

  test("buckets endpoint creates a bucket in an org by orgID with retention") {
    val r = post("/api/v2/buckets",
      s"""{"orgID":"$orgId","name":"telemetry-2","retentionRules":[{"type":"expire","everySeconds":604800}]}""",
      Some(adminToken))
    assert(r.statusCode() == 201, r.body())
    val node = mapper.readTree(r.body())
    assert(node.get("retentionRules").get(0).get("everySeconds").asLong() == 604800L)
    assert(tsdb.catalog.bucket("telemetry-2").exists(_.retentionNs == 604800L * 1000000000L))
    // duplicate name conflicts; unknown org 404s
    assert(post("/api/v2/buckets", s"""{"orgID":"$orgId","name":"telemetry-2"}""",
      Some(adminToken)).statusCode() == 422)
    assert(post("/api/v2/buckets", """{"orgID":"ffffffffffffffff","name":"x"}""",
      Some(adminToken)).statusCode() == 404)
  }

  test("v2 CRUD breadth: PATCH/DELETE on buckets and orgs") {
    val b = get("/api/v2/buckets?name=telemetry-2", Some(adminToken))
    val bid = mapper.readTree(b.body()).get("buckets").get(0).get("id").asText()
    // PATCH: rename + retention; the persisted id (and data dir) survive
    val patched = send("PATCH", s"/api/v2/buckets/$bid",
      """{"name":"telemetry-3","retentionRules":[{"type":"expire","everySeconds":120}]}""",
      Some(adminToken))
    assert(patched.statusCode() == 200, patched.body())
    assert(mapper.readTree(patched.body()).get("name").asText() == "telemetry-3")
    assert(tsdb.catalog.bucket("telemetry-2").isEmpty)
    assert(tsdb.catalog.bucket("telemetry-3").exists(m =>
      m.id == bid && m.retentionNs == 120L * 1000000000L))
    // non-admin mutations are refused
    assert(send("DELETE", s"/api/v2/buckets/$bid", "", Some(roToken)).statusCode() == 401)
    // org with buckets refuses deletion; empty org deletes
    val gid = tsdb.catalog.orgId("greengrass")
    assert(send("DELETE", s"/api/v2/orgs/$gid", "", Some(adminToken)).statusCode() == 422)
    val sid = tsdb.catalog.orgId("second")
    assert(send("DELETE", s"/api/v2/orgs/$sid", "", Some(adminToken)).statusCode() == 204)
    assert(!tsdb.catalog.listOrgs.contains("second"))
    // bucket DELETE removes the record AND the data directory
    val dir = tsdb.catalog.bucketPath("telemetry-3")
    assert(send("DELETE", s"/api/v2/buckets/$bid", "", Some(adminToken)).statusCode() == 204)
    assert(tsdb.catalog.bucket("telemetry-3").isEmpty)
    assert(!dir.toFile.exists())
    assert(send("DELETE", s"/api/v2/buckets/$bid", "", Some(adminToken)).statusCode() == 404)
  }

  test("authorization status gates access: inactive token loses every capability") {
    val r = post("/api/v2/authorizations",
      s"""{"orgID":"$orgId","description":"status-test","permissions":[
         |{"action":"write","resource":{"type":"buckets","id":"$bucketId","orgID":"$orgId"}}]}""".stripMargin,
      Some(adminToken))
    assert(r.statusCode() == 201, r.body())
    val node = mapper.readTree(r.body())
    val tok = node.get("token").asText()
    val aid = node.get("id").asText()
    def write() = post("/api/v2/write?bucket=greengrass-telemetry",
      "cpu,host=h9 usage=3 1705276804000000000", Some(tok)).statusCode()
    assert(write() == 204)
    // PATCH inactive: both write and read capabilities vanish
    val off = send("PATCH", s"/api/v2/authorizations/$aid",
      """{"status":"inactive"}""", Some(adminToken))
    assert(off.statusCode() == 200, off.body())
    assert(mapper.readTree(off.body()).get("status").asText() == "inactive")
    assert(write() == 401)
    assert(post("/api/v2/query",
      """from(bucket:"greengrass-telemetry") |> range(start: 2020-01-01T00:00:00Z) |> count()""",
      Some(tok)).statusCode() == 401)
    // re-activate: capability returns
    assert(send("PATCH", s"/api/v2/authorizations/$aid",
      """{"status":"active"}""", Some(adminToken)).statusCode() == 200)
    assert(write() == 204)
    // bad status is a 400; DELETE revokes for good
    assert(send("PATCH", s"/api/v2/authorizations/$aid",
      """{"status":"paused"}""", Some(adminToken)).statusCode() == 400)
    assert(send("DELETE", s"/api/v2/authorizations/$aid", "",
      Some(adminToken)).statusCode() == 204)
    assert(write() == 401)
    assert(send("DELETE", s"/api/v2/authorizations/$aid", "",
      Some(adminToken)).statusCode() == 404)
  }
}
