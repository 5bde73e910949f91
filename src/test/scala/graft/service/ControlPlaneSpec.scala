package graft.service

import graft.store.{Catalog, TokenRecord}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import scala.collection.mutable

/** Port of the reference's unit tests (SURVEY §5: the 14 pytest cases in
  * test_influxDBTokenStreamHandler.py / test_influxDBTokenPublisher.py /
  * test_retrieveInfluxDBSecrets.py) against our control plane, using the
  * FIXTURES.md wire shapes.
  */
class ControlPlaneSpec extends AnyFunSuite {

  // FIXTURES.md §1.1 — the reference's token-list fixture.
  private val fixtureTokens = Seq(
    TokenRecord("0895c16b9de9e000", "test's Token", "testAdminToken", "active",
      "test", "0895c16b80a9e000", Seq("read:authorizations", "write:authorizations")),
    TokenRecord("0895c16bfba9e000", "greengrass_read", "testROToken", "active",
      "test", "0895c16b80a9e000", Seq("read:orgs/d13dcc4c7cd25bf9/buckets/2f1dc2bba2275383")),
    TokenRecord("0895c16c8ee9e000", "greengrass_readwrite", "testRWToken", "active",
      "test", "0895c16b80a9e000", Seq(
        "read:orgs/d13dcc4c7cd25bf9/buckets/2f1dc2bba2275383",
        "write:orgs/d13dcc4c7cd25bf9/buckets/2f1dc2bba2275383"))
  )

  private val metadata = Seq(
    "InfluxDBContainerName" -> "greengrass_InfluxDB",
    "InfluxDBOrg" -> "greengrass",
    "InfluxDBBucket" -> "greengrass-telemetry",
    "InfluxDBPort" -> "8086",
    "InfluxDBInterface" -> "127.0.0.1",
    "InfluxDBServerProtocol" -> "https",
    "InfluxDBSkipTLSVerify" -> "true")

  private def handler(tokens: Seq[TokenRecord] = fixtureTokens) =
    new TokenStreamHandler(() => tokens, metadata)

  private def parse(json: String) = Json.mapper.readTree(json)

  // --- stream handler: happy path (test_...StreamHandler.py:68-81)

  test("RW request publishes metadata + RW token") {
    val out = handler().getPublishJson("""{"action": "RetrieveToken", "accessLevel": "RW"}""")
    val node = parse(out.get)
    assert(node.get("InfluxDBToken").asText() == "testRWToken")
    assert(node.get("InfluxDBTokenAccessType").asText() == "RW")
    assert(node.get("InfluxDBOrg").asText() == "greengrass")
    assert(node.get("InfluxDBBucket").asText() == "greengrass-telemetry")
  }

  // --- malformed / unknown requests publish nothing (:83-135)

  test("malformed JSON → no response") {
    assert(handler().getPublishJson("{not json at all").isEmpty)
  }

  test("unknown action → no response") {
    assert(handler().getPublishJson("""{"action": "DeleteEverything", "accessLevel": "RW"}""").isEmpty)
  }

  test("invalid accessLevel → no response") {
    assert(handler().getPublishJson("""{"action": "RetrieveToken", "accessLevel": "Root"}""").isEmpty)
  }

  test("missing fields / empty event → no response") {
    assert(handler().getPublishJson("""{}""").isEmpty)
    assert(handler().getPublishJson("""{"accessLevel": "RW"}""").isEmpty)
  }

  // --- selection matrix (:138-159)

  test("RW / RO / Admin select by description") {
    for ((lvl, tok) <- Seq("RW" -> "testRWToken", "RO" -> "testROToken", "Admin" -> "testAdminToken")) {
      val out = handler().getPublishJson(s"""{"action": "RetrieveToken", "accessLevel": "$lvl"}""")
      assert(parse(out.get).get("InfluxDBToken").asText() == tok, lvl)
    }
  }

  // --- empty token / malformed admin description (:162-189)

  test("empty selected token raises") {
    val ts = fixtureTokens.map(t =>
      if (t.description == "greengrass_readwrite") t.copy(token = "") else t)
    assertThrows[IllegalStateException] {
      handler(ts).getPublishJson("""{"action": "RetrieveToken", "accessLevel": "RW"}""")
    }
  }

  test("admin description without 's Token marker → no response") {
    val ts = fixtureTokens.updated(0, fixtureTokens.head.copy(description = "not an admin"))
    assert(handler(ts).getPublishJson("""{"action": "RetrieveToken", "accessLevel": "Admin"}""").isEmpty)
  }

  // --- publisher: harvest (test_...Publisher.py:51-142)

  private def freshCatalog(tokens: Seq[TokenRecord]): Catalog = {
    val c = new Catalog(Files.createTempDirectory("graft-cp-spec"))
    tokens.foreach(c.addToken)
    c
  }

  test("token harvest returns the registry") {
    val pub = new TokenPublisher(freshCatalog(fixtureTokens), EngineConfig(warehousePath = "w"), new InProcessBus)
    assert(pub.harvestTokens().map(_.token) == fixtureTokens.map(_.token))
  }

  test("empty registry is fatal at startup") {
    val pub = new TokenPublisher(freshCatalog(Nil), EngineConfig(warehousePath = "w"), new InProcessBus)
    assertThrows[IllegalStateException](pub.harvestTokens())
  }

  test("empty first token is fatal at startup") {
    val pub = new TokenPublisher(
      freshCatalog(fixtureTokens.updated(0, fixtureTokens.head.copy(token = ""))),
      EngineConfig(warehousePath = "w"), new InProcessBus)
    assertThrows[IllegalStateException](pub.harvestTokens())
  }

  // --- publisher: subscribe round-trip (:145-162) + broadcast property

  test("request on the bus round-trips to a broadcast response") {
    val bus = new InProcessBus
    val config = EngineConfig(warehousePath = "w")
    new TokenPublisher(freshCatalog(fixtureTokens), config, bus).listen()
    val seen = mutable.Buffer.empty[String]
    bus.subscribe(config.tokenResponseTopic)(seen += _)   // client A
    bus.subscribe(config.tokenResponseTopic)(seen += _)   // client B sees it too
    bus.publish(config.tokenRequestTopic, """{"action": "RetrieveToken", "accessLevel": "RO"}""")
    assert(seen.size == 2)
    assert(seen.forall(parse(_).get("InfluxDBToken").asText() == "testROToken"))
  }

  test("handler errors keep the subscription open") {
    val bus = new InProcessBus
    val config = EngineConfig(warehousePath = "w")
    val ts = fixtureTokens.map(t =>
      if (t.description == "greengrass_read") t.copy(token = "") else t)
    new TokenPublisher(freshCatalog(ts), config, bus).listen()
    val seen = mutable.Buffer.empty[String]
    bus.subscribe(config.tokenResponseTopic)(seen += _)
    bus.publish(config.tokenRequestTopic, """{"action": "RetrieveToken", "accessLevel": "RO"}""")
    assert(seen.isEmpty) // empty token threw; swallowed
    bus.publish(config.tokenRequestTopic, """{"action": "RetrieveToken", "accessLevel": "RW"}""")
    assert(seen.size == 1) // still subscribed
  }

  // --- secrets (test_retrieveInfluxDBSecrets.py)

  test("secret JSON parses to (user, password)") {
    val creds = new JsonSecretCredentials(
      """{"influxdb_username": "myInfluxDBUsername", "influxdb_password": "myInfluxDBPassword123!"}""")
    assert(creds.retrieve() == ("myInfluxDBUsername", "myInfluxDBPassword123!"))
  }

  test("missing secret keys raise") {
    assertThrows[NoSuchElementException](
      new JsonSecretCredentials("""{"influxdb_username": "u"}""").retrieve())
    assertThrows[NoSuchElementException](
      new JsonSecretCredentials("""{"influxdb_password": "p"}""").retrieve())
  }

  // --- password policy (C9, src/influxdb_utils.sh:102-110)

  test("password policy accepts/rejects like the reference regexes") {
    assert(Password.validate("Aa1#aaaaaaaaaaaa").isRight)
    assert(Password.validate("Aa1#short").isLeft)          // < 16
    assert(Password.validate("aa1#aaaaaaaaaaaa").isLeft)   // no upper
    assert(Password.validate("AA1#AAAAAAAAAAAA").isLeft)   // no lower
    assert(Password.validate("Aaa#aaaaaaaaaaaa").isLeft)   // no digit
    assert(Password.validate("Aa1aaaaaaaaaaaaa").isLeft)   // no special
  }

  // --- config validation (C4) + bootstrap idempotency (C11)

  test("config validation rejects empty arguments") {
    assert(EngineConfig(warehousePath = "w").validate().isRight)
    assert(EngineConfig(warehousePath = "w", bucket = "").validate().isLeft)
  }

  test("bootstrap provisions once, then reuses") {
    val cat = new Catalog(Files.createTempDirectory("graft-boot-spec"))
    val config = EngineConfig(warehousePath = "w")
    val creds = new JsonSecretCredentials(
      """{"influxdb_username": "admin", "influxdb_password": "Password123#Secure"}""")
    val first = Bootstrap.provision(cat, config, creds)
    assert(!first.reused)
    assert(cat.listTokens.map(_.description) ==
      Seq("admin's Token", "greengrass_read", "greengrass_readwrite"))
    val rwPerms = cat.listTokens.find(_.description == "greengrass_readwrite").get.permissions
    assert(rwPerms.exists(_.startsWith("read:orgs/")) && rwPerms.exists(_.startsWith("write:orgs/")))
    val again = Bootstrap.provision(cat, config, creds)
    assert(again.reused && again.bucketId == first.bucketId)
    assert(cat.listTokens.size == 3) // nothing re-minted
  }

  test("bootstrap rejects a weak password") {
    val cat = new Catalog(Files.createTempDirectory("graft-bootpw-spec"))
    val creds = new JsonSecretCredentials(
      """{"influxdb_username": "admin", "influxdb_password": "weak"}""")
    assertThrows[IllegalArgumentException](
      Bootstrap.provision(cat, EngineConfig(warehousePath = "w"), creds))
  }

  test("health probe retries then reports readiness") {
    var calls = 0
    assert(Health.waitReady(() => { calls += 1; calls == 3 }, retries = 4, sleepMs = 1))
    assert(calls == 3)
    assert(!Health.waitReady(() => false, retries = 2, sleepMs = 1))
  }
}
