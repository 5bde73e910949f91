package graft.service

import graft.store.{Catalog, TokenRecord}

/** Idempotent provisioning — port of `provision_influxdb` (reference:
  * src/influxdb_utils.sh:136-221): on a fresh warehouse, fetch
  * credentials, validate the password, create org + default bucket, and
  * mint admin / RO / RW tokens; on restart, detect the existing setup
  * and reuse it (the reference probes `influx auth list`, :190-199).
  */
object Bootstrap {

  final case class Provisioned(reused: Boolean, bucketId: String)

  def provision(catalog: Catalog, config: EngineConfig,
      credentials: CredentialsProvider): Provisioned = {
    // idempotency probe (C11): an existing token registry means setup ran
    if (catalog.listTokens.nonEmpty) {
      val id = catalog.bucket(config.bucket).map(_.id).getOrElse("")
      return Provisioned(reused = true, bucketId = id)
    }
    val (user, pass) = credentials.retrieve()
    Password.validate(pass).left.foreach(msg =>
      throw new IllegalArgumentException(s"invalid password: $msg"))

    catalog.createOrg(config.org)
    val bucket = catalog.createBucket(config.bucket, config.org)
    val orgId = catalog.orgId(config.org) // same id /api/v2/orgs reports

    def mint(): String = java.util.UUID.randomUUID().toString.replace("-", "")

    // admin token: the reference recognizes it by the "'s Token" suffix
    catalog.addToken(TokenRecord(
      id = mint().take(16), description = s"$user's Token", token = mint(),
      status = "active", userName = user, userID = mint().take(16),
      permissions = Seq("read:authorizations", "write:authorizations")))
    // RO + RW scoped to the bucket (reference: create_token,
    // src/influxdb_utils.sh:77-92)
    catalog.addToken(TokenRecord(
      id = mint().take(16), description = "greengrass_read", token = mint(),
      status = "active", userName = user, userID = mint().take(16),
      permissions = Seq(s"read:orgs/$orgId/buckets/${bucket.id}")))
    catalog.addToken(TokenRecord(
      id = mint().take(16), description = "greengrass_readwrite", token = mint(),
      status = "active", userName = user, userID = mint().take(16),
      permissions = Seq(
        s"read:orgs/$orgId/buckets/${bucket.id}",
        s"write:orgs/$orgId/buckets/${bucket.id}")))
    Provisioned(reused = false, bucketId = bucket.id)
  }
}

/** Readiness probe — port of `wait_for_influxdb_start` (reference:
  * src/influxdb_utils.sh:6-47): retry a health check up to `retries`
  * times with `sleepMs` between attempts.
  */
object Health {
  def waitReady(check: () => Boolean, retries: Int = 4, sleepMs: Long = 10000): Boolean = {
    var attempt = 0
    while (attempt < retries) {
      if (check()) return true
      attempt += 1
      if (attempt < retries) Thread.sleep(sleepMs)
    }
    false
  }
}
