package graft.service

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.store.{Catalog, TokenRecord}

/** The v2 admin HTTP surface the reference provisions its engine
  * through — `influx setup` / `influx bucket list --json --name` /
  * `influx auth create` / `influx auth list --json` are thin clients
  * over exactly these endpoints (reference:
  * src/influxdb_utils.sh:70-91,190-216, README.md:383 names
  * `/api/v2/setup`; token harvest src/influxDBTokenPublisher.py:67).
  *
  *  - `GET  /api/v2/setup`           → `{"allowed": bool}` onboarding probe
  *  - `POST /api/v2/setup`           → create user+org+bucket+admin token
  *  - `GET  /api/v2/buckets[?name=]` → `{"buckets": […]}`
  *  - `POST /api/v2/buckets`         → create bucket in an org (by orgID)
  *  - `GET  /api/v2/orgs[?org=]`     → `{"orgs": […]}`
  *  - `POST /api/v2/orgs`            → create org
  *  - `GET  /api/v2/authorizations`  → `{"authorizations": […]}`
  *  - `POST /api/v2/authorizations`  → mint a scoped token
  *
  * Authorization records use the EXACT field names of the reference's
  * recorded `influx auth list --json` fixture
  * (test/test_influxDBTokenStreamHandler.py:15-51): id, description,
  * token, status, userName, userID, permissions — permissions rendered
  * as `action:orgs/<orgID>/buckets/<bucketID>` strings. Creation
  * accepts both that string form and the wire-object form
  * (`{"action": …, "resource": {"type": "buckets", "id": …}}`) the
  * stock CLI posts, so either client can drive provisioning.
  *
  * Pure catalog logic (method, path params, body) → (status, JSON);
  * [[HttpApi]] owns transport and token checks.
  */
object V2Admin {

  private def mapper = Json.mapper
  private def mint(): String =
    java.util.UUID.randomUUID().toString.replace("-", "")

  /** Everything here is driver-side catalog metadata (a few KB): no
    * Spark jobs run on any admin endpoint.
    */
  private def bucketNode(c: Catalog, b: graft.store.BucketMeta): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("id", b.id)
    n.put("orgID", c.orgId(b.org))
    n.put("type", "user")
    n.put("name", b.name)
    val rules = n.putArray("retentionRules")
    val r = rules.addObject()
    r.put("type", "expire")
    r.put("everySeconds", b.retentionNs / 1000000000L)
    n
  }

  private def orgNode(c: Catalog, name: String): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("id", c.orgId(name))
    n.put("name", name)
    n
  }

  private def authNode(t: TokenRecord): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("id", t.id)
    n.put("description", t.description)
    n.put("token", t.token)
    n.put("status", t.status)
    n.put("userName", t.userName)
    n.put("userID", t.userID)
    val ps = n.putArray("permissions")
    t.permissions.foreach(ps.add)
    n
  }

  private def errBody(code: String, msg: String): String = {
    val n = mapper.createObjectNode()
    n.put("code", code)
    n.put("message", msg)
    mapper.writeValueAsString(n)
  }

  // --- /api/v2/setup ---

  /** GET probe: onboarding is allowed until the first token exists —
    * the same signal the reference's `influx auth list` exit-code probe
    * reads (src/influxdb_utils.sh:190-199).
    */
  def setupAllowed(c: Catalog): (Int, String) = {
    val n = mapper.createObjectNode()
    n.put("allowed", c.listTokens.isEmpty)
    (200, mapper.writeValueAsString(n))
  }

  /** POST: onboard user+org+bucket and mint the operator token
    * (description `<user>'s Token`, the suffix the reference's token
    * selector recognizes as Admin). Unlike [[Bootstrap.provision]] this
    * does NOT mint RO/RW tokens — the reference creates those through
    * separate `influx auth create` calls, which is exactly the sequence
    * the provisioning replay asserts.
    */
  def setup(c: Catalog, body: String): (Int, String) = c.synchronized {
    if (c.listTokens.nonEmpty)
      return (422, errBody("conflict", "onboarding has already been completed"))
    val node = mapper.readTree(body)
    def s(k: String): Option[String] =
      Option(node.get(k)).filterNot(_.isNull).map(_.asText()).filter(_.nonEmpty)
    (s("username"), s("password"), s("org"), s("bucket")) match {
      case (Some(user), Some(pass), Some(org), Some(bucket)) =>
        Password.validate(pass) match {
          case Left(msg) => (422, errBody("unprocessable entity", msg))
          case Right(_) =>
            val retentionNs = Option(node.get("retentionPeriodSeconds"))
              .filter(_.isNumber).map(_.asLong() * 1000000000L)
              .orElse(Option(node.get("retentionPeriodHrs"))
                .filter(_.isNumber).map(_.asLong() * 3600L * 1000000000L))
              .getOrElse(0L)
            c.createOrg(org)
            val b = c.createBucket(bucket, org, retentionNs)
            val rec = TokenRecord(
              id = mint().take(16), description = s"$user's Token",
              token = mint(), status = "active", userName = user,
              userID = mint().take(16),
              permissions = Seq("read:authorizations", "write:authorizations"))
            c.addToken(rec)
            val out = mapper.createObjectNode()
            val u = out.putObject("user")
            u.put("id", rec.userID); u.put("name", user); u.put("status", "active")
            out.set[JsonNode]("org", orgNode(c, org))
            out.set[JsonNode]("bucket", bucketNode(c, b))
            out.set[JsonNode]("auth", authNode(rec))
            (201, mapper.writeValueAsString(out))
        }
      case _ =>
        (400, errBody("invalid", "username, password, org and bucket are required"))
    }
  }

  // --- /api/v2/buckets ---

  def listBuckets(c: Catalog, name: Option[String]): (Int, String) = {
    val out = mapper.createObjectNode()
    val arr = out.putArray("buckets")
    c.listBuckets.filter(b => name.forall(_ == b.name))
      .foreach(b => arr.add(bucketNode(c, b)))
    (200, mapper.writeValueAsString(out))
  }

  def createBucket(c: Catalog, body: String): (Int, String) = c.synchronized {
    val node = mapper.readTree(body)
    val name = Option(node.get("name")).map(_.asText()).filter(_.nonEmpty)
    // resolve orgID back to a name (orgs are name-keyed in the catalog);
    // a plain "org" name is accepted too
    val org = Option(node.get("orgID")).map(_.asText())
      .flatMap(id => c.listOrgs.find(o => c.orgId(o) == id))
      .orElse(Option(node.get("org")).map(_.asText()).filter(c.listOrgs.contains))
    val everySeconds = Option(node.get("retentionRules"))
      .collect { case a: ArrayNode if a.size() > 0 => a.get(0) }
      .flatMap(r => Option(r.get("everySeconds")).map(_.asLong()))
      .getOrElse(0L)
    (name, org) match {
      case (Some(n), Some(o)) =>
        if (c.bucket(n).isDefined)
          (422, errBody("conflict", s"bucket with name $n already exists"))
        else {
          val b = c.createBucket(n, o, everySeconds * 1000000000L)
          (201, mapper.writeValueAsString(bucketNode(c, b)))
        }
      case (None, _) => (400, errBody("invalid", "bucket name is required"))
      case (_, None) => (404, errBody("not found", "organization not found"))
    }
  }

  /** DELETE /api/v2/buckets/<id> — removes the bucket AND its data
    * directory, like the engine does. The removal routes through
    * [[graft.store.BucketStore.drop]] (bucket write lock + mutation
    * version bump + metadata-cache eviction) so it cannot race an
    * in-flight compact/delete, and a bucket later recreated under the
    * same name (same derived id → same path and cache keys) never sees
    * the deleted bucket's stale metadata. The directory resolves
    * through the catalog's persisted id BEFORE the entry is dropped,
    * so the right directory goes even after a rename.
    */
  def deleteBucket(c: Catalog, store: graft.store.BucketStore, id: String): (Int, String) =
    c.synchronized {
      c.listBuckets.find(_.id == id) match {
        case None => (404, errBody("not found", "bucket not found"))
        case Some(b) =>
          store.drop(b.name)
          c.dropBucket(b.name)
          (204, "")
      }
    }

  /** PATCH /api/v2/buckets/<id> — name and/or retentionRules, the two
    * mutable fields the engine's PATCH accepts.
    */
  def patchBucket(c: Catalog, id: String, body: String): (Int, String) = c.synchronized {
    c.listBuckets.find(_.id == id) match {
      case None => (404, errBody("not found", "bucket not found"))
      case Some(b) =>
        val node = mapper.readTree(body)
        val newName = Option(node.get("name")).map(_.asText()).filter(_.nonEmpty)
        newName match {
          case Some(n) if n != b.name && c.bucket(n).isDefined =>
            return (422, errBody("conflict", s"bucket with name $n already exists"))
          case Some(n) if n != b.name => c.renameBucket(b.name, n)
          case _ => ()
        }
        val name = newName.getOrElse(b.name)
        Option(node.get("retentionRules"))
          .collect { case a: ArrayNode if a.size() > 0 => a.get(0) }
          .flatMap(r => Option(r.get("everySeconds")).map(_.asLong()))
          .foreach(s => c.setBucketRetention(name, s * 1000000000L))
        (200, mapper.writeValueAsString(bucketNode(c, c.bucket(name).get)))
    }
  }

  // --- /api/v2/orgs ---

  def listOrgs(c: Catalog, name: Option[String]): (Int, String) = {
    val out = mapper.createObjectNode()
    val arr = out.putArray("orgs")
    c.listOrgs.toSeq.sorted.filter(o => name.forall(_ == o))
      .foreach(o => arr.add(orgNode(c, o)))
    (200, mapper.writeValueAsString(out))
  }

  def createOrg(c: Catalog, body: String): (Int, String) = c.synchronized {
    Option(mapper.readTree(body).get("name")).map(_.asText()).filter(_.nonEmpty) match {
      case None => (400, errBody("invalid", "org name is required"))
      case Some(n) if c.listOrgs.contains(n) =>
        (422, errBody("conflict", s"organization with name $n already exists"))
      case Some(n) =>
        c.createOrg(n)
        (201, mapper.writeValueAsString(orgNode(c, n)))
    }
  }

  /** DELETE /api/v2/orgs/<id> — refused while the org still owns
    * buckets (no silent cascade over data).
    */
  def deleteOrg(c: Catalog, id: String): (Int, String) = c.synchronized {
    c.listOrgs.find(o => c.orgId(o) == id) match {
      case None => (404, errBody("not found", "organization not found"))
      case Some(o) if c.listBuckets.exists(_.org == o) =>
        (422, errBody("conflict",
          s"organization $o still owns buckets; delete them first"))
      case Some(o) => c.dropOrg(o); (204, "")
    }
  }

  // --- /api/v2/authorizations ---

  def listAuthorizations(c: Catalog): (Int, String) = {
    val out = mapper.createObjectNode()
    val arr = out.putArray("authorizations")
    c.listTokens.foreach(t => arr.add(authNode(t)))
    (200, mapper.writeValueAsString(out))
  }

  /** Mint a scoped token. Permissions accept the wire-object form the
    * stock CLI posts and the string form the fixtures record; both
    * normalize to the fixture's `action:orgs/<orgID>/buckets/<id>`
    * strings in the catalog. The new record carries the operator's
    * userName/userID (reference fixture: all three tokens share the
    * setup user, test_influxDBTokenStreamHandler.py:21-28).
    */
  private final case class BadRequest(msg: String) extends RuntimeException(msg)

  def createAuthorization(c: Catalog, body: String): (Int, String) = c.synchronized {
    try {
      val node = mapper.readTree(body)
      val orgID = Option(node.get("orgID")).map(_.asText())
        .orElse(Option(node.get("org")).map(o => c.orgId(o.asText())))
      val description = Option(node.get("description")).map(_.asText()).getOrElse("")
      val permsNode = Option(node.get("permissions")).collect { case a: ArrayNode => a }
      val perms: Seq[String] = permsNode.toSeq.flatMap { arr =>
        (0 until arr.size()).map(arr.get).map {
          case s if s.isTextual => s.asText()
          case o =>
            val action = Option(o.get("action")).map(_.asText())
              .getOrElse(throw BadRequest("permission needs an action"))
            val res = Option(o.get("resource"))
              .getOrElse(throw BadRequest("permission needs a resource"))
            val rType = Option(res.get("type")).map(_.asText()).getOrElse("buckets")
            val rId = Option(res.get("id")).map(_.asText())
            val rOrg = Option(res.get("orgID")).map(_.asText()).orElse(orgID)
            (rType, rId, rOrg) match {
              case ("buckets", Some(id), Some(oid)) => s"$action:orgs/$oid/buckets/$id"
              case ("buckets", None, Some(oid)) => s"$action:orgs/$oid/buckets"
              case (t, _, _) => s"$action:$t"
            }
        }
      }
      if (perms.isEmpty)
        throw BadRequest("authorization needs at least one permission")
      val operator = c.listTokens.headOption
      val rec = TokenRecord(
        id = mint().take(16), description = description, token = mint(),
        status = "active",
        userName = operator.map(_.userName).getOrElse(""),
        userID = operator.map(_.userID).getOrElse(mint().take(16)),
        permissions = perms)
      c.addToken(rec)
      (201, mapper.writeValueAsString(authNode(rec)))
    } catch { case BadRequest(msg) => (400, errBody("invalid", msg)) }
  }

  /** DELETE /api/v2/authorizations/<id> — revoke a token. */
  def deleteAuthorization(c: Catalog, id: String): (Int, String) =
    if (c.removeToken(id)) (204, "")
    else (404, errBody("not found", "authorization not found"))

  /** PATCH /api/v2/authorizations/<id> — the engine's PATCH mutates
    * `status` (active|inactive); an inactive token fails every auth
    * check until re-activated.
    */
  def patchAuthorization(c: Catalog, id: String, body: String): (Int, String) = {
    val status = Option(mapper.readTree(body).get("status")).map(_.asText())
    status match {
      case Some(s @ ("active" | "inactive")) =>
        if (c.setTokenStatus(id, s))
          (200, mapper.writeValueAsString(
            authNode(c.listTokens.find(_.id == id).get)))
        else (404, errBody("not found", "authorization not found"))
      case Some(other) =>
        (400, errBody("invalid", s"status must be active or inactive, got '$other'"))
      case None => (400, errBody("invalid", "status is required"))
    }
  }
}
