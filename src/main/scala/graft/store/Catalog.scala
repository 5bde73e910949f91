package graft.store

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Warehouse catalog: orgs, buckets (with retention), auth tokens.
  *
  * Mirrors the reference's control-plane metadata surface — `influx
  * setup` creates org+bucket (reference: src/influxdb_utils.sh:209-213),
  * `influx bucket list --json` resolves bucket IDs
  * (src/influxdb_utils.sh:68-75), `influx auth create/list` manage
  * scoped tokens (src/influxdb_utils.sh:87-92,
  * src/influxDBTokenPublisher.py:67).
  *
  * Driver-side metadata only (a few KB) — persisted as a JSON file under
  * the warehouse root, written atomically via temp-file rename so a
  * crashed bootstrap never leaves a torn catalog (the reference gets the
  * same idempotency from `influx auth list` probing,
  * src/influxdb_utils.sh:190-199).
  */
final case class BucketMeta(
    id: String,
    name: String,
    org: String,
    retentionNs: Long // 0 = infinite, like InfluxDB "0s" retention
)

final case class TokenRecord(
    id: String,
    description: String,
    token: String,
    status: String,
    userName: String,
    userID: String,
    permissions: Seq[String]
)

/** A scheduled-Flux task record (`/api/v2/tasks`): the pinned engine
  * persists tasks in its KV store so they survive restarts — here they
  * live in the catalog next to buckets/tokens and
  * [[graft.streaming.FluxTasks]] reschedules them on start.
  */
final case class TaskMeta(
    id: String,
    name: String,
    org: String,
    flux: String,
    everyNs: Long,
    offsetNs: Long,
    status: String,
    // calendar cadence: `every: 1mo`/`1y` has no fixed ns width, so it
    // persists as a month count (y = 12) and everyNs stays 0; exactly
    // one of everyNs/everyMonths is non-zero
    everyMonths: Int = 0
)

final class Catalog(val root: Path) {
  private val file: Path = root.resolve("_catalog.json")

  @volatile private var orgs: Set[String] = Set.empty
  @volatile private var buckets: Map[String, BucketMeta] = Map.empty
  @volatile private var tokens: Vector[TokenRecord] = Vector.empty
  @volatile private var tasks: Vector[TaskMeta] = Vector.empty

  load()

  def listOrgs: Set[String] = orgs
  def listBuckets: Seq[BucketMeta] = buckets.values.toSeq.sortBy(_.name)
  def bucket(name: String): Option[BucketMeta] = buckets.get(name)
  def listTokens: Seq[TokenRecord] = tokens
  def listTasks: Seq[TaskMeta] = tasks

  def addTask(t: TaskMeta): Unit = synchronized {
    tasks = tasks.filterNot(_.id == t.id) :+ t; save()
  }

  def removeTask(id: String): Unit = synchronized {
    tasks = tasks.filterNot(_.id == id); save()
  }

  def createOrg(name: String): Unit = synchronized {
    orgs += name; save()
  }

  def createBucket(name: String, org: String, retentionNs: Long = 0L): BucketMeta = synchronized {
    buckets.get(name).getOrElse {
      val meta = BucketMeta(id = idFor(name), name = name, org = org, retentionNs = retentionNs)
      buckets += (name -> meta)
      orgs += org
      save()
      meta
    }
  }

  def dropBucket(name: String): Unit = synchronized {
    buckets -= name; save()
  }

  /** Rename keeps the persisted id (and therefore the data directory —
    * [[bucketPath]] resolves through the id, so a renamed bucket keeps
    * reading its existing partitions).
    */
  def renameBucket(oldName: String, newName: String): Boolean = synchronized {
    buckets.get(oldName) match {
      case Some(meta) if !buckets.contains(newName) =>
        buckets = buckets - oldName + (newName -> meta.copy(name = newName))
        save(); true
      case _ => false
    }
  }

  def setBucketRetention(name: String, retentionNs: Long): Boolean = synchronized {
    buckets.get(name) match {
      case Some(meta) =>
        buckets += (name -> meta.copy(retentionNs = retentionNs)); save(); true
      case None => false
    }
  }

  def dropOrg(name: String): Unit = synchronized {
    orgs -= name; save()
  }

  def addToken(rec: TokenRecord): Unit = synchronized {
    tokens :+= rec; save()
  }

  def removeToken(id: String): Boolean = synchronized {
    val before = tokens.size
    tokens = tokens.filterNot(_.id == id)
    if (tokens.size != before) { save(); true } else false
  }

  def setTokenStatus(id: String, status: String): Boolean = synchronized {
    tokens.indexWhere(_.id == id) match {
      case -1 => false
      case i => tokens = tokens.updated(i, tokens(i).copy(status = status)); save(); true
    }
  }

  /** Data directory for a bucket. Resolves through the PERSISTED id —
    * never recomputed from the name — so a warehouse written under an
    * older id scheme keeps resolving after the scheme changes (the
    * catalog JSON is the source of truth; [[idFor]] only mints ids for
    * new buckets).
    */
  def bucketPath(name: String): Path =
    root.resolve("buckets").resolve(buckets.get(name).map(_.id).getOrElse(idFor(name)))

  /** Stable 16-hex org id, derived like bucket ids but in a disjoint
    * namespace ("org/…") so an org and a bucket of the same name never
    * collide. Orgs are name-keyed in the catalog; the id exists for the
    * v2 admin API surface (`/api/v2/orgs`, permission strings like
    * `read:orgs/<orgID>/buckets/<bucketID>` — reference fixture
    * test/test_influxDBTokenStreamHandler.py:36-37).
    */
  def orgId(name: String): String = idFor("org/" + name)

  /** Stable bucket id — first 16 hex chars of SHA-256 of the name,
    * shaped like InfluxDB's 16-hex-char bucket IDs (see the permission
    * strings in the reference fixture
    * test/test_influxDBTokenStreamHandler.py:36-37). A cryptographic
    * digest, not String.hashCode: trivially colliding names of equal
    * length ("Aa"/"BB") must not map two buckets onto one directory.
    */
  private def idFor(name: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(name.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map(b => f"${b & 0xff}%02x").mkString

  // --- persistence: minimal hand-rolled JSON (flat schema, no deps) ---

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""

  private def save(): Unit = {
    val sb = new StringBuilder
    sb.append("{\"orgs\":[").append(orgs.toSeq.sorted.map(jstr).mkString(",")).append("],")
    sb.append("\"buckets\":[")
    sb.append(buckets.values.toSeq.sortBy(_.name).map { b =>
      s"{${jstr("id")}:${jstr(b.id)},${jstr("name")}:${jstr(b.name)},${jstr("org")}:${jstr(b.org)},${jstr("retentionNs")}:${b.retentionNs}}"
    }.mkString(","))
    sb.append("],\"tokens\":[")
    sb.append(tokens.map { t =>
      s"{${jstr("id")}:${jstr(t.id)},${jstr("description")}:${jstr(t.description)},${jstr("token")}:${jstr(t.token)}," +
        s"${jstr("status")}:${jstr(t.status)},${jstr("userName")}:${jstr(t.userName)},${jstr("userID")}:${jstr(t.userID)}," +
        s"${jstr("permissions")}:[${t.permissions.map(jstr).mkString(",")}]}"
    }.mkString(","))
    sb.append("],\"tasks\":[")
    // everyNs/offsetNs fit a double's 2^53 integer range (a week is
    // 6e14 ns), so the JsonMini number path round-trips them exactly
    sb.append(tasks.map { t =>
      s"{${jstr("id")}:${jstr(t.id)},${jstr("name")}:${jstr(t.name)},${jstr("org")}:${jstr(t.org)}," +
        s"${jstr("flux")}:${jstr(t.flux)},${jstr("everyNs")}:${t.everyNs},${jstr("offsetNs")}:${t.offsetNs}," +
        s"${jstr("status")}:${jstr(t.status)},${jstr("everyMonths")}:${t.everyMonths}}"
    }.mkString(","))
    sb.append("]}")
    Files.createDirectories(root)
    val tmp = root.resolve("_catalog.json.tmp")
    Files.writeString(tmp, sb.toString)
    Files.move(tmp, file, StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  private def load(): Unit = {
    if (!Files.exists(file)) return
    val txt = Files.readString(file)
    // Tiny recursive-descent JSON reader for our own flat format.
    val p = new JsonMini(txt)
    val obj = p.parse().asInstanceOf[Map[String, Any]]
    orgs = obj.getOrElse("orgs", Nil).asInstanceOf[Seq[Any]].map(_.toString).toSet
    buckets = obj.getOrElse("buckets", Nil).asInstanceOf[Seq[Any]].map { b =>
      val m = b.asInstanceOf[Map[String, Any]]
      val meta = BucketMeta(m("id").toString, m("name").toString, m("org").toString,
        m("retentionNs").asInstanceOf[Double].toLong)
      meta.name -> meta
    }.toMap
    tokens = obj.getOrElse("tokens", Nil).asInstanceOf[Seq[Any]].map { t =>
      val m = t.asInstanceOf[Map[String, Any]]
      TokenRecord(m("id").toString, m("description").toString, m("token").toString,
        m("status").toString, m("userName").toString, m("userID").toString,
        m("permissions").asInstanceOf[Seq[Any]].map(_.toString))
    }.toVector
    // absent in catalogs written before tasks were persisted
    tasks = obj.getOrElse("tasks", Nil).asInstanceOf[Seq[Any]].map { t =>
      val m = t.asInstanceOf[Map[String, Any]]
      TaskMeta(m("id").toString, m("name").toString, m("org").toString,
        m("flux").toString, m("everyNs").asInstanceOf[Double].toLong,
        m("offsetNs").asInstanceOf[Double].toLong, m("status").toString,
        // absent in catalogs written before calendar cadences existed
        m.get("everyMonths").map(_.asInstanceOf[Double].toInt).getOrElse(0))
    }.toVector
  }
}

/** Minimal JSON parser (objects, arrays, strings, numbers, bools, null).
  * Only used for the catalog file and control-plane wire messages — data
  * plane JSON goes through Spark's `from_json`.
  */
final class JsonMini(s: String) {
  private var i = 0
  def parse(): Any = { val v = value(); ws(); v }
  private def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
  private def value(): Any = {
    ws()
    s.charAt(i) match {
      case '{' =>
        i += 1; ws()
        val mb = Map.newBuilder[String, Any]
        if (s.charAt(i) == '}') { i += 1 }
        else {
          var more = true
          while (more) {
            ws(); val k = str(); ws()
            require(s.charAt(i) == ':', s"expected ':' at $i"); i += 1
            mb += (k -> value()); ws()
            if (s.charAt(i) == ',') i += 1 else { require(s.charAt(i) == '}'); i += 1; more = false }
          }
        }
        mb.result()
      case '[' =>
        i += 1; ws()
        val ab = Seq.newBuilder[Any]
        if (s.charAt(i) == ']') { i += 1 }
        else {
          var more = true
          while (more) {
            ab += value(); ws()
            if (s.charAt(i) == ',') i += 1 else { require(s.charAt(i) == ']'); i += 1; more = false }
          }
        }
        ab.result()
      case '"' => str()
      case 't' => i += 4; true
      case 'f' => i += 5; false
      case 'n' => i += 4; null
      case _ =>
        val t0 = i
        while (i < s.length && "-+.eE0123456789".indexOf(s.charAt(i)) >= 0) i += 1
        s.substring(t0, i).toDouble
    }
  }
  private def str(): String = {
    require(s.charAt(i) == '"'); i += 1
    val sb = new StringBuilder
    while (s.charAt(i) != '"') {
      if (s.charAt(i) == '\\') {
        i += 1
        s.charAt(i) match {
          case 'n' => sb.append('\n'); case 't' => sb.append('\t'); case 'r' => sb.append('\r')
          case 'u' => sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar); i += 4
          case c => sb.append(c)
        }
      } else sb.append(s.charAt(i))
      i += 1
    }
    i += 1
    sb.toString
  }
}
