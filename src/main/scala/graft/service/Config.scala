package graft.service

/** Engine configuration — the 14 recipe parameters the reference's Run
  * lifecycle passes positionally (reference: recipe.yaml:80-99, validated
  * non-empty at src/run_influxdb.sh:23-39).
  */
final case class EngineConfig(
    containerName: String = "greengrass_InfluxDB",   // InfluxDBContainerName
    org: String = "greengrass",                      // InfluxDBOrg
    bucket: String = "greengrass-telemetry",         // InfluxDBBucket
    port: String = "8086",                           // InfluxDBPort
    interface: String = "127.0.0.1",                 // InfluxDBInterface
    warehousePath: String = "",                      // InfluxDBMountPath analogue
    certPath: String = "-",                          // bridge-network/cert args
    keyPath: String = "-",
    skipTlsVerify: Boolean = true,                   // InfluxDBSkipTLSVerify
    serverProtocol: String = "https",                // InfluxDBServerProtocol
    autoProvision: Boolean = true,                   // AutoProvision (mode dispatch C5)
    secretArn: String = "-",                         // SecretArn for credentials
    tokenRequestTopic: String = "greengrass/influxdb/token/request",
    tokenResponseTopic: String = "greengrass/influxdb/token/response"
) {
  /** C4: reject empty args like run_influxdb.sh does. */
  def validate(): Either[String, EngineConfig] = {
    val fields = productIterator.zip(productElementNames).toSeq
    fields.collectFirst {
      case (v: String, name) if v.isEmpty => s"argument '$name' is empty"
    }.toLeft(this)
  }
}

/** Password policy (reference: src/influxdb_utils.sh:102-110): length
  * >= 16 with uppercase, lowercase, digit, and a special from #$@%+*&!^.
  */
object Password {
  private val Special = "#$@%+*&!^".toSet

  def validate(password: String): Either[String, Unit] =
    if (password.length < 16) Left("password must be at least 16 characters")
    else if (!password.exists(_.isUpper)) Left("password needs an uppercase character")
    else if (!password.exists(_.isLower)) Left("password needs a lowercase character")
    else if (!password.exists(_.isDigit)) Left("password needs a digit")
    else if (!password.exists(Special)) Left("password needs a special character (#$@%+*&!^)")
    else Right(())
}

/** Credentials provider (reference: src/retrieveInfluxDBSecrets.py —
  * fetches `{"influxdb_username": …, "influxdb_password": …}` over IPC).
  * Implementations: secret-JSON doc, env vars, files.
  */
trait CredentialsProvider {
  /** @throws NoSuchElementException if a key is missing (the reference's
    *   KeyError path, test_retrieveInfluxDBSecrets.py:45-66)
    */
  def retrieve(): (String, String)
}

final class JsonSecretCredentials(secretJson: String) extends CredentialsProvider {
  def retrieve(): (String, String) = {
    val node = Json.mapper.readTree(secretJson)
    def req(k: String): String = {
      val v = node.get(k)
      if (v == null) throw new NoSuchElementException(s"secret is missing key '$k'")
      v.asText()
    }
    (req("influxdb_username"), req("influxdb_password"))
  }
}

/** Shared Jackson mapper (ships with Spark — no extra dependency). */
object Json {
  val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def obj(pairs: Seq[(String, String)]): String = {
    val node = mapper.createObjectNode()
    pairs.foreach { case (k, v) => node.put(k, v) }
    mapper.writeValueAsString(node)
  }
}
