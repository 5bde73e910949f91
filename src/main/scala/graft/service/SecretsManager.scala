package graft.service

import java.net.{HttpURLConnection, SocketTimeoutException, URI}
import java.nio.charset.StandardCharsets
import java.util.concurrent.{TimeoutException, TimeUnit}
import java.util.logging.Logger

/** Secrets-Manager-shaped credential retrieval — the faithful twin of the
  * reference's `src/retrieveInfluxDBSecrets.py`:
  *
  *  - a transport client issues `GetSecretValue(secret_id)` against the
  *    secrets endpoint (retrieveInfluxDBSecrets.py:47-53);
  *  - the response wait is bounded by `TIMEOUT = 10` seconds
  *    (retrieveInfluxDBSecrets.py:12,54);
  *  - three DISTINCT failure modes are logged and re-raised: timeout,
  *    unauthorized, and any other exception
  *    (retrieveInfluxDBSecrets.py:55-63, tests
  *    test/test_retrieveInfluxDBSecrets.py:71-86);
  *  - the secret document is a two-key JSON object
  *    `{"influxdb_username": …, "influxdb_password": …}`; a missing key is
  *    a lookup error (the KeyError path,
  *    test/test_retrieveInfluxDBSecrets.py:46-66) — our
  *    `NoSuchElementException`, raised by [[JsonSecretCredentials]];
  *  - the CLI surface takes a required `--secret_arn` argument and prints
  *    `"<username> <password>"` (retrieveInfluxDBSecrets.py:29,69,77).
  */
object SecretsManager {

  /** retrieveInfluxDBSecrets.py:12 — `TIMEOUT = 10` (seconds). */
  val TimeoutMillis: Long = 10000L

  private val log = Logger.getLogger("graft.secrets")

  /** The reference's `UnauthorizedError` (awsiot model) analogue: the
    * secrets backend rejected the caller's authorization.
    */
  final class UnauthorizedError(message: String)
      extends RuntimeException(message)

  /** Transport for one secret fetch — the `ipc_client.new_get_secret_value()`
    * seam the reference mocks in every test. Implementations may block;
    * [[getSecretOverIpc]] bounds the wait.
    */
  trait SecretValueClient {
    /** @return the raw secret-string document for `secretId`
      * @throws UnauthorizedError if the backend denies access
      */
    def getSecretValue(secretId: String): String
  }

  /** `--secret_arn` argument parsing (retrieveInfluxDBSecrets.py:27-30):
    * required; absence aborts (argparse SystemExit → our
    * IllegalArgumentException).
    */
  def parseArguments(args: Array[String]): String = {
    val i = args.indexOf("--secret_arn")
    if (i < 0 || i + 1 >= args.length)
      throw new IllegalArgumentException(
        "the following arguments are required: --secret_arn")
    args(i + 1)
  }

  /** The `get_secret_over_ipc` twin (retrieveInfluxDBSecrets.py:33-63):
    * fetch with a bounded wait, classify-log-rethrow on failure. The
    * client call runs on a scratch thread so a hung backend surfaces as
    * the reference's `concurrent.futures.TimeoutError`
    * (`TimeoutException` here) instead of blocking the caller forever.
    */
  def getSecretOverIpc(client: SecretValueClient, secretArn: String,
      timeoutMillis: Long = TimeoutMillis): String = {
    val task = new java.util.concurrent.FutureTask[String](
      () => client.getSecretValue(secretArn))
    val t = new Thread(task, "graft-secret-fetch")
    t.setDaemon(true)
    try {
      t.start()
      task.get(timeoutMillis, TimeUnit.MILLISECONDS)
    } catch {
      case e: TimeoutException =>
        log.severe(s"Timeout occurred while getting secret: $secretArn")
        throw e
      case e: java.util.concurrent.ExecutionException =>
        e.getCause match {
          case u: UnauthorizedError =>
            log.severe(s"Unauthorized error while getting secret: $secretArn")
            throw u
          // a TimeoutException thrown INSIDE the worker (the HTTP
          // client's socket-timeout mapping) is the same failure mode
          // as the bounded-wait timeout — log it as one (r13 ADVICE)
          case t: TimeoutException =>
            log.severe(s"Timeout occurred while getting secret: $secretArn")
            throw t
          case other =>
            log.severe(s"Exception while getting secret: $secretArn")
            throw other
        }
      case e: UnauthorizedError =>
        log.severe(s"Unauthorized error while getting secret: $secretArn")
        throw e
    }
  }

  /** The `retrieve_secret` twin (retrieveInfluxDBSecrets.py:66-72): fetch,
    * parse the two-key JSON document, and format `"<username> <password>"`
    * exactly as the script prints it. A missing key raises
    * `NoSuchElementException` naming the key (the KeyError contract).
    */
  def retrieveSecret(client: SecretValueClient, secretArn: String,
      timeoutMillis: Long = TimeoutMillis): String =
    try {
      val response = getSecretOverIpc(client, secretArn, timeoutMillis)
      val (user, pass) = new JsonSecretCredentials(response).retrieve()
      s"$user $pass"
    } catch {
      case e: Throwable =>
        log.severe(s"Exception while retrieving secret: $secretArn")
        throw e
    }
}

/** HTTP-backed [[SecretsManager.SecretValueClient]] speaking the public
  * Secrets Manager GetSecretValue wire shape: POST
  * `{"SecretId": "<arn>"}` with target header
  * `secretsmanager.GetSecretValue`, response `{"SecretString": "<doc>"}`.
  * HTTP 403 maps to [[SecretsManager.UnauthorizedError]]; a socket
  * timeout maps to `TimeoutException` (the same taxonomy
  * retrieveInfluxDBSecrets.py:55-59 distinguishes).
  */
final class HttpSecretValueClient(endpoint: String,
    connectTimeoutMillis: Int = 5000, readTimeoutMillis: Int = 10000)
    extends SecretsManager.SecretValueClient {

  def getSecretValue(secretId: String): String = {
    val conn = URI.create(endpoint).toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setConnectTimeout(connectTimeoutMillis)
      conn.setReadTimeout(readTimeoutMillis)
      conn.setRequestMethod("POST")
      conn.setRequestProperty("Content-Type", "application/x-amz-json-1.1")
      conn.setRequestProperty("X-Amz-Target", "secretsmanager.GetSecretValue")
      conn.setDoOutput(true)
      val body = Json.obj(Seq("SecretId" -> secretId))
        .getBytes(StandardCharsets.UTF_8)
      // connect-phase timeouts surface from getOutputStream/write, not
      // only from the response read — map them to the SAME timeout
      // failure mode so the three-way taxonomy holds (r13 ADVICE)
      try conn.getOutputStream.write(body)
      catch { case e: SocketTimeoutException =>
        throw new TimeoutException(e.getMessage)
      }
      val code =
        try conn.getResponseCode
        catch { case e: SocketTimeoutException =>
          throw new TimeoutException(e.getMessage)
        }
      if (code == 403)
        throw new SecretsManager.UnauthorizedError(
          s"GetSecretValue denied for $secretId")
      if (code != 200)
        throw new RuntimeException(s"GetSecretValue failed: HTTP $code")
      val raw =
        try new String(conn.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
        catch { case e: SocketTimeoutException =>
          throw new TimeoutException(e.getMessage)
        }
      val node = Json.mapper.readTree(raw).get("SecretString")
      if (node == null)
        throw new RuntimeException("GetSecretValue response lacks SecretString")
      node.asText()
    } finally conn.disconnect()
  }
}

/** [[CredentialsProvider]] backed by a Secrets-Manager-shaped fetch — the
  * config-selected provider Bootstrap uses when `secretArn` names a real
  * secret (vs the file/env JSON providers). Inherits every failure mode of
  * [[SecretsManager.getSecretOverIpc]].
  */
final class SecretsManagerCredentials(client: SecretsManager.SecretValueClient,
    secretArn: String, timeoutMillis: Long = SecretsManager.TimeoutMillis)
    extends CredentialsProvider {
  def retrieve(): (String, String) = {
    val doc = SecretsManager.getSecretOverIpc(client, secretArn, timeoutMillis)
    new JsonSecretCredentials(doc).retrieve()
  }
}
