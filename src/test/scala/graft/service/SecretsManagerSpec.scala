package graft.service

import com.sun.net.httpserver.HttpServer
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.TimeoutException
import org.scalatest.funsuite.AnyFunSuite

import SecretsManager.{SecretValueClient, UnauthorizedError}

/** 1:1 port of the reference's secrets tests
  * (test/test_retrieveInfluxDBSecrets.py:14-86): argument parsing, the
  * valid / missing-key / empty document paths, and the three transport
  * failure modes (timeout, unauthorized, generic) — plus an HTTP
  * round-trip against a Secrets-Manager-shaped endpoint, which the
  * reference cannot unit-test (its transport is Greengrass IPC) but we
  * can.
  */
class SecretsManagerSpec extends AnyFunSuite {

  private def clientReturning(doc: String): SecretValueClient =
    (_: String) => doc

  // test_parse_valid_args (test_retrieveInfluxDBSecrets.py:14-22)
  test("parse_arguments accepts --secret_arn") {
    assert(SecretsManager.parseArguments(
      Array("--secret_arn", "arn:test:object")) == "arn:test:object")
  }

  // test_parse_no_args (test_retrieveInfluxDBSecrets.py:25-30)
  test("parse_arguments aborts without --secret_arn") {
    intercept[IllegalArgumentException] {
      SecretsManager.parseArguments(Array.empty)
    }
    intercept[IllegalArgumentException] {
      SecretsManager.parseArguments(Array("--secret_arn")) // flag, no value
    }
  }

  // test_retrieve_secret_valid_response (test_retrieveInfluxDBSecrets.py:33-43)
  test("retrieve_secret formats 'username password' from a valid document") {
    var calls = 0
    var seenArn: String = null
    val client: SecretValueClient = { arn =>
      calls += 1; seenArn = arn
      """{"influxdb_username": "test_username", "influxdb_password": "test_password"}"""
    }
    val result = SecretsManager.retrieveSecret(client, "arn:test:object")
    assert(result == "test_username test_password")
    assert(calls == 1)
    assert(seenArn == "arn:test:object")
  }

  // test_retrieve_secret_invalid_response (test_retrieveInfluxDBSecrets.py:46-56)
  test("retrieve_secret raises on a document missing the expected keys") {
    val e = intercept[NoSuchElementException] {
      SecretsManager.retrieveSecret(
        clientReturning("""{"garbage value": "garbage"}"""), "arn:test:object")
    }
    assert(e.getMessage.contains("influxdb_username"))
  }

  // test_retrieve_secret_empty_response (test_retrieveInfluxDBSecrets.py:59-68)
  test("retrieve_secret raises on an empty document") {
    val e = intercept[NoSuchElementException] {
      SecretsManager.retrieveSecret(clientReturning("{}"), "arn:test:object")
    }
    assert(e.getMessage.contains("influxdb_username"))
  }

  // test_no_ipc_connection (test_retrieveInfluxDBSecrets.py:71-86):
  // the three transport failure modes, each re-raised distinctly.
  test("get_secret_over_ipc re-raises timeout, unauthorized, and generic failures") {
    val timingOut: SecretValueClient = { _ =>
      Thread.sleep(60000); "unreachable"
    }
    intercept[TimeoutException] {
      SecretsManager.getSecretOverIpc(timingOut, "arn:test:object",
        timeoutMillis = 100)
    }

    val unauthorized: SecretValueClient =
      _ => throw new UnauthorizedError("denied")
    intercept[UnauthorizedError] {
      SecretsManager.getSecretOverIpc(unauthorized, "arn:test:object")
    }

    val failing: SecretValueClient =
      _ => throw new RuntimeException("test")
    val e = intercept[RuntimeException] {
      SecretsManager.getSecretOverIpc(failing, "arn:test:object")
    }
    assert(e.getMessage == "test")

    // a TimeoutException raised INSIDE the worker (the HTTP client's
    // connect-phase socket-timeout mapping) classifies as the TIMEOUT
    // failure mode, not the generic one (r13 ADVICE)
    val innerTimeout: SecretValueClient =
      _ => throw new TimeoutException("connect timed out")
    val t = intercept[TimeoutException] {
      SecretsManager.getSecretOverIpc(innerTimeout, "arn:test:object")
    }
    assert(t.getMessage == "connect timed out")
  }

  test("SecretsManagerCredentials plugs the fetch into the provider trait") {
    val client = clientReturning(
      """{"influxdb_username": "u1", "influxdb_password": "p1"}""")
    val creds = new SecretsManagerCredentials(client, "arn:test:object")
    assert(creds.retrieve() == (("u1", "p1")))
  }

  test("HTTP client round-trips the GetSecretValue wire shape, maps 403") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", { exchange =>
      val body = new String(exchange.getRequestBody.readAllBytes(), UTF_8)
      val secretId = Json.mapper.readTree(body).get("SecretId").asText()
      val (code, resp) =
        if (secretId == "arn:denied") (403, """{"__type":"AccessDeniedException"}""")
        else (200, Json.obj(Seq("SecretString" ->
          """{"influxdb_username": "hu", "influxdb_password": "hp"}""")))
      val bytes = resp.getBytes(UTF_8)
      exchange.getResponseHeaders.set("Content-Type", "application/x-amz-json-1.1")
      exchange.sendResponseHeaders(code, bytes.length)
      exchange.getResponseBody.write(bytes)
      exchange.close()
    })
    server.start()
    try {
      val endpoint = s"http://127.0.0.1:${server.getAddress.getPort}/"
      val client = new HttpSecretValueClient(endpoint)
      assert(SecretsManager.retrieveSecret(client, "arn:ok") == "hu hp")
      intercept[UnauthorizedError] {
        client.getSecretValue("arn:denied")
      }
    } finally server.stop(0)
  }
}
