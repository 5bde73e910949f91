package graft.service

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}
import javax.net.ssl.{KeyManagerFactory, SSLContext}

/** Self-signed TLS for the /api/v2 surface.
  *
  * The reference's Install step generates a self-signed certificate
  * (recipe.yaml:62-71) and provision mode then runs the engine
  * HTTPS-only (src/influxdb_utils.sh:164-183, INFLUXD_TLS_CERT/KEY);
  * this mirrors that lifecycle with the JDK's keytool producing a
  * PKCS12 keystore under the warehouse, reused across restarts.
  */
object Tls {

  final case class Config(keystore: Path, password: String)

  /** Generate (once) and return a self-signed keystore under `dir`. */
  def selfSigned(dir: Path, cn: String = "localhost",
      password: String = "graft-selfsigned"): Config = {
    val ks = dir.resolve("graft-tls.p12")
    if (!Files.exists(ks)) {
      Files.createDirectories(dir)
      val keytool = Paths.get(System.getProperty("java.home"), "bin", "keytool").toString
      val cmd = Seq(keytool, "-genkeypair", "-alias", "graft",
        "-keyalg", "RSA", "-keysize", "2048", "-storetype", "PKCS12",
        "-keystore", ks.toString, "-storepass", password,
        "-dname", s"CN=$cn", "-validity", "365",
        "-ext", s"SAN=dns:$cn,ip:127.0.0.1")
      val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes(), UTF_8)
      if (p.waitFor() != 0)
        throw new IllegalStateException(s"keytool self-signed cert generation failed: $out")
    }
    Config(ks, password)
  }

  def sslContext(cfg: Config): SSLContext = {
    val ks = java.security.KeyStore.getInstance("PKCS12")
    val in = Files.newInputStream(cfg.keystore)
    try ks.load(in, cfg.password.toCharArray) finally in.close()
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, cfg.password.toCharArray)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }
}
