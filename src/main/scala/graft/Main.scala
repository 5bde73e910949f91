package graft

import graft.dsl.Tsdb
import graft.service._
import graft.streaming.StreamIngest
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Engine entry point — the Run-lifecycle analogue (SURVEY §3 E1):
  * config → SparkSession → idempotent bootstrap (org, bucket, tokens) →
  * token-vending service → optional streaming LP ingest → await.
  *
  * Usage: graft.Main <warehouseDir> [lpIngestDir]
  *
  * Credentials come from GRAFT_SECRET_JSON (the reference fetches the
  * same `{"influxdb_username": …, "influxdb_password": …}` document from
  * Secrets Manager over IPC, src/retrieveInfluxDBSecrets.py).
  */
object Main {
  /** Env-var integer with a loud, NAMED failure — a malformed value
    * must not kill startup with a bare NumberFormatException.
    */
  private def envInt(name: String, default: Int): Int =
    sys.env.get(name).map(v => v.trim.toIntOption.getOrElse(
      sys.error(s"$name must be an integer, got '$v'"))).getOrElse(default)

  def main(args: Array[String]): Unit = {
    val warehouse = args.headOption.getOrElse("/tmp/graft-warehouse")
    val ingestDir = args.lift(1)

    val config = EngineConfig(warehousePath = warehouse)
      .validate().fold(msg => throw new IllegalArgumentException(msg), identity)

    // serviceDefaults: the engine process hosts long-running streams
    // (ingest, CQs, tasks) — cap the SQL status store's per-execution
    // retention or the driver heap grows for thousands of micro-batches.
    // The AQE start width is sized from the warehouse's on-disk bytes at
    // boot (file metadata only); ingest growth past that is picked up by
    // the maintenance sweep's monotone refreshWidth below.
    val cores = envInt("SPARK_GRAFT_CPUS", 32)
    val spark = SparkTuning.serviceDefaults(SparkTuning.scaleDefaults(
      SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .appName("graft-engine")
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]")),
        cores, SparkTuning.dirBytes(warehouse)))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()

    val tsdb = Tsdb(spark, warehouse)

    val api: Option[HttpApi] =
      if (!config.autoProvision) None
      else {
        // Credential source selection (C12): a Secrets-Manager-shaped
        // endpoint when configured (the reference's IPC GetSecretValue
        // path, src/retrieveInfluxDBSecrets.py), else the inline JSON
        // document from the environment.
        val creds: CredentialsProvider = sys.env.get("GRAFT_SECRET_ENDPOINT") match {
          case Some(endpoint) if config.secretArn != "-" =>
            new SecretsManagerCredentials(
              new HttpSecretValueClient(endpoint), config.secretArn)
          case _ =>
            new JsonSecretCredentials(sys.env.getOrElse("GRAFT_SECRET_JSON",
              """{"influxdb_username": "admin", "influxdb_password": "ChangeMe123#Secure"}"""))
        }
        val prov = Bootstrap.provision(tsdb.catalog, config, creds)
        println(if (prov.reused) "Reusing existing setup" else s"Provisioned bucket ${prov.bucketId}")
        val bus = new InProcessBus
        new TokenPublisher(tsdb.catalog, config, bus).listen()
        // provision mode serves HTTPS-only like the reference engine
        // (self-signed cert generated at install, recipe.yaml:62-71)
        val tls =
          if (config.serverProtocol == "https")
            Some(Tls.selfSigned(java.nio.file.Paths.get(warehouse, "_tls")))
          else None
        // -Dgraft.auth.legacyDescriptions=true: description-based auth
        // fallback for catalogs written before tokens carried
        // permission strings (see HttpApi's scaladoc); default off
        val a = new HttpApi(tsdb, config.port.toInt, config.interface, tls,
          legacyDescriptionAuth =
            sys.props.get("graft.auth.legacyDescriptions").exists(_.toBoolean)).start()
        println(s"/api/v2 listening on ${a.scheme}://${config.interface}:${a.boundPort}")
        Some(a)
      }

    val ready = Health.waitReady(() => tsdb.catalog.bucket(config.bucket).nonEmpty)
    if (!ready) { System.err.println("engine failed readiness probe"); sys.exit(1) }

    // background retention/compaction, like the pinned engine's own
    // expiry + TSM cycles (no operator action); 0 disables
    val maintSecs = sys.env.getOrElse("GRAFT_MAINTENANCE_SECONDS", "1800").toLong
    val maintenance =
      if (maintSecs > 0) Some(new Maintenance(tsdb.store, maintSecs,
        // corpus growth signal: each sweep re-derives the AQE start
        // width from the warehouse's current bytes (monotone raise —
        // a long-lived ingesting service never stays at its boot width)
        postSweep = () => SparkTuning.refreshWidth(spark, cores,
          SparkTuning.dirBytes(warehouse))).start())
      else None

    ingestDir match {
      case Some(dir) =>
        // small-file cadence knobs (see StreamIngest.start): 0 disables
        // the sweep — REQUIRED if a file-stream consumer tails the
        // ingest bucket live (DownsampleTask scaladoc)
        val q = new StreamIngest(tsdb).start(
          config.bucket, spark.readStream.textFile(dir),
          s"$warehouse/_checkpoints/ingest",
          Trigger.ProcessingTime("10 seconds"),
          compactEvery = envInt("GRAFT_INGEST_COMPACT_EVERY", 8),
          maxFilesPerPartition = envInt("GRAFT_INGEST_MAX_FILES", 16))
        q.awaitTermination() // Spark stays up for the API while ingesting
      case None if api.nonEmpty =>
        // keep-alive: serve /api/v2 until killed (the reference blocks on
        // `docker logs --follow` the same way, C6). Spark must outlive
        // the server — queries run through it.
        println("graft engine ready — serving /api/v2")
        new java.util.concurrent.CountDownLatch(1).await()
      case None =>
        println("graft engine ready (no provisioning, batch API only)")
    }
    maintenance.foreach(_.stop())
    api.foreach(_.stop())
    spark.stop()
  }
}
