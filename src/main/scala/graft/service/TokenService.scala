package graft.service

import graft.store.{Catalog, TokenRecord}
import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ListBuffer

/** In-process pub/sub bus standing in for the Greengrass IPC topic pair
  * (reference: request topic subscribe at influxDBTokenPublisher.py:120-126,
  * response publish at influxDBTokenStreamHandler.py:122-154). The response
  * is broadcast — every subscriber sees every token response, the
  * documented security property of the reference design (SURVEY §3 E2).
  */
trait MessageBus {
  def publish(topic: String, message: String): Unit
  def subscribe(topic: String)(handler: String => Unit): Unit
}

final class InProcessBus extends MessageBus {
  private val subs = TrieMap.empty[String, ListBuffer[String => Unit]]
  def publish(topic: String, message: String): Unit =
    subs.get(topic).toSeq.flatten.foreach { h =>
      try h(message) catch { case _: Throwable => () } // per-subscriber isolation
    }
  def subscribe(topic: String)(handler: String => Unit): Unit =
    subs.getOrElseUpdate(topic, ListBuffer.empty) += handler
}

/** Token selection + response assembly — port of
  * InfluxDBTokenStreamHandler (reference:
  * src/influxDBTokenStreamHandler.py:86-120).
  */
final class TokenStreamHandler(tokens: () => Seq[TokenRecord], metadata: Seq[(String, String)]) {

  /** Reference :19,:107 — the admin token is record 0 and its
    * description must contain `'s Token`.
    */
  private val AdminMarker = "'s Token"

  /** Build the response JSON for a request message, or None when the
    * request is malformed / unknown (reference behavior: warn and
    * publish nothing, tests :83-135).
    *
    * @throws IllegalStateException when the selected token is empty
    *   (the reference's ValueError, :115-116)
    */
  def getPublishJson(requestJson: String): Option[String] = {
    val node =
      try Json.mapper.readTree(requestJson)
      catch { case _: Exception => return None }
    if (node == null || !node.has("action") || node.get("action").asText() != "RetrieveToken")
      return None
    val accessLevel = if (node.has("accessLevel")) node.get("accessLevel").asText() else ""
    val recs = tokens()
    val selected: Option[String] = accessLevel match {
      case "RW" => recs.find(_.description == "greengrass_readwrite").map(_.token)
      case "RO" => recs.find(_.description == "greengrass_read").map(_.token)
      case "Admin" =>
        recs.headOption.filter(_.description.contains(AdminMarker)).map(_.token)
      case _ => None
    }
    selected.map { tok =>
      if (tok.isEmpty)
        throw new IllegalStateException(s"retrieved $accessLevel token is empty")
      Json.obj(metadata ++ Seq("InfluxDBTokenAccessType" -> accessLevel, "InfluxDBToken" -> tok))
    }
  }

  /** Stream-event entry point: errors are logged and swallowed so the
    * subscription stays open (reference: on_stream_error returns False,
    * :57-70).
    */
  def handleStreamEvent(requestJson: String, bus: MessageBus, responseTopic: String): Unit =
    try getPublishJson(requestJson).foreach(bus.publish(responseTopic, _))
    catch { case e: Throwable => System.err.println(s"[token-service] $e") }
}

/** Token publisher — port of influxDBTokenPublisher.py: harvest the
  * token registry, assemble instance metadata, subscribe to the request
  * topic (reference: :53-90 harvest, :93-126 metadata+subscribe).
  */
final class TokenPublisher(catalog: Catalog, config: EngineConfig, bus: MessageBus) {

  /** Reference :80-88 — empty harvest output or an empty first token is
    * fatal at startup.
    */
  def harvestTokens(): Seq[TokenRecord] = {
    val recs = catalog.listTokens
    if (recs.isEmpty)
      throw new IllegalStateException("no tokens found in the registry")
    if (recs.head.token.isEmpty)
      throw new IllegalStateException("retrieved token list has an empty token")
    recs
  }

  /** Reference :108-116 — the 7-key instance metadata dict. */
  def metadata: Seq[(String, String)] = Seq(
    "InfluxDBContainerName" -> config.containerName,
    "InfluxDBOrg" -> config.org,
    "InfluxDBBucket" -> config.bucket,
    "InfluxDBPort" -> config.port,
    "InfluxDBInterface" -> config.interface,
    "InfluxDBServerProtocol" -> config.serverProtocol,
    "InfluxDBSkipTLSVerify" -> config.skipTlsVerify.toString
  )

  /** Subscribe the stream handler on the request topic. */
  def listen(): TokenStreamHandler = {
    harvestTokens()
    val handler = new TokenStreamHandler(() => catalog.listTokens, metadata)
    bus.subscribe(config.tokenRequestTopic)(msg =>
      handler.handleStreamEvent(msg, bus, config.tokenResponseTopic))
    handler
  }
}
