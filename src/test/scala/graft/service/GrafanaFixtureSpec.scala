package graft.service

import graft.SparkSpec
import graft.dsl.Tsdb
import graft.store.TokenRecord
import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

/** Replays recorded Grafana InfluxQL-datasource request shapes against
  * `/query` and asserts the EXACT v1 JSON body, byte for byte — the
  * reference's documented client is Grafana (README.md:408-410), and
  * these are the request forms its datasource actually issues:
  * template-variable metadata queries, absolute `…ms`-suffixed panel
  * time bounds with `epoch=ms`, multi-panel semicolon batches, and
  * rate panels built on `non_negative_derivative(mean(…), 1s)`.
  */
class GrafanaFixtureSpec extends SparkSpec {

  private lazy val tsdb: Tsdb = {
    val t = Tsdb(spark, Files.createTempDirectory("graft-grafana-spec").toString)
    t.catalog.createBucket("gfdb", "greengrass")
    t.catalog.addToken(TokenRecord("1", "greengrass_read", "roTok", "active", "admin", "u1", Seq("read:buckets")))
    t.catalog.addToken(TokenRecord("2", "greengrass_readwrite", "rwTok", "active", "admin", "u1", Seq("read:buckets", "write:buckets")))
    t
  }
  private lazy val api = new HttpApi(tsdb).start()
  private lazy val base = s"http://127.0.0.1:${api.boundPort}"
  private val client = HttpClient.newHttpClient()

  // 2024-01-15T00:00:00Z, minute-aligned; usage deltas are multiples of
  // 60 so per-minute rates serialize as short exact doubles
  private val t0 = 1705276800L
  private def ns(offsetSec: Long) = (t0 + offsetSec) * 1000000000L
  private def ms(offsetSec: Long) = (t0 + offsetSec) * 1000L

  private lazy val seeded: Boolean = {
    val lp = Seq(
      s"cpu,host=h1 usage=0 ${ns(0)}",
      s"cpu,host=h1 usage=60 ${ns(60)}",
      s"cpu,host=h1 usage=180 ${ns(120)}",
      s"cpu,host=h1 usage=120 ${ns(180)}",
      s"cpu,host=h2 usage=0 ${ns(0)}",
      s"cpu,host=h2 usage=0 ${ns(60)}",
      s"cpu,host=h2 usage=360 ${ns(120)}",
      s"cpu,host=h2 usage=240 ${ns(180)}",
      s"mem,host=h1 used_percent=50 ${ns(0)}"
    ).mkString("\n")
    val r = client.send(
      HttpRequest.newBuilder(URI.create(s"$base/api/v2/write?bucket=gfdb"))
        .header("Authorization", "Token rwTok")
        .POST(HttpRequest.BodyPublishers.ofString(lp)).build(),
      HttpResponse.BodyHandlers.ofString())
    assert(r.statusCode() == 204, r.body())
    true
  }

  /** GET /query exactly as Grafana does: urlencoded db/q/epoch params,
    * token auth header.
    */
  private def grafanaGet(q: String, epoch: Option[String] = Some("ms")): HttpResponse[String] = {
    assert(seeded)
    val ps = Seq("db" -> "gfdb", "q" -> q) ++ epoch.map("epoch" -> _)
    val qs = ps.map { case (k, v) => s"$k=${URLEncoder.encode(v, UTF_8)}" }.mkString("&")
    client.send(
      HttpRequest.newBuilder(URI.create(s"$base/query?$qs"))
        .header("Authorization", "Token roTok").GET().build(),
      HttpResponse.BodyHandlers.ofString())
  }

  private def assertFixture(q: String, expected: String,
      epoch: Option[String] = Some("ms")): Unit = {
    val r = grafanaGet(q, epoch)
    assert(r.statusCode() == 200, r.body())
    assert(r.body() == expected)
  }

  test("template variable: SHOW TAG VALUES FROM cpu WITH KEY = host") {
    assertFixture(
      "SHOW TAG VALUES FROM \"cpu\" WITH KEY = \"host\"",
      """{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","h1"],["host","h2"]]}]}]}""")
  }

  test("template variable: SHOW MEASUREMENTS") {
    assertFixture(
      "SHOW MEASUREMENTS",
      """{"results":[{"statement_id":0,"series":[{"name":"measurements","columns":["name"],"values":[["cpu"],["mem"]]}]}]}""")
  }

  test("query editor: SHOW FIELD KEYS FROM cpu lists key + v1 type") {
    assertFixture(
      "SHOW FIELD KEYS FROM \"cpu\"",
      """{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["fieldKey","fieldType"],"values":[["usage","float"]]}]}]}""")
  }

  test("template variable: FROM-less SHOW TAG VALUES splits one series per measurement") {
    assertFixture(
      "SHOW TAG VALUES WITH KEY = \"host\"",
      """{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","h1"],["host","h2"]]},{"name":"mem","columns":["key","value"],"values":[["host","h1"]]}]}]}""")
  }

  test("query editor: FROM-less SHOW TAG KEYS / FIELD KEYS split per measurement") {
    assertFixture(
      "SHOW TAG KEYS",
      """{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["tagKey"],"values":[["host"]]},{"name":"mem","columns":["tagKey"],"values":[["host"]]}]}]}""")
    assertFixture(
      "SHOW FIELD KEYS",
      """{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["fieldKey","fieldType"],"values":[["usage","float"]]},{"name":"mem","columns":["fieldKey","fieldType"],"values":[["used_percent","float"]]}]}]}""")
  }

  test("graph panel: mean over time(1m), ms-suffixed absolute bounds, epoch=ms") {
    // Grafana's literal shape: lowercase `and`, `…ms` bounds, inclusive
    // upper bound → the trailing empty bucket arrives as fill(null)
    assertFixture(
      s"SELECT mean(\"usage\") FROM \"cpu\" WHERE time >= ${ms(0)}ms and time <= ${ms(240)}ms GROUP BY time(1m) fill(null)",
      """{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","mean"],"values":[[1705276800000,0.0],[1705276860000,30.0],[1705276920000,270.0],[1705276980000,180.0],[1705277040000,null]]}]}]}""")
  }

  test("multi-panel dashboard: semicolon batch answers one result per statement") {
    assertFixture(
      s"SELECT mean(\"usage\") FROM \"cpu\" WHERE time >= ${ms(0)}ms and time <= ${ms(240)}ms GROUP BY time(1m) fill(null);" +
        s"SELECT max(\"used_percent\") FROM \"mem\" WHERE time >= ${ms(0)}ms and time <= ${ms(240)}ms GROUP BY time(1m) fill(null)",
      """{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","mean"],"values":[[1705276800000,0.0],[1705276860000,30.0],[1705276920000,270.0],[1705276980000,180.0],[1705277040000,null]]}]},{"statement_id":1,"series":[{"name":"mem","columns":["time","max"],"values":[[1705276800000,50.0],[1705276860000,null],[1705276920000,null],[1705276980000,null],[1705277040000,null]]}]}]}""")
  }

  test("rate panel: non_negative_derivative(mean(usage), 1s) per host") {
    // negative rate rows are omitted (v1 contract); one series per
    // GROUP BY host value with a tags object
    assertFixture(
      s"SELECT non_negative_derivative(mean(\"usage\"), 1s) FROM \"cpu\" WHERE time >= ${ms(0)}ms and time <= ${ms(240)}ms GROUP BY time(1m), \"host\" fill(null)",
      """{"results":[{"statement_id":0,"series":[{"name":"cpu","tags":{"host":"h1"},"columns":["time","non_negative_derivative"],"values":[[1705276860000,1.0],[1705276920000,2.0]]},{"name":"cpu","tags":{"host":"h2"},"columns":["time","non_negative_derivative"],"values":[[1705276860000,0.0],[1705276920000,6.0]]}]}]}""")
  }

  test("singlestat panel: lone selector carries its point's timestamp") {
    assertFixture(
      "SELECT last(\"usage\") FROM \"cpu\"",
      s"""{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","last"],"values":[[${ms(180)},240.0]]}]}]}""")
    // default (no epoch param): RFC3339 strings, v1's default rendering
    assertFixture(
      "SELECT last(\"usage\") FROM \"cpu\"",
      """{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","last"],"values":[["2024-01-15T00:03:00Z",240.0]]}]}]}""",
      epoch = None)
  }

  test("singlestat panel: percentile is a nearest-rank selector with its point's time") {
    // 8 values sorted: 0,0,0,60,120,180,240,360; rank = floor(8*.5+.5) = 4
    // → value 60, the h1 point at t0+60s
    assertFixture(
      "SELECT percentile(\"usage\", 50) FROM \"cpu\"",
      s"""{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","percentile"],"values":[[${ms(60)},60.0]]}]}]}""")
  }

  test("non-selector aggregate carries v1's epoch-0 time on the JSON surface") {
    assertFixture(
      "SELECT mean(\"usage\") FROM \"cpu\"",
      """{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","mean"],"values":[[0,120.0]]}]}]}""")
  }

  test("pretty=true indents the JSON body") {
    assert(seeded)
    val r = client.send(
      HttpRequest.newBuilder(URI.create(s"$base/query?db=gfdb&pretty=true&q=" +
        URLEncoder.encode("SHOW MEASUREMENTS", UTF_8)))
        .header("Authorization", "Token roTok").GET().build(),
      HttpResponse.BodyHandlers.ofString())
    assert(r.statusCode() == 200)
    assert(r.body().contains("\n  ")) // indented
    assert(Json.mapper.readTree(r.body()).at("/results/0/series/0/name").asText() == "measurements")
  }

  test("chunked=true streams one JSON document per chunk with partial flags") {
    // 4 cpu points per host, chunk_size=3 → h1 splits into a partial
    // 3-row chunk + a 1-row tail; h2 likewise; 4 documents total
    val r = grafanaGet(
      s"SELECT \"usage\" FROM \"cpu\" WHERE time >= ${ms(0)}ms and time <= ${ms(240)}ms GROUP BY \"host\"")
    assert(r.statusCode() == 200)
    val chunked = client.send(
      HttpRequest.newBuilder(URI.create(s"$base/query?db=gfdb&epoch=ms&chunked=true&chunk_size=3&q=" +
        URLEncoder.encode("SELECT \"usage\" FROM \"cpu\" WHERE time >= " + ms(0) +
          "ms and time <= " + ms(240) + "ms GROUP BY \"host\"", UTF_8)))
        .header("Authorization", "Token roTok").GET().build(),
      HttpResponse.BodyHandlers.ofString())
    assert(chunked.statusCode() == 200)
    val docs = chunked.body().linesIterator.filter(_.nonEmpty).toSeq
    assert(docs.length == 4, docs.mkString("\n"))
    val parsed = docs.map(Json.mapper.readTree)
    // chunks 0/2 are the partial 3-row heads, 1/3 the 1-row tails
    assert(parsed(0).at("/results/0/partial").asBoolean(false))
    assert(parsed(0).at("/results/0/series/0/partial").asBoolean(false))
    assert(parsed(0).at("/results/0/series/0/values").size() == 3)
    // h1's tail chunk: the series ends (series flag clears) but h2's
    // chunks still follow, so the RESULT stays partial (v1 contract)
    assert(parsed(1).at("/results/0/partial").asBoolean(false))
    assert(!parsed(1).at("/results/0/series/0/partial").asBoolean(false))
    assert(parsed(1).at("/results/0/series/0/values").size() == 1)
    // the statement's final chunk clears both flags
    assert(!parsed(3).at("/results/0/partial").asBoolean(false))
    assert(!parsed(3).at("/results/0/series/0/partial").asBoolean(false))
    assert(parsed(0).at("/results/0/series/0/tags/host").asText() == "h1")
    assert(parsed(2).at("/results/0/series/0/tags/host").asText() == "h2")
    // every chunk is a complete stand-alone document with the same
    // statement_id and columns
    parsed.foreach { d =>
      assert(d.at("/results/0/statement_id").asInt() == 0)
      assert(d.at("/results/0/series/0/columns/0").asText() == "time")
    }
    // reassembled values equal the non-chunked response's values
    val flat = Json.mapper.readTree(r.body())
    val flatVals = (0 until flat.at("/results/0/series").size()).flatMap { i =>
      val v = flat.at(s"/results/0/series/$i/values")
      (0 until v.size()).map(j => v.get(j).toString)
    }
    val chunkVals = parsed.flatMap { d =>
      val v = d.at("/results/0/series/0/values")
      (0 until v.size()).map(j => v.get(j).toString)
    }
    assert(chunkVals.sorted == flatVals.sorted)
  }

  test("chunked reassembly equals the flat response for every chunk size (property)") {
    assert(seeded)
    val q = s"SELECT \"usage\" FROM \"cpu\" WHERE time >= ${ms(0)}ms and time <= ${ms(240)}ms GROUP BY \"host\""
    val flat = Json.mapper.readTree(V1Query.run(tsdb, "gfdb", q, None, Some("ms")))
    val flatVals = (0 until flat.at("/results/0/series").size()).flatMap { i =>
      val v = flat.at(s"/results/0/series/$i/values")
      (0 until v.size()).map(j =>
        flat.at(s"/results/0/series/$i/tags/host").asText() + "|" + v.get(j).toString)
    }.sorted
    for (size <- Seq(1, 2, 3, 5, 1000)) {
      val docs = Seq.newBuilder[String]
      V1Query.runChunked(tsdb, "gfdb", q, None, Some("ms"), size)(docs += _)
      val parsed = docs.result().map(Json.mapper.readTree)
      // every chunk obeys the size bound and carries exactly one series
      parsed.foreach { d =>
        assert(d.at("/results/0/series").size() == 1)
        assert(d.at("/results/0/series/0/values").size() <= size)
      }
      val vals = parsed.flatMap { d =>
        val v = d.at("/results/0/series/0/values")
        (0 until v.size()).map(j =>
          d.at("/results/0/series/0/tags/host").asText() + "|" + v.get(j).toString)
      }.sorted
      assert(vals == flatVals, s"chunk_size=$size")
      // each series' last chunk clears the SERIES flag; the RESULT
      // flag stays set on every chunk but the statement's final one
      val lastBySeries = parsed.groupBy(_.at("/results/0/series/0/tags/host").asText())
        .values.map(_.last)
      lastBySeries.foreach(d =>
        assert(!d.at("/results/0/series/0/partial").asBoolean(false)))
      assert(!parsed.last.at("/results/0/partial").asBoolean(false))
      parsed.init.foreach(d =>
        assert(d.at("/results/0/partial").asBoolean(false), s"chunk_size=$size"))
    }
  }

  test("star expansion on a real bucket covers data fields only (no time_ns shadow)") {
    // fieldsAsCols carries the internal ns twin column (time_ns) for
    // scan pushdown; v1's */mean(*)/count(*) expansion must not leak it
    assertFixture(
      "SELECT mean(*) FROM \"cpu\"",
      """{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","mean_usage"],"values":[[0,120.0]]}]}]}""")
    assertFixture(
      "SELECT count(*) FROM \"mem\"",
      """{"results":[{"statement_id":0,"series":[{"name":"mem","columns":["time","count_used_percent"],"values":[[0,1]]}]}]}""")
    val raw = grafanaGet("SELECT * FROM \"mem\"")
    assert(raw.statusCode() == 200, raw.body())
    val cols = Json.mapper.readTree(raw.body()).at("/results/0/series/0/columns")
    val names = (0 until cols.size()).map(cols.get(_).asText())
    assert(!names.contains("time_ns"), names.mkString(","))
    assert(names.contains("used_percent"))
  }

  test("grouped selector: per-series point timestamps, series in tag order") {
    assertFixture(
      "SELECT max(\"usage\") FROM \"cpu\" GROUP BY \"host\"",
      s"""{"results":[{"statement_id":0,"series":[{"name":"cpu","tags":{"host":"h1"},"columns":["time","max"],"values":[[${ms(120)},180.0]]},{"name":"cpu","tags":{"host":"h2"},"columns":["time","max"],"values":[[${ms(120)},360.0]]}]}]}""")
  }
}
