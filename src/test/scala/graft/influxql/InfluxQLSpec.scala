package graft.influxql

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** InfluxQL v1 front-end: parser shapes + evaluation against a small
  * in-memory measurement.
  */
class InfluxQLSpec extends SparkSpec {
  import spark.implicits._
  import InfluxQL._

  test("parses aggregates, where, group by time + tag, fill, order, limit") {
    val s = InfluxQL.parse(
      """SELECT mean(usage) AS m, max(usage) FROM cpu
        |WHERE time >= '2024-01-08T00:00:00Z' AND time < now() - 1h AND host = 'h1'
        |GROUP BY time(10m), host FILL(0) ORDER BY time DESC LIMIT 10 OFFSET 2""".stripMargin
      .replace('\n', ' ')).asInstanceOf[Select]
    assert(s.projs == Seq(AggProj("mean", "usage", None, Some("m")),
      AggProj("max", "usage", None, None)))
    assert(s.from == "cpu")
    assert(s.groupTime.contains(Dur(10, "m")) && s.groupTags == Seq("host"))
    assert(s.fill == FillValue(0.0) && s.orderDesc)
    assert(s.limit.contains(10) && s.offset.contains(2))
    val w = s.where.get.asInstanceOf[CAnd]
    assert(w.r == CCmp("=", "host", LStr("h1")))
  }

  test("parses SHOW statements and quoted identifiers") {
    assert(InfluxQL.parse("SHOW MEASUREMENTS") == ShowMeasurements)
    assert(InfluxQL.parse("SHOW TAG KEYS FROM cpu") == ShowTagKeys(Some("cpu")))
    assert(InfluxQL.parse("SHOW FIELD KEYS") == ShowFieldKeys(None))
    val s = InfluxQL.parse("""SELECT mean("usage user") FROM "my cpu"""")
      .asInstanceOf[Select]
    assert(s.projs == Seq(AggProj("mean", "usage user", None, None)) && s.from == "my cpu")
  }

  test("rejects malformed input with position info") {
    assertThrows[ParseException](InfluxQL.parse("SELECT FROM cpu"))
    assertThrows[ParseException](InfluxQL.parse("SELECT mean(v) FROM cpu trailing"))
  }

  private def cpuFrame = Seq(
    ("h1", java.sql.Timestamp.valueOf("2024-01-08 00:05:00"), 1.0),
    ("h1", java.sql.Timestamp.valueOf("2024-01-08 00:25:00"), 3.0),
    ("h1", java.sql.Timestamp.valueOf("2024-01-08 01:05:00"), 5.0),
    ("h2", java.sql.Timestamp.valueOf("2024-01-08 00:15:00"), 10.0))
    .toDF("host", "time", "usage")

  private val source = InfluxQLEval.Source(resolve = _ => cpuFrame)

  test("group by time + tag computes per-window aggregates labeled by window start," +
      " empty windows null-filled by default") {
    val out = InfluxQLEval.run(
      "SELECT mean(usage) FROM cpu WHERE time >= '2024-01-08T00:00:00Z' " +
        "AND time < '2024-01-08T02:00:00Z' GROUP BY time(1h), host", source)
    val rows = out.select(col("time").cast("string"), col("host"), col("mean"))
      .as[(String, String, Option[Double])].collect().toSet
    // default is fill(null): h2's empty 01:00 bucket IS emitted, value null
    assert(rows == Set(
      ("2024-01-08 00:00:00", "h1", Some(2.0)),
      ("2024-01-08 01:00:00", "h1", Some(5.0)),
      ("2024-01-08 00:00:00", "h2", Some(10.0)),
      ("2024-01-08 01:00:00", "h2", None)))
  }

  test("explicit fill(none) suppresses empty windows; unbounded GROUP BY time degrades quietly") {
    val out = InfluxQLEval.run(
      "SELECT mean(usage) FROM cpu WHERE time >= '2024-01-08T00:00:00Z' " +
        "AND time < '2024-01-08T02:00:00Z' GROUP BY time(1h), host FILL(none)", source)
    assert(out.count() == 3)
    // no absolute bounds -> no spine to fill; the default fill(null)
    // must not reject the query
    val unbounded = InfluxQLEval.run(
      "SELECT mean(usage) FROM cpu GROUP BY time(1h), host", source)
    assert(unbounded.count() == 3)
  }

  test("derivative default unit is the GROUP BY time interval; ns integer bounds are Long-exact") {
    // 2024-01-08T00:00:00Z = 1704672000 s -> ns literal beyond 2^53
    val out = InfluxQLEval.run(
      "SELECT derivative(mean(usage)) FROM cpu WHERE time >= 1704672000000000000 " +
        "AND time < 1704679200000000000 GROUP BY time(1h), host", source)
    val rows = out.select(col("host"), col("derivative"))
      .as[(String, Double)].collect().toSeq
    // mean 2.0 -> 5.0 across one 1h bucket = +3.0 per interval (not per second)
    assert(rows == Seq(("h1", 3.0)))
  }

  test("fill(0) emits empty windows inside the queried range") {
    val out = InfluxQLEval.run(
      "SELECT sum(usage) FROM cpu WHERE time >= '2024-01-08T00:00:00Z' " +
        "AND time < '2024-01-08T03:00:00Z' GROUP BY time(1h), host FILL(0)", source)
    val rows = out.select(col("time").cast("string"), col("host"), col("sum"))
      .as[(String, String, Double)].collect().toSet
    assert(rows.size == 6) // 3 windows x 2 hosts
    assert(rows.contains(("2024-01-08 02:00:00", "h1", 0.0)))
    assert(rows.contains(("2024-01-08 01:00:00", "h2", 0.0)))
  }

  test("ungrouped aggregate, tag filter, first/last selectors") {
    val out = InfluxQLEval.run(
      "SELECT first(usage), last(usage), spread(usage) FROM cpu WHERE host = 'h1'", source)
    val r = out.as[(Double, Double, Double)].collect().head
    assert(r == ((1.0, 5.0, 4.0)))
  }

  test("raw field select with order desc and limit") {
    val out = InfluxQLEval.run(
      "SELECT usage FROM cpu ORDER BY time DESC LIMIT 2", source)
    assert(out.select("usage").as[Double].collect().toSeq == Seq(5.0, 3.0))
  }

  test("derivative over GROUP BY time aggregates (the Grafana rate panel)") {
    val out = InfluxQLEval.run(
      "SELECT derivative(mean(usage), 1h) FROM cpu WHERE time >= '2024-01-08T00:00:00Z' " +
        "AND time < '2024-01-08T02:00:00Z' GROUP BY time(1h), host", source)
    val rows = out.select(col("host"), col("derivative"))
      .as[(String, Double)].collect().toSeq
    assert(rows == Seq(("h1", 3.0))) // mean 2.0 -> 5.0 over one hour
  }

  test("moving_average and cumulative_sum over raw points") {
    val ma = InfluxQLEval.run(
      "SELECT moving_average(usage, 2) FROM cpu WHERE host = 'h1'", source)
    assert(ma.select("moving_average").as[Double].collect().toSeq == Seq(2.0, 4.0))
    val cs = InfluxQLEval.run(
      "SELECT cumulative_sum(usage) FROM cpu WHERE host = 'h1'", source)
    assert(cs.select("cumulative_sum").as[Double].collect().toSeq == Seq(1.0, 4.0, 9.0))
  }

  test("SLIMIT/SOFFSET slice series, LIMIT slices points") {
    val out = InfluxQLEval.run(
      "SELECT mean(usage) FROM cpu GROUP BY host SLIMIT 1", source)
    assert(out.select("host").as[String].collect().toSeq == Seq("h1"))
    val out2 = InfluxQLEval.run(
      "SELECT mean(usage) FROM cpu GROUP BY host SLIMIT 1 SOFFSET 1", source)
    assert(out2.select("host").as[String].collect().toSeq == Seq("h2"))
    val e = intercept[InfluxQLEval.EvalException](
      InfluxQLEval.run("SELECT mean(usage) FROM cpu SLIMIT 1", source))
    assert(e.getMessage.contains("SLIMIT"))
  }

  test("store-backed: v1 /query JSON over a real bucket") {
    val dir = java.nio.file.Files.createTempDirectory("graft-influxql-spec")
    val tsdb = graft.dsl.Tsdb(spark, dir.toString)
    tsdb.catalog.createBucket("v1db", "greengrass")
    val t0 = 1704672000L * 1000000000L // 2024-01-08T00:00:00Z
    tsdb.writeLp("v1db", Seq(
      s"cpu,host=h1 usage=0.5 $t0",
      s"cpu,host=h1 usage=0.7 ${t0 + 60L * 1000000000L}",
      s"cpu,host=h2 usage=0.9 $t0"))
    val json = graft.service.V1Query.run(tsdb, "v1db",
      "SELECT mean(usage) FROM cpu GROUP BY host")
    val node = graft.service.Json.mapper.readTree(json)
    val series = node.get("results").get(0).get("series")
    assert(series.size() == 2) // one series per host
    val byHost = (0 until series.size()).map { i =>
      series.get(i).get("tags").get("host").asText() ->
        series.get(i).get("values").get(0).get(0).asDouble()
    }.toMap
    assert(math.abs(byHost("h1") - 0.6) < 1e-9 && byHost("h2") == 0.9)
    // SHOW queries
    val meas = graft.service.Json.mapper.readTree(
      graft.service.V1Query.run(tsdb, "v1db", "SHOW MEASUREMENTS"))
    assert(meas.get("results").get(0).get("series").get(0)
      .get("values").get(0).get(0).asText() == "cpu")
  }
}
