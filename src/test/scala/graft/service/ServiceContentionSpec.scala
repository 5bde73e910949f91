package graft.service

import graft.SparkSpec
import graft.dsl.Tsdb
import graft.flux.FluxEval
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Engine fixes flushed out by the r18 concurrent-service soak — each
  * failure mode here was observed live as an HTTP 500 before its fix:
  *
  *  - a provisioned-but-never-written bucket must query as EMPTY (its
  *    directory is created by the first append);
  *  - v1 aggregates over a field/measurement that does not (yet) exist
  *    must return empty results, not UNRESOLVED_COLUMN;
  *  - fieldsAsCols for a field-less measurement must not run a set
  *    operation on the raw tags MAP;
  *  - the Flux dialect over the STORE source (tags as a map) must
  *    resolve tag references like the reference's flattened table
  *    stream: r.<tag> filters, group/sort/distinct by tag;
  *  - StaleScan classifies rewrite races by cause chain and re-runs.
  */
class ServiceContentionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tsdb: Tsdb = {
    val t = Tsdb(spark, Files.createTempDirectory("graft-contention-spec").toString)
    t.catalog.createOrg("o")
    t.catalog.createBucket("written", "o")
    t.catalog.createBucket("neverwritten", "o")
    val t0 = 1705276800L * 1000000000L
    t.writeLp("written", (0 until 8).map(i =>
      s"cpu,host=h${i % 2},dc=dc${i % 3} usage=${i.toDouble} ${t0 + i * 60000000000L}"))
    t
  }

  // the HTTP query handler's source shape (HttpApi.scala), store-backed
  private def source: FluxEval.Source = FluxEval.Source(
    resolve = b => tsdb.from(b),
    rename = Map("_time" -> "time", "_value" -> "value_f",
      "_measurement" -> "measurement", "_field" -> "field"))

  private val range =
    """|> range(start: 2024-01-15T00:00:00Z, stop: 2024-01-16T00:00:00Z)"""

  test("a provisioned bucket with no writes queries as empty, not PATH_NOT_FOUND") {
    val df = FluxEval.run(
      s"""from(bucket: "neverwritten") $range |> count()""", source)
    assert(df.count() == 0L)
    // raw read path agrees
    assert(tsdb.store.readRaw("neverwritten").count() == 0L)
    // and v1 over the same bucket returns a result frame, not a throw
    val v1 = graft.influxql.InfluxQLEval.evalStmt(
      graft.influxql.InfluxQL.parse(
        "SELECT mean(usage) FROM cpu WHERE time >= '2024-01-15T00:00:00Z' GROUP BY time(1h)"),
      graft.influxql.InfluxQLEval.tsdbSource(tsdb, "neverwritten"))
    assert(v1.count() == 0L)
  }

  test("v1 aggregate over an unknown field yields empty/null, never UNRESOLVED_COLUMN") {
    val out = graft.influxql.InfluxQLEval.evalStmt(
      graft.influxql.InfluxQL.parse(
        "SELECT mean(nosuchfield) FROM cpu WHERE time >= '2024-01-15T00:00:00Z'"),
      graft.influxql.InfluxQLEval.tsdbSource(tsdb, "written"))
    // mean over nothing: either zero rows or a single null-mean row —
    // both encode v1's "no data", and neither is an AnalysisException
    assert(out.count() == 0L ||
      out.select("mean").collect().forall(_.isNullAt(0)))
  }

  test("fieldsAsCols on a field-less measurement dedups without map set ops") {
    val df = tsdb.fieldsAsCols("written", "nosuchmeasurement")
    assert(df.count() == 0L) // materializes — would throw UNSUPPORTED_FEATURE before
    assert(df.columns.contains("tags"))
  }

  test("Flux over the store source resolves tags as columns: filter by tag") {
    val df = FluxEval.run(
      s"""from(bucket: "written") $range
         ||> filter(fn: (r) => r._measurement == "cpu" and r.host == "h1")
         ||> count()""".stripMargin, source)
    val n = df.select("_value").as[Long].head()
    assert(n == 4L, s"host=h1 has 4 points, counted $n")
  }

  test("Flux group/sort/distinct by a tag name materialize the tag column") {
    val grouped = FluxEval.run(
      s"""from(bucket: "written") $range
         ||> filter(fn: (r) => r._measurement == "cpu")
         ||> group(columns: ["host"]) |> count()""".stripMargin, source)
    val counts = grouped.select("host", "_value").as[(String, Long)]
      .collect().toMap
    assert(counts == Map("h0" -> 4L, "h1" -> 4L), counts.toString)

    val distinctTags = FluxEval.run(
      s"""from(bucket: "written") $range
         ||> filter(fn: (r) => r._measurement == "cpu")
         ||> distinct(column: "dc") |> sort(columns: ["dc"])""".stripMargin, source)
    assert(distinctTags.select("dc").as[String].collect().toSeq ==
      Seq("dc0", "dc1", "dc2"))
  }

  test("Flux exists over a map tag is per-row tag presence") {
    val df = FluxEval.run(
      s"""from(bucket: "written") $range
         ||> filter(fn: (r) => exists r.host) |> count()""".stripMargin, source)
    assert(df.select("_value").as[Long].head() == 8L)
    val none = FluxEval.run(
      s"""from(bucket: "written") $range
         ||> filter(fn: (r) => exists r.nosuchtag) |> count()""".stripMargin, source)
    assert(none.count() == 0L)
  }

  test("StaleScan: classifies rewrite races by cause chain; retry re-runs") {
    import graft.store.StaleScan
    val wrapped = new RuntimeException("outer",
      new java.io.FileNotFoundException("part-0001.snappy.parquet"))
    assert(StaleScan.isStale(wrapped))
    assert(StaleScan.isStale(new RuntimeException(
      "[FAILED_READ_FILE.FILE_NOT_EXIST] Encountered error")))
    assert(!StaleScan.isStale(new RuntimeException("boom")))
    // cycle-proof walk
    val a = new RuntimeException("a"); assert(!StaleScan.isStale(a))

    var calls = 0
    val out = StaleScan.retry("spec", attempts = 3) {
      calls += 1
      if (calls < 3) throw new RuntimeException("x",
        new java.io.FileNotFoundException("gone"))
      42
    }
    assert(out == 42 && calls == 3)
    // a non-stale failure propagates immediately
    calls = 0
    intercept[IllegalArgumentException](StaleScan.retry("spec") {
      calls += 1; throw new IllegalArgumentException("real")
    })
    assert(calls == 1)
    // attempts exhausted -> the stale failure propagates
    intercept[RuntimeException](StaleScan.retry("spec", attempts = 1) {
      throw new RuntimeException("x", new java.io.FileNotFoundException("gone"))
    })
  }
}
