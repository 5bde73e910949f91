package graft.flux

import graft.SparkSpec
import graft.dsl.FluxFrame
import org.apache.spark.sql.functions._

/** Flux text front-end: parse golden queries + evaluate end-to-end on
  * a small frame, same results as the equivalent DSL calls.
  */
class FluxSpec extends SparkSpec {
  import spark.implicits._
  import FluxParser._

  test("parses a full pipeline with lambda, durations, arrays") {
    val p = FluxParser.parse(
      """from(bucket: "telemetry")
        |  // downsample cpu for one host
        |  |> range(start: 2024-01-08T00:00:00Z, stop: 2024-01-15T00:00:00Z)
        |  |> filter(fn: (r) => r._measurement == "cpu" and (r.host == "h1" or r.host == "h2"))
        |  |> aggregateWindow(every: 1h, fn: mean, createEmpty: true)
        |  |> keep(columns: ["_time", "_value"])
        |  |> limit(n: 10, offset: 2)
        |  |> yield(name: "out")""".stripMargin)
    assert(p.calls.map(_.verb) ==
      Seq("from", "range", "filter", "aggregateWindow", "keep", "limit", "yield"))
    assert(p.calls(1).args("start") == VTime("2024-01-08T00:00:00Z"))
    assert(p.calls(3).args("every") == VDur(1, "h"))
    assert(p.calls(3).args("createEmpty") == VBool(true))
    val VLambda(param, body) = p.calls(2).args("fn"): @unchecked
    assert(param == "r")
    assert(body == And(
      Cmp("==", ColRef("_measurement"), Lit(VStr("cpu"))),
      Or(Cmp("==", ColRef("host"), Lit(VStr("h1"))),
         Cmp("==", ColRef("host"), Lit(VStr("h2"))))))
  }

  test("parses regex match and rename records") {
    val p = FluxParser.parse(
      """from(bucket: "b") |> filter(fn: (r) => r.host =~ /^edge-[0-9]+$/)
        | |> rename(columns: {old: "new"})""".stripMargin)
    val VLambda(_, body) = p.calls(1).args("fn"): @unchecked
    assert(body == Cmp("=~", ColRef("host"), Regex("^edge-[0-9]+$")))
    assert(p.calls(2).args("columns") == VRec(Seq("old" -> VStr("new"))))
  }

  test("rejects malformed input with position info") {
    assertThrows[ParseException](FluxParser.parse("from(bucket: )"))
    assertThrows[ParseException](FluxParser.parse("""from(bucket: "b") |> |> mean()"""))
    assertThrows[ParseException](FluxParser.parse("""from(bucket: "b") trailing"""))
  }

  private def eventsFrame = {
    val rows = Seq(
      ("cpu", "h1", java.sql.Timestamp.valueOf("2024-01-08 00:10:00"), 1.0),
      ("cpu", "h1", java.sql.Timestamp.valueOf("2024-01-08 00:20:00"), 3.0),
      ("cpu", "h2", java.sql.Timestamp.valueOf("2024-01-08 00:15:00"), 10.0),
      ("mem", "h1", java.sql.Timestamp.valueOf("2024-01-08 00:05:00"), 99.0),
      ("cpu", "h1", java.sql.Timestamp.valueOf("2024-01-09 00:10:00"), 5.0))
      .toDF("measurement", "host", "ts", "value")
    FluxFrame(rows, Seq("measurement"), "ts", "value")
  }

  private val source = FluxEval.Source(
    resolve = _ => eventsFrame,
    rename = Map("_time" -> "ts", "_value" -> "value", "_measurement" -> "measurement"))

  test("evaluates range + filter + mean like the DSL") {
    val out = FluxEval.run(
      """from(bucket: "b")
        ||> range(start: 2024-01-08T00:00:00Z, stop: 2024-01-09T00:00:00Z)
        ||> filter(fn: (r) => r._measurement == "cpu" and r.host == "h1")
        ||> mean()""".stripMargin, source)
    assert(out.select("_value").as[Double].collect().toSeq == Seq(2.0))
  }

  test("keys() and columns() list group-key / table columns") {
    val ks = FluxEval.run("""from(bucket: "b") |> keys()""", source)
    assert(ks.as[String].collect().toSeq == Seq("_measurement"))
    val cs = FluxEval.run("""from(bucket: "b") |> columns()""", source)
    assert(cs.as[String].collect().toSeq.contains("_value"))
    assert(cs.as[String].collect().toSeq.contains("host"))
  }

  test("now-relative range: range(start: -1h) against a pinned clock") {
    // pin now() to 2024-01-08T01:00:00Z: -1h covers exactly the first
    // hour; stop defaults to now
    val pinned = source.copy(nowNs =
      () => java.time.Instant.parse("2024-01-08T01:00:00Z").getEpochSecond * 1000000000L)
    val out = FluxEval.run(
      """from(bucket: "b")
        ||> range(start: -1h)
        ||> filter(fn: (r) => r._measurement == "cpu")
        ||> count()""".stripMargin, pinned)
    assert(out.select("_value").as[Long].collect().toSeq == Seq(3L))
    // calendar units are rejected loudly, not approximated
    val e = intercept[FluxEval.EvalException] {
      FluxEval.run("""from(bucket: "b") |> range(start: -1mo) |> count()""", pinned)
    }
    assert(e.getMessage.contains("calendar"))
  }

  test("evaluates aggregateWindow + keep") {
    val out = FluxEval.run(
      """from(bucket: "b")
        ||> range(start: 2024-01-08T00:00:00Z, stop: 2024-01-09T00:00:00Z)
        ||> filter(fn: (r) => r._measurement == "cpu")
        ||> aggregateWindow(every: 1h, fn: sum)
        ||> keep(columns: ["_time", "_value"])""".stripMargin, source)
    assert(out.columns.toSeq == Seq("_time", "_value"))
    assert(out.as[(java.sql.Timestamp, Double)].collect().toMap
      .get(java.sql.Timestamp.valueOf("2024-01-08 01:00:00")).contains(14.0))
  }

  test("evaluates regex filter and derivative") {
    val out = FluxEval.run(
      """from(bucket: "b")
        ||> filter(fn: (r) => r.host =~ /^h1$/ and r._measurement == "cpu")
        ||> derivative(unit: 1m)""".stripMargin, source)
    // h1 cpu: (3-1)/(10min/1min)=0.2 ; (5-3)/(1450min)=~0.0014
    val vals = out.orderBy("ts").select("_value").as[Double].collect()
    assert(math.abs(vals(0) - 0.2) < 1e-12)
  }

  test("map(): record-with arithmetic, all fields see the original record") {
    val mapped = FluxEval.run(
      """from(bucket: "b")
        ||> filter(fn: (r) => r._measurement == "cpu" and r.host == "h1")
        ||> map(fn: (r) => ({ r with _value: r._value * 2.0 + 1.0, doubled: r._value * 2.0 }))""".stripMargin,
      source)
    // cpu h1 values 1,3,5: _value -> 3,7,11 and doubled -> 2,6,10
    // (doubled must use the ORIGINAL _value, not the rewritten one)
    val rows = mapped.orderBy("_time").select("_value", "doubled")
      .as[(Double, Double)].collect().toSeq
    assert(rows == Seq((3.0, 2.0), (7.0, 6.0), (11.0, 10.0)))
  }

  test("unsupported verb raises a clear error") {
    val e = intercept[FluxEval.EvalException](
      FluxEval.run("""from(bucket: "b") |> frobnicate(n: 1)""", source))
    assert(e.getMessage.contains("frobnicate"))
  }

  test("pivot(): long to wide in text form") {
    val out = FluxEval.run(
      """from(bucket: "b")
        ||> group(columns: ["host", "_measurement"])
        ||> max()
        ||> pivot(rowKey: ["host"], columnKey: ["_measurement"], valueColumn: "_value")""".stripMargin,
      source)
    val rows = out.orderBy("host").collect().map(r =>
      (r.getString(r.fieldIndex("host")),
        Option(r.get(r.fieldIndex("cpu"))), Option(r.get(r.fieldIndex("mem")))))
    assert(rows.toSeq == Seq(("h1", Some(5.0), Some(99.0)), ("h2", Some(10.0), None)))
  }

  test("join(): two table variables on a key") {
    val out = FluxEval.run(
      """a = from(bucket: "b")
        |  |> filter(fn: (r) => r._measurement == "cpu")
        |  |> group(columns: ["host"])
        |  |> max()
        |  |> rename(columns: {_value: "cpu_max"})
        |b = from(bucket: "b")
        |  |> filter(fn: (r) => r._measurement == "mem")
        |  |> group(columns: ["host"])
        |  |> max()
        |  |> rename(columns: {_value: "mem_max"})
        |join(tables: {c: a, m: b}, on: ["host"])""".stripMargin,
      source)
    val rows = out.select("host", "cpu_max", "mem_max").as[(String, Double, Double)].collect()
    assert(rows.toSeq == Seq(("h1", 5.0, 99.0))) // h2 has no mem rows -> inner join drops it
  }

  test("asofJoin(): latest right row at or before each left time") {
    val out = FluxEval.run(
      """a = from(bucket: "b") |> filter(fn: (r) => r._measurement == "cpu" and r.host == "h1")
        |b = from(bucket: "b") |> filter(fn: (r) => r._measurement == "mem")
        |  |> duplicate(column: "_value", as: "mem_v")
        |asofJoin(tables: {l: a, r: b}, on: ["host"], columns: ["mem_v"])""".stripMargin,
      source)
    // mem/h1 reading (99.0 @00:05) precedes every cpu/h1 row -> all carry it
    val vals = out.orderBy("_time").select("_value", "mem_v").as[(Double, Double)].collect()
    assert(vals.toSeq == Seq((1.0, 99.0), (3.0, 99.0), (5.0, 99.0)))
  }

  test("union(): bag union of table variables, piped further") {
    val out = FluxEval.run(
      """a = from(bucket: "b") |> filter(fn: (r) => r._measurement == "cpu")
        |b = from(bucket: "b") |> filter(fn: (r) => r._measurement == "mem")
        |union(tables: [a, b]) |> group(columns: ["_measurement"]) |> count()""".stripMargin,
      source)
    val rows = out.select("_measurement", "_value").as[(String, Long)].collect().toMap
    assert(rows == Map("cpu" -> 4L, "mem" -> 1L))
  }

  test("histogram + histogramQuantile in text form") {
    val out = FluxEval.run(
      """from(bucket: "b")
        ||> filter(fn: (r) => r._measurement == "cpu")
        ||> histogram(bins: [2.0, 4.0, 20.0])""".stripMargin,
      source)
    val rows = out.select("le", "_value").as[(Double, Long)].collect().toMap
    assert(rows == Map(2.0 -> 1L, 4.0 -> 2L, 20.0 -> 4L)) // cumulative
    val q = FluxEval.run(
      """from(bucket: "b")
        ||> filter(fn: (r) => r._measurement == "cpu")
        ||> histogram(bins: [2.0, 4.0, 20.0])
        ||> histogramQuantile(quantile: 0.5)""".stripMargin,
      source)
    val v = q.select("_value").as[Double].collect()
    assert(v.length == 1 && v(0) > 2.0 && v(0) <= 4.0)
  }

  test("highestAverage / lowestMin / covariance / interpolate text verbs") {
    val top = FluxEval.run(
      """from(bucket: "b") |> group(columns: ["_measurement", "host"]) |> highestAverage(n: 1)""",
      source)
    // mem/h1 has the highest per-series mean (99.0)
    assert(top.select("_measurement").as[String].collect().toSet == Set("mem"))
    val low = FluxEval.run(
      """from(bucket: "b") |> group(columns: ["_measurement", "host"]) |> lowestMin(n: 1)""",
      source)
    assert(low.select("_measurement", "host").as[(String, String)].collect().toSet
      == Set(("cpu", "h1"))) // series with the smallest value (1.0)
    val lowAvg = FluxEval.run(
      """from(bucket: "b") |> group(columns: ["_measurement", "host"]) |> lowestAverage(n: 1)""",
      source)
    assert(lowAvg.select("_measurement", "host").as[(String, String)].collect().toSet
      == Set(("cpu", "h1"))) // smallest per-series mean
    val lowCur = FluxEval.run(
      """from(bucket: "b") |> group(columns: ["_measurement", "host"]) |> lowestCurrent(n: 1)""",
      source)
    assert(lowCur.count() >= 1) // latest-value ranking, lowest side
    val cov = FluxEval.run(
      """from(bucket: "b")
        ||> filter(fn: (r) => r._measurement == "cpu")
        ||> covariance(columns: ["_value", "_value"], pearsonr: true)""".stripMargin,
      source)
    // corr(x, x) = 1 (single-row groups would be null, hence the filter)
    assert(cov.select("_value").as[Double].collect().forall(v => math.abs(v - 1.0) < 1e-12))
    val interp = FluxEval.run(
      """from(bucket: "b")
        ||> filter(fn: (r) => r._measurement == "cpu" and r.host == "h1")
        ||> range(start: 2024-01-08T00:00:00Z, stop: 2024-01-09T00:00:00Z)
        ||> interpolate(every: 5m)""".stripMargin, source)
    // 00:10 -> 00:20 at 1.0 -> 3.0: the 00:15 grid point interpolates to 2.0
    val vals = interp.orderBy("_time").select("_value").as[Double].collect().toSeq
    assert(vals == Seq(1.0, 2.0, 3.0))
  }

  test("aggregateWindow offset/location and window period/offset in text") {
    // Etc/GMT+2 wall clock: 00:10Z-00:20Z points are 22:10-22:20 LOCAL
    // of the PREVIOUS day, so the 1d bucket ends at local midnight =
    // 02:00Z — a label UTC bucketing could never produce
    val tz = FluxEval.run(
      """from(bucket: "b")
        ||> filter(fn: (r) => r._measurement == "cpu" and r.host == "h1")
        ||> aggregateWindow(every: 1d, fn: sum, location: timezone.location(name: "Etc/GMT+2"))""".stripMargin,
      source)
    val rows = tz.select(col("_time").cast("string"), col("_value"))
      .as[(String, Double)].collect().toSet
    assert(rows == Set(("2024-01-08 02:00:00", 4.0), ("2024-01-09 02:00:00", 5.0)))
    // offset 30m shifts the grid: 00:10 and 00:20 share the
    // [23:30, 00:30) bucket ending 00:30
    val off = FluxEval.run(
      """from(bucket: "b")
        ||> filter(fn: (r) => r._measurement == "cpu" and r.host == "h1")
        ||> aggregateWindow(every: 1h, offset: 30m, fn: sum)""".stripMargin,
      source)
      .select(col("_time").cast("string"), col("_value"))
      .as[(String, Double)].collect().toSet
    assert(off.contains(("2024-01-08 00:30:00", 4.0)))
    // window(): explicit period/offset reach the _start/_stop columns
    val w = FluxEval.run(
      """from(bucket: "b")
        ||> filter(fn: (r) => r._measurement == "cpu" and r.host == "h1")
        ||> window(every: 1h, offset: 30m)""".stripMargin,
      source)
    assert(w.select(col("_start").cast("string")).distinct()
      .as[String].collect().toSet == Set("2024-01-07 23:30:00", "2024-01-08 23:30:00"))
  }

  test("reduce(): multi-field accumulator fold per group") {
    val out = FluxEval.run(
      """from(bucket: "b")
        ||> reduce(fn: (r, accumulator) => ({ sum: accumulator.sum + r._value,
        |    n: accumulator.n + 1.0 }),
        |  identity: {sum: 0.0, n: 0.0})""".stripMargin,
      source)
    val rows = out.select("_measurement", "sum", "n").as[(String, Double, Double)]
      .collect().toSet
    assert(rows == Set(("cpu", 19.0, 4.0), ("mem", 99.0, 1.0)))
  }

  test("to(bucket:) text verb materializes a downsample a follow-up from() reads back") {
    val tsdb = graft.dsl.Tsdb(spark,
      java.nio.file.Files.createTempDirectory("graft-fluxto-spec").toString)
    tsdb.catalog.createBucket("telemetry", "o")
    tsdb.catalog.createBucket("downsampled", "o")
    val t0 = 1704672000L // 2024-01-08T00:00:00Z
    tsdb.writeLp("telemetry", Seq(
      s"cpu,host=h1 usage=2 ${t0 * 1000000000L}",
      s"cpu,host=h1 usage=4 ${(t0 + 1800) * 1000000000L}",
      s"cpu,host=h1 usage=6 ${(t0 + 3600) * 1000000000L}"))
    val src = FluxEval.Source(
      resolve = b => tsdb.from(b),
      rename = Map("_time" -> "time", "_value" -> "value_f",
        "_measurement" -> "measurement", "_field" -> "field"),
      write = Some((b, d) => tsdb.to(b, d)))
    // the canonical task body: downsample telemetry into a second bucket
    val through = FluxEval.run(
      """from(bucket: "telemetry")
        ||> range(start: 2024-01-08T00:00:00Z, stop: 2024-01-08T02:00:00Z)
        ||> aggregateWindow(every: 1h, fn: sum)
        ||> to(bucket: "downsampled")""".stripMargin, src)
    assert(through.count() == 2) // to() passes the table through
    val back = FluxEval.run("""from(bucket: "downsampled")""", src)
      .select(col("_time").cast("string"), col("_value"))
      .as[(String, Double)].collect().toSet
    assert(back == Set(("2024-01-08 01:00:00", 6.0), ("2024-01-08 02:00:00", 6.0)))
    // no write sink -> to() is a clean EvalException, not a crash
    assertThrows[FluxEval.EvalException](FluxEval.run(
      """from(bucket: "telemetry") |> to(bucket: "downsampled")""",
      src.copy(write = None)))
  }

  test("field-pinned filter types _value from the store schema (string/bool/int)") {
    val tsdb = graft.dsl.Tsdb(spark,
      java.nio.file.Files.createTempDirectory("graft-typedval-spec").toString)
    tsdb.catalog.createBucket("telemetry", "o")
    val t0 = 1704672000L * 1000000000L
    tsdb.writeLp("telemetry", Seq(
      s"""svc,host=h1 status="ok",up=true,conns=7i,usage=1.5 $t0""",
      s"""svc,host=h1 status="degraded",up=false,conns=9i,usage=2.5 ${t0 + 1000000000L}"""))
    val src = FluxEval.Source(
      resolve = b => tsdb.from(b),
      rename = Map("_time" -> "time", "_value" -> "value_f",
        "_measurement" -> "measurement", "_field" -> "field"),
      fieldType = (b, m, fld) => tsdb.store.fieldTypes(b, m).get(fld))
    def q(field: String) = FluxEval.run(
      s"""from(bucket: "telemetry")
         ||> filter(fn: (r) => r._measurement == "svc" and r._field == "$field")
         ||> sort(columns: ["_time"])""".stripMargin, src)
    val st = q("status")
    assert(st.schema("_value").dataType == org.apache.spark.sql.types.StringType)
    assert(st.select("_value").as[String].collect().toSeq == Seq("ok", "degraded"))
    val up = q("up")
    assert(up.schema("_value").dataType == org.apache.spark.sql.types.BooleanType)
    assert(up.select("_value").as[Boolean].collect().toSeq == Seq(true, false))
    val conns = q("conns")
    assert(conns.schema("_value").dataType == org.apache.spark.sql.types.LongType)
    assert(conns.select("_value").as[Long].collect().toSeq == Seq(7L, 9L))
    // float fields keep the numeric column; no fieldType hook → old path
    val usage = q("usage")
    assert(usage.schema("_value").dataType == org.apache.spark.sql.types.DoubleType)
    assert(usage.select("_value").as[Double].collect().toSeq == Seq(1.5, 2.5))
    val legacy = FluxEval.run(
      """from(bucket: "telemetry")
        ||> filter(fn: (r) => r._field == "status")""".stripMargin,
      src.copy(fieldType = (_, _, _) => None))
    assert(legacy.schema("_value").dataType == org.apache.spark.sql.types.DoubleType)
    // string _value flows through selectors and distinct
    val lastStatus = FluxEval.run(
      s"""from(bucket: "telemetry")
         ||> filter(fn: (r) => r._field == "status")
         ||> last()""".stripMargin, src)
    assert(lastStatus.select("_value").as[String].collect().toSeq == Seq("degraded"))
  }

  test("decompose/cusum/anomalies parse and evaluate through the text surface") {
    val eff = Array(3.0, -1.0, 0.5, -2.0, 1.5, -1.5, -0.5)
    val rows = (0 until 28).map(t => ("a", t.toLong, 10.0 + eff(t % 7)))
    val src = FluxEval.Source(
      resolve = _ => FluxFrame.of(rows.toDF("k", "t", "v"), "t", "v", "k"),
      rename = Map("_time" -> "t", "_value" -> "v", "_measurement" -> "k"))
    val d = FluxEval.run("""from(bucket: "b") |> decompose(period: 7)""", src)
    assert(d.columns.contains("trend") && d.columns.contains("seasonal"))
    assert(d.filter(col("resid").isNotNull).count() == 22)
    val c = FluxEval.run("""from(bucket: "b") |> cusum(threshold: 2.0)""", src)
    assert(c.columns.contains("alarm"))
    val a = FluxEval.run("""from(bucket: "b") |> anomalies(k: 2.5)""", src)
    assert(a.columns.contains("is_anom"))
    // TRIX on a constant series is exactly 0; ER on a monotone ramp is 1
    val const = (0 until 40).map(t => ("a", t.toLong, 5.0))
    val csrc = src.copy(resolve =
      _ => FluxFrame.of(const.toDF("k", "t", "v"), "t", "v", "k"))
    val tx = FluxEval.run("""from(bucket: "b") |> tripleExponentialDerivative(n: 5)""", csrc)
    assert(tx.count() > 0 &&
      tx.select("_value").as[Double].collect().forall(_ == 0.0))
    val ramp = (0 until 40).map(t => ("a", t.toLong, t.toDouble))
    val rsrc = src.copy(resolve =
      _ => FluxFrame.of(ramp.toDF("k", "t", "v"), "t", "v", "k"))
    val er = FluxEval.run("""from(bucket: "b") |> kaufmansER(n: 10)""", rsrc)
    assert(er.count() == 30 &&
      er.select("_value").as[Double].collect().forall(v => math.abs(v - 1.0) < 1e-12))
  }

  test("linearBins/logarithmicBins reduce to literal edges at parse time") {
    val p = FluxParser.parse(
      """from(bucket: "b") |> histogram(bins: linearBins(start: 0.0, width: 10.0, count: 3))""")
    val VArr(lin) = p.calls(1).args("bins"): @unchecked
    assert(lin == Seq(VNum(0.0), VNum(10.0), VNum(20.0), VNum(Double.PositiveInfinity)))
    val q = FluxParser.parse(
      """from(bucket: "b") |> histogram(bins: logarithmicBins(start: 1.0, factor: 2.0, count: 4, infinity: false))""")
    val VArr(log) = q.calls(1).args("bins"): @unchecked
    assert(log == Seq(VNum(1.0), VNum(2.0), VNum(4.0), VNum(8.0)))
  }

  test("exists parses and filters nulls; not exists inverts it") {
    val p = FluxParser.parse(
      """from(bucket: "b") |> filter(fn: (r) => exists r.error and not exists r.skip)""")
    val VLambda(_, body) = p.calls(1).args("fn"): @unchecked
    assert(body == And(Exists(ColRef("error")), Not(Exists(ColRef("skip")))))
    val df = Seq((1L, Option(2.0)), (2L, None), (3L, Option(5.0)))
      .toDF("id", "error")
    val out = FluxEval.run(
      """from(bucket: "t") |> filter(fn: (r) => exists r.error)""",
      FluxEval.Source(resolve = _ => FluxFrame(df, Nil, "id", "error")))
    assert(out.select("id").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("if/then/else parses in map bodies and compiles to a conditional rewrite") {
    val p = FluxParser.parse(
      """from(bucket: "b") |> map(fn: (r) => ({ r with _value: if r._value > 2.0 then r._value * 10.0 else 0.0 - r._value }))""")
    val VMapLambda(_, fields) = p.calls(1).args("fn"): @unchecked
    assert(fields.head._2 == Cond(
      Cmp(">", ColRef("_value"), Lit(VNum(2.0))),
      Arith("*", ColRef("_value"), Lit(VNum(10.0))),
      Arith("-", Lit(VNum(0.0)), ColRef("_value"))))
    val df = Seq((1L, 1.0), (2L, 3.0)).toDF("id", "_value")
    val out = FluxEval.run(
      """from(bucket: "t") |> map(fn: (r) => ({ r with _value: if r._value > 2.0 then r._value * 10.0 else 0.0 - r._value }))""",
      FluxEval.Source(resolve = _ => FluxFrame(df, Nil, "id", "_value")))
    assert(out.orderBy("id").select("_value").as[Double].collect().toSeq == Seq(-1.0, 30.0))
  }

  test("annotated CSV round-trips through parse: types, nulls, quoting") {
    val df = Seq(
      (1L, Option(2.5), "plain", Option(true)),
      (2L, None, "with,comma and \"quotes\"", Option(false)),
      (3L, Option(-0.0001), "line\nbreak", None))
      .toDF("n", "v", "s", "b")
      .withColumn("t", to_timestamp(lit("2024-01-15 12:34:56.789")))
    val csv = graft.service.AnnotatedCsv.format(df)
    val back = graft.service.AnnotatedCsv.parse(csv, spark)
    assert(back.schema == df.schema.copy(fields =
      df.schema.fields.map(_.copy(nullable = true))))
    assert(back.orderBy("n").collect().toSeq == df.orderBy("n").collect().toSeq)
  }

  test("csv.from evaluates an embedded annotated-CSV source and pipes on") {
    val df = Seq(("click", 10.0), ("view", 20.0), ("click", 30.0))
      .toDF("_measurement", "_value")
      .withColumn("_time", to_timestamp(lit("2024-01-15 00:00:00")))
    val csv = graft.service.AnnotatedCsv.format(df)
    val embedded = "\"" + csv.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val out = FluxEval.run(
      s"""import "csv"
         |csv.from(csv: $embedded)
         ||> filter(fn: (r) => r._measurement == "click")
         ||> sum()""".stripMargin,
      FluxEval.Source(resolve = _ => fail("csv.from must not resolve a bucket")))
    val got = out.select("_value").collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(40.0))
    // bookkeeping columns are consumed, not returned
    assert(!out.columns.contains("result") && !out.columns.contains("table"))
    // plan pin: an embedded csv source is a local relation — no file
    // scan, no bucket resolution sneaks into the plan
    assert(!out.queryExecution.executedPlan.toString.contains("FileScan"))
  }

  test("csv.from rejects CSV without a #datatype annotation") {
    assertThrows[FluxEval.EvalException](FluxEval.run(
      "csv.from(csv: \"a,b\r\n1,2\r\n\")",
      FluxEval.Source(resolve = _ => fail("unused"))))
  }

  test("csv.from(file:) is refused without a configured directory and jailed inside it") {
    // server surfaces leave csvDir unset: file: must not read ANY path
    val e = intercept[FluxEval.EvalException](FluxEval.run(
      """csv.from(file: "/etc/hostname")""",
      FluxEval.Source(resolve = _ => fail("unused"))))
    assert(e.getMessage.contains("not available"))
    // configured directory: plain names resolve inside it, escapes fail
    val dir = java.nio.file.Files.createTempDirectory("graft-csvdir")
    val df = Seq(("click", 4.0)).toDF("_measurement", "_value")
    java.nio.file.Files.writeString(dir.resolve("t.csv"),
      graft.service.AnnotatedCsv.format(df))
    val src = FluxEval.Source(resolve = _ => fail("unused"), csvDir = Some(dir))
    val out = FluxEval.run("""csv.from(file: "t.csv")""", src)
    assert(out.select("_value").as[Double].collect().toSeq == Seq(4.0))
    for (bad <- Seq("/etc/hostname", "../escape.csv", "a/../../etc/hostname")) {
      val esc = intercept[FluxEval.EvalException](
        FluxEval.run(s"""csv.from(file: "$bad")""", src))
      assert(esc.getMessage.contains("escapes") || esc.getMessage.contains("not available"))
    }
  }

  test("csv.from payload over the byte bound fails fast with a spark.read.csv pointer") {
    val small = spark.conf.getOption("spark.graft.csvFrom.maxBytes")
    spark.conf.set("spark.graft.csvFrom.maxBytes", "256")
    try {
      val df = Seq.tabulate(100)(i => ("m" + i, i.toDouble)).toDF("_measurement", "_value")
      val csv = graft.service.AnnotatedCsv.format(df)
      assert(csv.length > 256)
      val e = intercept[IllegalArgumentException](
        graft.service.AnnotatedCsv.parse(csv, spark))
      assert(e.getMessage.contains("spark.read.csv"))
      assert(e.getMessage.contains("spark.graft.csvFrom.maxBytes"))
    } finally small match {
      case Some(v) => spark.conf.set("spark.graft.csvFrom.maxBytes", v)
      case None => spark.conf.unset("spark.graft.csvFrom.maxBytes")
    }
  }

  test("csv.from applies #default values to empty cells") {
    val csv =
      "#datatype,string,long,string,double\r\n" +
        "#group,false,false,false,false\r\n" +
        "#default,_result,,fallback,9.5\r\n" +
        ",result,table,_measurement,_value\r\n" +
        ",,0,click,1.5\r\n" +
        ",,0,,\r\n"
    val out = graft.service.AnnotatedCsv.parse(csv, spark)
    val rows = out.orderBy("_value").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("click", "fallback"))
    assert(rows.map(_.getDouble(1)).toSeq == Seq(1.5, 9.5))
  }

  test("csv.from multi-table payloads: same-schema blocks union, mixed schemas reject") {
    // r16 replaced the blanket second-table rejection with result-set
    // map decode: same-schema blocks (one yield split across sections)
    // union into one frame …
    val one = graft.service.AnnotatedCsv.format(Seq(("a", 1.0)).toDF("_measurement", "_value"))
    assert(graft.service.AnnotatedCsv.parse(one + one, spark).count() == 2)
    // … and only genuinely ambiguous payloads (different schemas, no
    // result selection) still reject, pointing at the selection API
    val other = graft.service.AnnotatedCsv.format(
      Seq(("a", 7L, "x")).toDF("_measurement", "_value", "note"), resultName = "second")
    val e = intercept[IllegalArgumentException](
      graft.service.AnnotatedCsv.parse(one + other, spark))
    assert(e.getMessage.contains("result"))
  }

  test("exists on a column the frame never produced is false, not a plan error") {
    // no pivot column appears for a measurement absent from the range —
    // Flux's `exists` must then drop rows, not throw AnalysisException
    val out = FluxEval.run(
      """from(bucket: "b")
        ||> filter(fn: (r) => exists r.no_such_column)
        ||> count()""".stripMargin, source)
    // every row drops → the grouped count yields an EMPTY result (not
    // an error): the data-dependent Flux behavior the advice pinned
    assert(out.collect().isEmpty)
  }

  test("named user functions inline into map and filter bodies") {
    // the stdlib user-extension idiom: define once, apply via named args
    val out = FluxEval.run(
      """double = (x) => x * 2.0
        |shift = (v, by) => v + by
        |from(bucket: "b")
        ||> filter(fn: (r) => r._measurement == "cpu")
        ||> map(fn: (r) => ({ r with _value: shift(v: double(x: r._value), by: 1.0) }))
        ||> sum()""".stripMargin, source)
    // cpu values 1,3,10,5 → 2x+1 each → 3+7+21+11 = 42
    assert(out.select("_value").as[Double].collect().toSeq == Seq(42.0))
  }

  test("named functions support conditionals and nested calls") {
    val out = FluxEval.run(
      """clamp = (x) => if x > 5.0 then 5.0 else x
        |boost = (x) => clamp(x: x) * 10.0
        |from(bucket: "b")
        ||> filter(fn: (r) => r._measurement == "cpu")
        ||> map(fn: (r) => ({ r with _value: boost(x: r._value) }))
        ||> sum()""".stripMargin, source)
    // 1,3,10,5 → clamp → 1,3,5,5 → ×10 → 140
    assert(out.select("_value").as[Double].collect().toSeq == Seq(140.0))
  }

  test("a call missing a required argument fails at parse time") {
    val e = intercept[ParseException](FluxParser.parseProgram(
      """f = (x, y) => x + y
        |from(bucket: "b") |> map(fn: (r) => ({ r with _value: f(x: r._value) }))""".stripMargin))
    assert(e.getMessage.contains("missing argument"))
  }

  test("compound durations parse to exact ns and drive windows") {
    val p = FluxParser.parse("""from(bucket: "b") |> aggregateWindow(every: 1m30s, fn: sum)""")
    assert(p.calls(1).args("every") == VDur(90L * 1000000000L, "ns"))
    val neg = FluxParser.parse("""from(bucket: "b") |> timeShift(duration: -1h30m)""")
    assert(neg.calls(1).args("duration") == VDur(-5400L * 1000000000L, "ns"))
    // calendar units cannot compound
    assertThrows[ParseException](
      FluxParser.parse("""from(bucket: "b") |> range(start: -1mo10d)"""))
    // end-to-end: 90-minute windows over the first day of cpu data
    val out = FluxEval.run(
      """from(bucket: "b")
        ||> range(start: 2024-01-08T00:00:00Z, stop: 2024-01-09T00:00:00Z)
        ||> filter(fn: (r) => r._measurement == "cpu")
        ||> aggregateWindow(every: 1h30m, fn: sum)""".stripMargin, source)
    // all three day-1 cpu points land in the single 00:00–01:30 window
    assert(out.select("_value").as[Double].collect().toSeq == Seq(14.0))
  }

  test("reduce conditionals can reference the accumulator") {
    val out = FluxEval.run(
      """from(bucket: "b")
        ||> filter(fn: (r) => r._measurement == "cpu")
        ||> reduce(fn: (r, accumulator) => ({
        |      n: accumulator.n + 1.0,
        |      first: if accumulator.n == 0.0 then r._value else accumulator.first }),
        |    identity: {n: 0.0, first: 0.0})""".stripMargin, source)
    val row = out.select("n", "first").collect().head
    assert(row.getDouble(0) == 4.0)
    assert(row.getDouble(1) == 1.0) // the first cpu row's value
  }

  test("sessionize text form assigns per-series gap sessions") {
    val out = FluxEval.run(
      """from(bucket: "b")
        ||> filter(fn: (r) => r._measurement == "cpu" and r.host == "h1")
        ||> sessionize(maxGap: 1h)""".stripMargin, source)
    // h1 cpu at 00:10, 00:20 (same session), next day (new session)
    val sess = out.orderBy("_time").select("session").collect().map(_.getLong(0)).toSeq
    assert(sess == Seq(1L, 1L, 2L))
  }

  test("timeWeightedAvg text form equals the DSL verb") {
    val viaText = FluxEval.run(
      """from(bucket: "b")
        ||> filter(fn: (r) => r._measurement == "cpu")
        ||> timeWeightedAvg(unit: 1m)""".stripMargin, source)
      .select("_value").collect().head.getDouble(0)
    val viaDsl = eventsFrame.where(col("measurement") === "cpu")
      .timeWeightedAvg(60, as = "twa").toDF
      .select("twa").collect().head.getDouble(0)
    assert(viaText == viaDsl)
  }

  test("quantile method: estimate_tdigest routes to the KLL sketch") {
    // small group + k=1024 ⇒ sketch is in exact mode: the estimate is
    // the ceil(q·n)-th smallest (disc), unlike exact_mean's interpolation
    val est = FluxEval.run(
      """from(bucket: "b")
        ||> filter(fn: (r) => r._measurement == "cpu")
        ||> quantile(q: 0.5, method: "estimate_tdigest")""".stripMargin, source)
      .select("_value").collect().head.getDouble(0)
    assert(est == 3.0) // cpu values {1,3,5,10}: rank ceil(0.5*4)=2 → 3.0
    val exact = FluxEval.run(
      """from(bucket: "b")
        ||> filter(fn: (r) => r._measurement == "cpu")
        ||> quantile(q: 0.5)""".stripMargin, source)
      .select("_value").collect().head.getDouble(0)
    assert(exact == 4.0) // interpolated median of {1,3,5,10}
  }

  test("multi-yield: result-set eval, per-result CSV emission, parseResults round-trip") {
    val script =
      """a = from(bucket: "b")
        |  |> range(start: 2024-01-08T00:00:00Z, stop: 2024-01-10T00:00:00Z)
        |  |> filter(fn: (r) => r._measurement == "cpu")
        |a |> mean() |> yield(name: "avg")
        |a |> count() |> yield(name: "n")""".stripMargin
    val results = FluxEval.runAll(script, source)
    assert(results.map(_._1) == Seq("avg", "n"))
    assert(results.head._2.select("_value").as[Double].collect().toSeq ==
      Seq((1.0 + 3.0 + 10.0 + 5.0) / 4))
    assert(results(1)._2.select("_value").as[Long].collect().toSeq == Seq(4L))

    // EMISSION parity: the HTTP surface writes one annotated-CSV section
    // per result, #default'ed to the yield name — parseResults must
    // decode the exact result-set map back (the 2.0.9 response shape)
    val sb = new java.lang.StringBuilder
    results.foreach { case (n, df) =>
      graft.service.AnnotatedCsv.write(df, sb, resultName = n)
    }
    val back = graft.service.AnnotatedCsv.parseResults(sb.toString, spark)
    assert(back.map(_._1) == Seq("avg", "n"))
    assert(back.head._2.select("_value").as[Double].collect().toSeq ==
      results.head._2.select("_value").as[Double].collect().toSeq)
    assert(back(1)._2.select("_value").as[Long].collect().toSeq == Seq(4L))

    // an unnamed yield is `_result`; duplicate names reject loudly
    val unnamed = FluxEval.runAll(
      """from(bucket: "b") |> count()""", source)
    assert(unnamed.map(_._1) == Seq("_result"))
    val dup = intercept[FluxEval.EvalException](FluxEval.runAll(
      """from(bucket: "b") |> count() |> yield(name: "x")
        |from(bucket: "b") |> mean() |> yield(name: "x")""".stripMargin, source))
    assert(dup.msg.contains("duplicate yield name"))
    // the single-result surface refuses a multi-result script
    val multi = intercept[FluxEval.EvalException](FluxEval.run(script, source))
    assert(multi.msg.contains("single-result surface"))
  }

  test("multi-yield fuzz: random script shapes encode∘decode to the same result map") {
    val aggs = Seq("mean" -> "double", "count" -> "long", "sum" -> "double",
      "min" -> "double", "max" -> "double")
    val rng = new scala.util.Random(1712L)
    (0 until 15).foreach { trial =>
      val k = 2 + rng.nextInt(3)
      val picks = Seq.fill(k)(aggs(rng.nextInt(aggs.size)))
      val names = picks.zipWithIndex.map { case (_, i) => s"r${trial}_$i" }
      val script = "a = from(bucket: \"b\")\n" +
        "  |> range(start: 2024-01-08T00:00:00Z, stop: 2024-01-10T00:00:00Z)\n" +
        picks.zip(names).map { case ((fn, _), nm) =>
          s"""a |> $fn() |> yield(name: "$nm")"""
        }.mkString("\n")
      val results = FluxEval.runAll(script, source)
      assert(results.map(_._1) == names, s"trial $trial: names/order diverged")
      val sb = new java.lang.StringBuilder
      results.foreach { case (n, df) =>
        graft.service.AnnotatedCsv.write(df, sb, resultName = n)
      }
      val back = graft.service.AnnotatedCsv.parseResults(sb.toString, spark)
      assert(back.map(_._1) == names, s"trial $trial: decoded names diverged")
      results.zip(back).foreach { case ((nm, df), (_, dec)) =>
        val want = df.select("_value").collect().map(_.get(0)).toSeq
        val got = dec.select("_value").collect().map(_.get(0)).toSeq
        assert(got == want, s"trial $trial/$nm: $got != $want")
      }
    }
  }
}
