package graft.flux

import graft.SparkSpec
import graft.dsl.FluxFrame
import org.apache.spark.sql.functions._

/** Flux stdlib scalar calls inside text-surface lambda bodies
  * (math.* / strings.* / regexp.* / date.* / type conversions) and the
  * aggregateWindow(fn:) verb matrix — the two r13 text/DSL asymmetries.
  * Every translation must land on the same codegen'd Spark built-in the
  * DSL would use, so each test pins text output against the equivalent
  * DataFrame expression.
  */
class FluxStdlibSpec extends SparkSpec {
  import spark.implicits._

  private def frame = {
    val rows = Seq(
      ("cpu", "h1 ", java.sql.Timestamp.valueOf("2024-01-08 01:10:30"), 4.0),
      ("cpu", " h2", java.sql.Timestamp.valueOf("2024-01-08 07:20:00"), 9.0),
      ("cpu", "h1 ", java.sql.Timestamp.valueOf("2024-01-08 13:15:45"), 16.0),
      ("mem", "edge-7", java.sql.Timestamp.valueOf("2024-01-09 00:05:00"), 25.5),
      ("cpu", "h1 ", java.sql.Timestamp.valueOf("2024-01-09 18:10:00"), -2.5))
      .toDF("measurement", "host", "ts", "value")
    FluxFrame(rows, Seq("measurement"), "ts", "value")
  }

  private val source = FluxEval.Source(
    resolve = _ => frame,
    rename = Map("_time" -> "ts", "_value" -> "value", "_measurement" -> "measurement"))

  private def run(q: String) = FluxEval.run(q, source)

  test("math package calls translate to Spark built-ins") {
    val out = run(
      """from(bucket: "b")
        ||> map(fn: (r) => ({ r with s: math.sqrt(x: math.abs(x: r._value)), p: math.pow(x: r._value, y: 2.0), fl: math.floor(x: r._value), rd: math.round(x: r._value), tr: math.trunc(x: r._value), mx: math.mMax(x: r._value, y: 10.0), l2: math.log2(x: math.abs(x: r._value) + 1.0) }))""".stripMargin)
      .select("_value", "s", "p", "fl", "rd", "tr", "mx", "l2")
      .orderBy("_value").collect()
    val neg = out.head // _value = -2.5
    assert(neg.getDouble(1) == math.sqrt(2.5))
    assert(neg.getDouble(2) == 6.25)
    assert(neg.getDouble(3) == -3.0) // floor
    assert(neg.getDouble(4) == -3.0) // round: half away from zero
    assert(neg.getDouble(5) == -2.0) // trunc: toward zero
    assert(neg.getDouble(6) == 10.0) // mMax
    val v16 = out(3)
    assert(v16.getDouble(1) == 4.0 && v16.getDouble(2) == 256.0)
    assert(v16.getDouble(7) == math.log(17.0) / math.log(2.0))
  }

  test("strings package calls translate to Spark built-ins") {
    val out = run(
      """from(bucket: "b")
        ||> map(fn: (r) => ({ r with up: strings.toUpper(v: r.host), t: strings.trimSpace(v: r.host), pre: strings.substring(v: r._measurement, start: 0, end: 2), rep: strings.replaceAll(v: r._measurement, t: "c", u: "k"), n: strings.strlen(v: r.host), hp: strings.hasPrefix(v: r.host, prefix: "h"), ix: strings.index(v: r._measurement, substr: "pu") }))""".stripMargin)
      .select("host", "up", "t", "pre", "rep", "n", "hp", "ix")
      .where(col("host") === "h1 ").limit(1).collect().head
    assert(out.getString(1) == "H1 ")
    assert(out.getString(2) == "h1")
    assert(out.getString(3) == "cp")
    assert(out.getString(4) == "kpu")
    assert(out.getLong(5) == 3L)
    assert(out.getBoolean(6))
    assert(out.getLong(7) == 1L) // "cpu".indexOf("pu") == 1
  }

  test("regexp package and string predicates work in filter()") {
    val out = run(
      """from(bucket: "b")
        ||> filter(fn: (r) => regexp.matchRegexpString(r: /^edge-[0-9]+$/, v: strings.trimSpace(v: r.host)))
        ||> count()""".stripMargin).collect()
    assert(out.map(r => (r.getAs[String]("_measurement"), r.getAs[Long]("_value"))).toSeq
      == Seq(("mem", 1L)))
  }

  test("date package and type conversions round-trip") {
    val out = run(
      """from(bucket: "b")
        ||> filter(fn: (r) => r._measurement == "mem")
        ||> map(fn: (r) => ({ r with hh: date.hour(t: r._time), wd: date.weekDay(t: r._time), vi: int(v: r._value), tns: int(v: r._time), t2: time(v: int(v: r._time)), fs: string(v: r._value), bb: bool(v: "true"), day: date.truncate(t: r._time, unit: 1d) }))""".stripMargin)
      .select("hh", "wd", "vi", "tns", "t2", "fs", "bb", "day", "_time").collect().head
    assert(out.getLong(0) == 0L)
    // 2024-01-09 is a Tuesday: Flux weekDay Sunday=0 → 2
    assert(out.getLong(1) == 2L)
    assert(out.getLong(2) == 25L) // int(v: 25.5) truncates
    assert(out.getLong(3) == out.getTimestamp(8).getTime * 1000000L)
    assert(out.getTimestamp(4) == out.getTimestamp(8)) // ns → time round-trip
    assert(out.getString(5) == "25.5")
    assert(out.getBoolean(6))
    assert(out.getTimestamp(7) == java.sql.Timestamp.valueOf("2024-01-09 00:00:00"))
  }

  test("contains(value:, set:) filters by membership; non-literal set refuses") {
    val out = run(
      """from(bucket: "b")
        ||> filter(fn: (r) => contains(value: r._measurement, set: ["cpu"]))
        ||> count()""".stripMargin).collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("cpu", 4L)))
    val ex = intercept[FluxEval.EvalException](run(
      """from(bucket: "b") |> filter(fn: (r) => contains(value: r.host, set: r._value))""".stripMargin))
    assert(ex.getMessage.contains("'set:' must be an array literal"))
  }

  test("aggregate column: argument re-points the value column, unknown names refuse") {
    val out = run(
      """from(bucket: "b")
        ||> map(fn: (r) => ({ r with doubled: r._value * 2.0 }))
        ||> sum(column: "doubled")""".stripMargin)
      .where(col("_measurement") === "cpu").collect()
    assert(out.head.getAs[Double]("doubled") == 2 * (4.0 + 9.0 + 16.0 - 2.5))
    val ex = intercept[FluxEval.EvalException](run(
      """from(bucket: "b") |> mean(column: "nope")""").collect())
    assert(ex.getMessage.contains("'nope' does not exist"))
  }

  test("contains() pushes down to the parquet scan as an IN filter") {
    val dir = java.nio.file.Files.createTempDirectory("flux-pd").toString
    frame.df.write.mode("overwrite").parquet(dir)
    val pq = spark.read.parquet(dir)
    val src = FluxEval.Source(
      resolve = _ => graft.dsl.FluxFrame(pq, Seq("measurement"), "ts", "value"),
      rename = Map("_time" -> "ts", "_value" -> "value", "_measurement" -> "measurement"))
    val out = FluxEval.run(
      """from(bucket: "b")
        ||> filter(fn: (r) => contains(value: r._measurement, set: ["cpu", "disk"]) and r._value > 2.0)""".stripMargin,
      src)
    val plan = out.queryExecution.executedPlan.toString
    // (a single-element set folds to EqualTo before pushdown — also
    // pushed; two elements keep the genuine In)
    assert(plan.contains("PushedFilters") &&
      plan.contains("In(measurement") && plan.contains("GreaterThan(value"),
      s"IN + > must reach the scan:\n$plan")
  }

  test("time arithmetic via conversions: shift _time by a duration in map()") {
    // the dashboard idiom: int(v: r._time) + ns, back through time()
    val out = run(
      """from(bucket: "b")
        ||> filter(fn: (r) => r._measurement == "mem")
        ||> map(fn: (r) => ({ r with _time: time(v: int(v: r._time) + 3600000000000.0) }))""".stripMargin)
      .select("_time").collect().head.getTimestamp(0)
    assert(out == java.sql.Timestamp.valueOf("2024-01-09 01:05:00"))
  }

  test("grammar corners: nested calls across comparisons, division after a call") {
    // nested calls on BOTH comparison sides, arithmetic over call
    // results, and a '/' that must parse as division (not a regex)
    val out = run(
      """from(bucket: "b")
        ||> filter(fn: (r) => math.pow(x: math.abs(x: r._value), y: 2.0) / 2.0 > strings.strlen(v: strings.trimSpace(v: r.host)) * 10.0)
        ||> count()""".stripMargin).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // |v|^2/2 > 10*len(trim(host)): cpu hosts len 2 → cut 20: 4²/2=8 no,
    // 9²/2=40.5 yes, 16²/2=128 yes, 2.5²/2=3.1 no; mem len 6 → cut 60:
    // 25.5²/2=325 yes
    assert(out == Map("cpu" -> 2L, "mem" -> 1L))
    // regex literal still parses where an expression starts
    val rx = run(
      """from(bucket: "b")
        ||> filter(fn: (r) => strings.trimSpace(v: r.host) =~ /^h[0-9]$/ and math.sqrt(x: r._value) / 2.0 < 2.0)
        ||> count()""".stripMargin).collect()
    assert(rx.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("cpu", 2L)))
  }

  test("unknown stdlib function fails loudly at eval, not silently") {
    val ex = intercept[FluxEval.EvalException](run(
      """from(bucket: "b")
        ||> map(fn: (r) => ({ r with v: strings.title(v: r.host) }))""".stripMargin))
    assert(ex.getMessage.contains("unsupported function 'strings.title"))
    val ex2 = intercept[FluxEval.EvalException](run(
      """from(bucket: "b") |> filter(fn: (r) => math.frob(x: r._value) > 0.0)""".stripMargin))
    assert(ex2.getMessage.contains("unsupported function 'math.frob"))
  }

  test("aggregateWindow fn matrix: first/last/mode/spread/quantile match DSL verbs") {
    def text(fn: String) = run(
      s"""from(bucket: "b")
         ||> filter(fn: (r) => r._measurement == "cpu")
         ||> aggregateWindow(every: 1d, fn: $fn)""".stripMargin)
      .select("_time", "_value").orderBy("_time").collect().toSeq
    def dsl(f: FluxFrame => FluxFrame) =
      f(frame.where(col("measurement") === "cpu").window("1 day"))
        .toDF.withColumn("_time", col("_stop"))
        .select("_time", "_value").orderBy("_time").collect().toSeq

    // window() + agg vs aggregateWindow label conventions both use the
    // window END as the time label, so rows align 1:1
    assert(text("first").map(_.getDouble(1)) == Seq(4.0, -2.5))
    assert(text("last").map(_.getDouble(1)) == Seq(16.0, -2.5))
    assert(text("spread").map(_.getDouble(1)) == Seq(12.0, 0.0))
    assert(text("mode").map(_.getDouble(1)) == dsl(_.modeV()).map(_.getDouble(1)))
    assert(text("quantile, q: 0.5").map(_.getDouble(1)) ==
      dsl(_.quantile(0.5)).map(_.getDouble(1)))
    // sketch path parses and yields one row per window
    assert(text("quantile, q: 0.5, method: \"estimate_tdigest\"").size == 2)
  }

  test("join.time aligns a differently-named right time column (r13 ADVICE)") {
    val left = frame
    val rightDf = Seq(
      ("h1 ", java.sql.Timestamp.valueOf("2024-01-08 01:10:30"), 100.0),
      ("h1 ", java.sql.Timestamp.valueOf("2024-01-08 13:15:45"), 200.0))
      .toDF("host", "rts", "score")
    val right = FluxFrame(rightDf, Seq("host"), "rts", "score")
    val env = FluxEval.Source(
      resolve = b => if (b == "l") left else right,
      rename = Map.empty)
    val out = FluxEval.run(
      """a = from(bucket: "l")
        |b = from(bucket: "r")
        |join.time(left: a, right: b, on: (l, r) => l.host == r.host)""".stripMargin,
      FluxEval.Source(resolve = b => if (b == "l") left else right))
    assert(out.count() == 2)
    assert(out.columns.contains("score"))
    // the join keyed on (host, time): only the two matching instants
    assert(out.select(sum(col("score"))).collect().head.getDouble(0) == 300.0)
  }

  test("join.full rejects the unimplemented as: merge loudly") {
    val ex = intercept[FluxEval.EvalException](FluxEval.run(
      """a = from(bucket: "b")
        |b = from(bucket: "b")
        |join.full(left: a, right: b, on: (l, r) => l.host == r.host, as: (l, r) => l.value == r.value)""".stripMargin,
      source))
    assert(ex.getMessage.contains("join.full(as:)"))
  }

  test("to() statuses fold requires BOTH _level and _check_name (r13 ADVICE)") {
    // a user pipeline that coincidentally computes a `_level` column
    // must NOT have it folded into tags on write
    var written: org.apache.spark.sql.DataFrame = null
    val sink = source.copy(write = Some((_, df) => written = df))
    FluxEval.run(
      """from(bucket: "b")
        ||> map(fn: (r) => ({ r with _level: if r._value > 10.0 then "hi" else "lo" }))
        ||> to(bucket: "out")""".stripMargin, sink)
    assert(written != null && written.columns.contains("_level"),
      "coincidental _level column must survive to() unfolded")
    // real monitor.check output (has _level AND _check_name) still folds
    var folded: org.apache.spark.sql.DataFrame = null
    val sink2 = source.copy(write = Some((_, df) => folded = df))
    FluxEval.run(
      """from(bucket: "b")
        ||> monitor.check(crit: (r) => r._value > 10.0, data: {_check_name: "c"})
        ||> to(bucket: "out")""".stripMargin, sink2)
    assert(folded != null && !folded.columns.contains("_level") &&
      folded.columns.contains("tags"))
  }
}
