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
    assert(s.from == FromMeasurements(Seq("cpu")))
    assert(s.groupTime.contains(Dur(10, "m")) && s.groupTags == Seq("host"))
    assert(s.fill == FillValue(0.0) && s.orderDesc)
    assert(s.limit.contains(10) && s.offset.contains(2))
    val w = s.where.get.asInstanceOf[CAnd]
    assert(w.r == CCmp("=", "host", LStr("h1")))
  }

  test("parses SHOW statements and quoted identifiers") {
    assert(InfluxQL.parse("SHOW MEASUREMENTS") == ShowMeasurements())
    assert(InfluxQL.parse("SHOW MEASUREMENTS WITH MEASUREMENT =~ /^cpu/ LIMIT 5 OFFSET 1") ==
      ShowMeasurements(Some("^cpu"), Some(5), Some(1)))
    assert(InfluxQL.parse("SHOW MEASUREMENTS WITH MEASUREMENT = cpu") ==
      ShowMeasurements(Some("^\\Qcpu\\E$"), None, None))
    assert(InfluxQL.parse("SHOW TAG KEYS FROM cpu") == ShowTagKeys(Some("cpu")))
    assert(InfluxQL.parse("SHOW FIELD KEYS") == ShowFieldKeys(None))
    val s = InfluxQL.parse("""SELECT mean("usage user") FROM "my cpu"""")
      .asInstanceOf[Select]
    assert(s.projs == Seq(AggProj("mean", "usage user", None, None)) &&
      s.from == FromMeasurements(Seq("my cpu")))
  }

  test("rejects malformed input with position info") {
    assertThrows[ParseException](InfluxQL.parse("SELECT FROM cpu"))
    assertThrows[ParseException](InfluxQL.parse("SELECT mean(v) FROM cpu trailing"))
  }

  test("parses SHOW TAG VALUES, FROM lists, regexes and subqueries") {
    assert(InfluxQL.parse("""SHOW TAG VALUES FROM cpu WITH KEY = "host"""") ==
      ShowTagValues(Some("cpu"), KeyEq("host"), None))
    val stv = InfluxQL.parse(
      """SHOW TAG VALUES WITH KEY = "host" WHERE region = 'us'""")
      .asInstanceOf[ShowTagValues]
    assert(stv.from.isEmpty && stv.key == KeyEq("host") && stv.where.isDefined)
    assert(InfluxQL.parse(
      """SHOW TAG VALUES FROM cpu WITH KEY IN ("host", "region") LIMIT 5 OFFSET 2""") ==
      ShowTagValues(Some("cpu"), KeyIn(Seq("host", "region")), None, Some(5), Some(2)))
    assert(InfluxQL.parse("SHOW TAG VALUES WITH KEY =~ /^h/") ==
      ShowTagValues(None, KeyRegex("^h", negated = false), None))
    assert(InfluxQL.parse("SHOW TAG VALUES WITH KEY !~ /id$/ LIMIT 3") ==
      ShowTagValues(None, KeyRegex("id$", negated = true), None, Some(3)))
    assert(InfluxQL.parse("SHOW TAG KEY CARDINALITY") == ShowTagKeyCardinality(None))
    assert(InfluxQL.parse("SHOW FIELD KEY CARDINALITY ON db2") ==
      ShowFieldKeyCardinality(Some("db2")))
    assert(InfluxQL.parse("SHOW SERIES CARDINALITY ON db2") ==
      ShowSeriesCardinality(Some("db2")))
    assert(InfluxQL.parse("SELECT mean(v) FROM a, b").asInstanceOf[Select].from ==
      FromMeasurements(Seq("a", "b")))
    assert(InfluxQL.parse("SELECT mean(v) FROM /cpu.*/").asInstanceOf[Select].from ==
      FromRegex("cpu.*"))
    val sub = InfluxQL.parse(
      "SELECT max(v) FROM (SELECT mean(value) AS v FROM cpu GROUP BY time(1h))")
      .asInstanceOf[Select]
    val inner = sub.from.asInstanceOf[FromSelect].inner
    assert(inner.groupTime.contains(Dur(1, "h")) &&
      inner.from == FromMeasurements(Seq("cpu")))
    // WHERE tag =~ /regex/ (slash-delimited, the v1 syntax)
    val re = InfluxQL.parse("SELECT v FROM cpu WHERE host =~ /h[12]/")
      .asInstanceOf[Select]
    assert(re.where.contains(CCmp("=~", "host", LStr("h[12]"))))
  }

  test("numeric literals: exponents accepted, malformed rejected as parse errors") {
    val s = InfluxQL.parse(
      "SELECT v FROM m WHERE x > 1e9 AND y < 2.5E-3 AND z = -4.25")
      .asInstanceOf[Select]
    val cs = { def flat(c: Cond): Seq[Cond] = c match {
      case CAnd(l, r) => flat(l) ++ flat(r); case o => Seq(o) }
      flat(s.where.get) }
    assert(cs == Seq(CCmp(">", "x", LNum(1e9)), CCmp("<", "y", LNum(2.5e-3)),
      CCmp("=", "z", LNum(-4.25))))
    assertThrows[ParseException](InfluxQL.parse("SELECT v FROM m WHERE x > 1.2.3"))
    assertThrows[ParseException](InfluxQL.parse("SELECT v FROM m WHERE x > 1..2"))
    assertThrows[ParseException](InfluxQL.parse("SELECT v FROM m LIMIT 1.2.3"))
    // duration literals bind to time only; v1 rejects `value > 10m`
    // rather than silently reading it as 600e9 ns
    assertThrows[ParseException](InfluxQL.parse("SELECT v FROM m WHERE value > 10m"))
    assert(InfluxQL.parse(s"SELECT v FROM m WHERE time >= 1705276800000ms")
      .asInstanceOf[Select].where.get ==
      CCmp(">=", "time", LInt(1705276800000L * 1000000L)))
  }

  test("numeric literal scanner round-trips arbitrary Long/Double text (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val params = Gen.Parameters.default
    var seed = Seed(7L)
    def next[A](g: Gen[A]): A = { val v = g.pureApply(params, seed); seed = seed.next; v }
    (1 to 200).foreach { _ =>
      val l = next(Gen.chooseNum(Long.MinValue + 1, Long.MaxValue))
      val s = InfluxQL.parse(s"SELECT v FROM m WHERE x = $l").asInstanceOf[Select]
      assert(s.where.contains(CCmp("=", "x", LInt(l)))) // Long-exact, no Double round-trip
    }
    (1 to 200).foreach { _ =>
      val d = next(Gen.chooseNum(-1e12, 1e12))
      val s = InfluxQL.parse(s"SELECT v FROM m WHERE x = $d").asInstanceOf[Select]
      assert(s.where.contains(CCmp("=", "x", LNum(d)))) // toString → toDouble is exact
    }
  }

  test("arithmetic precedence round-trips random expression trees (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val params = Gen.Parameters.default
    var seed = Seed(11L)
    def next[A](g: Gen[A]): A = { val v = g.pureApply(params, seed); seed = seed.next; v }
    val ops = Seq('+', '-', '*', '/')
    def prec(op: Char) = if (op == '*' || op == '/') 2 else 1
    def gen(depth: Int): PExpr =
      if (depth == 0 || next(Gen.chooseNum(0, 2)) == 0)
        PNum(next(Gen.chooseNum(1, 9)).toDouble)
      else PBin(ops(next(Gen.chooseNum(0, 3))), gen(depth - 1), gen(depth - 1))
    // minimal-parens renderer: parenthesize a child only when its
    // precedence is lower, or equal on the RIGHT of -, /, same-level *
    // (left-associativity) — exactly the cases the parser must resolve
    def render(e: PExpr, parentPrec: Int, rightChild: Boolean): String = e match {
      case PNum(v) => v.toLong.toString
      case PBin(op, l, r) =>
        val s = render(l, prec(op), rightChild = false) +
          s" $op " + render(r, prec(op), rightChild = true)
        if (prec(op) < parentPrec || (prec(op) == parentPrec && rightChild)) s"($s)" else s
      case other => sys.error(s"unexpected $other")
    }
    def eval(e: PExpr): Double = e match {
      case PNum(v) => v
      case PBin('+', l, r) => eval(l) + eval(r)
      case PBin('-', l, r) => eval(l) - eval(r)
      case PBin('*', l, r) => eval(l) * eval(r)
      case PBin('/', l, r) => eval(l) / eval(r)
      case other => sys.error(s"unexpected $other")
    }
    (1 to 300).foreach { _ =>
      val ast = gen(4)
      val txt = render(ast, 0, rightChild = false)
      InfluxQL.parse(s"SELECT $txt AS x FROM m").asInstanceOf[Select].projs.head match {
        case ExprProj(parsed, _) =>
          assert(eval(parsed) == eval(ast), s"precedence mismatch on: $txt")
        case FieldProj(_, _) | _ if !ast.isInstanceOf[PBin] => () // single literal
        case other => fail(s"unexpected projection $other for: $txt")
      }
    }
    // garbage never escapes as anything but ParseException
    val alphabet = Gen.oneOf("SELECT FROM WHERE GROUP BY time() 1.2.3 e9 */+-,'\"();=~ abc".toSeq)
    (1 to 300).foreach { _ =>
      val junk = List.fill(next(Gen.chooseNum(1, 40)))(next(alphabet)).mkString
      try { InfluxQL.parse(junk); () }
      catch {
        case _: ParseException => ()
        case e: Throwable => fail(s"non-parse error ${e.getClass} on: $junk")
      }
    }
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

  test("fill(linear) interpolates interior gaps, leaves leading/trailing gaps null") {
    // one series: values at 01:00 (10) and 04:00 (40); queried 00:00-06:00
    val gappy = Seq(
      ("2024-01-08 01:00:00", "h1", 10.0),
      ("2024-01-08 04:00:00", "h1", 40.0))
      .toDF("t", "host", "usage")
      .select(col("t").cast("timestamp").as("time"), col("host"), col("usage"))
    val out = InfluxQLEval.run(
      "SELECT sum(usage) FROM cpu WHERE time >= '2024-01-08T00:00:00Z' " +
        "AND time < '2024-01-08T06:00:00Z' GROUP BY time(1h), host FILL(linear)",
      InfluxQLEval.Source(resolve = _ => gappy))
    val rows = out.select(col("time").cast("string"), col("sum"))
      .as[(String, Option[Double])].collect().toMap
    assert(rows("2024-01-08 00:00:00").isEmpty)       // leading gap: null
    assert(rows("2024-01-08 01:00:00").contains(10.0))
    assert(rows("2024-01-08 02:00:00").contains(20.0)) // interpolated
    assert(rows("2024-01-08 03:00:00").contains(30.0)) // interpolated
    assert(rows("2024-01-08 04:00:00").contains(40.0))
    assert(rows("2024-01-08 05:00:00").isEmpty)       // trailing gap: null
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

  test("integral computes unit-scaled trapezoid area; per tag and per bucket") {
    // h1: (00:05, 1.0) (00:25, 3.0) (01:05, 5.0) — trapezoids
    // (1+3)/2 * 20min + (3+5)/2 * 40min = 40 + 160 = 200 value-minutes
    val out = InfluxQLEval.run(
      "SELECT integral(usage, 1m) FROM cpu GROUP BY host", source)
    val rows = out.select("host", "integral").as[(String, Double)].collect().toMap
    assert(rows("h1") == 200.0 && rows("h2") == 0.0) // single point: 0
    // default unit is 1s
    val secs = InfluxQLEval.run(
      "SELECT integral(usage) FROM cpu GROUP BY host", source)
    assert(secs.select("host", "integral").as[(String, Double)].collect()
      .toMap.apply("h1") == 200.0 * 60)
    // bucketed: pairs crossing the boundary contribute to neither bucket
    val bucketed = InfluxQLEval.run(
      "SELECT integral(usage, 1m) FROM cpu WHERE time >= '2024-01-08T00:00:00Z' " +
        "AND time < '2024-01-08T02:00:00Z' GROUP BY time(1h), host FILL(none)",
      source)
    val byKey = bucketed.select(col("time").cast("string"), col("host"), col("integral"))
      .as[(String, String, Double)].collect()
      .map { case (t, h, v) => (t, h) -> v }.toMap
    assert(byKey(("2024-01-08 00:00:00", "h1")) == 40.0) // only the in-bucket pair
    assert(byKey(("2024-01-08 01:00:00", "h1")) == 0.0)
  }

  test("non_negative_difference and the technical-analysis transforms") {
    // h1 values 1, 3, 5: differences +2, +2 — all kept; reversed sign
    // case via derivative of a falling pair is covered by nn_derivative
    val nnd = InfluxQLEval.run(
      "SELECT non_negative_difference(usage) FROM cpu WHERE host = 'h1'", source)
    assert(nnd.select("non_negative_difference").as[Double].collect().toSeq == Seq(2.0, 2.0))
    // ema(2) over 1, 3, 5: seed SMA(1,3) = 2, then 5*(2/3) + 2*(1/3) = 4
    val ema = InfluxQLEval.run(
      "SELECT exponential_moving_average(usage, 2) FROM cpu WHERE host = 'h1' GROUP BY host",
      source)
    assert(ema.select("exponential_moving_average").as[Double].collect().toSeq == Seq(2.0, 4.0))
    // the rest of the family parses and evaluates through the same path
    Seq("double_exponential_moving_average", "triple_exponential_moving_average",
      "relative_strength_index", "chande_momentum_oscillator",
      "kaufmans_adaptive_moving_average").foreach { fn =>
      val p = InfluxQL.parse(s"SELECT $fn(usage, 2) FROM cpu").asInstanceOf[Select]
      assert(p.projs == Seq(TransProj(fn, FieldProj("usage", None), None, Some(2), None)))
      InfluxQLEval.run(s"SELECT $fn(usage, 2) FROM cpu GROUP BY host", source).collect()
    }
  }

  test("holt_winters forecasts N steps beyond the GROUP BY time grid") {
    val q = "SELECT holt_winters(mean(usage), 2, 1) FROM cpu " +
      "WHERE time >= '2024-01-08T00:00:00Z' AND time < '2024-01-08T02:00:00Z' " +
      "GROUP BY time(20m), host FILL(none)"
    val out = InfluxQLEval.run(q, source)
    val rows = out.select(col("host"), col("time").cast("string"), col("holt_winters"))
      .as[(String, String, Double)].collect()
    // h1's grid is 00:00/00:20/01:00 buckets (means 1, 3, 5); two
    // forecast steps continue at the 20m cadence past the last bucket
    val h1 = rows.filter(_._1 == "h1").map(_._2).sorted
    assert(h1.length == 2)
    assert(h1.forall(_ > "2024-01-08 01:00:00"))
    // _with_fit returns the fitted history too
    val fit = InfluxQLEval.run(q.replace("holt_winters(", "holt_winters_with_fit("), source)
    assert(fit.count() > rows.length)
    // S is mandatory, as in v1
    val e = intercept[InfluxQLEval.EvalException](InfluxQLEval.run(
      "SELECT holt_winters(mean(usage), 2) FROM cpu GROUP BY time(20m), host", source))
    assert(e.getMessage.contains("seasonal"))
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

  test("SHOW TAG VALUES lists distinct (key, value) rows, WHERE-filtered") {
    val out = InfluxQLEval.run(
      """SHOW TAG VALUES FROM cpu WITH KEY = "host" WHERE usage > 2""", source)
    assert(out.as[(String, String)].collect().toSeq ==
      Seq(("host", "h1"), ("host", "h2")))
    val narrow = InfluxQLEval.run(
      """SHOW TAG VALUES FROM cpu WITH KEY = "host" WHERE usage > 6""", source)
    assert(narrow.as[(String, String)].collect().toSeq == Seq(("host", "h2")))
  }

  test("SHOW TAG VALUES: IN and regex key selectors, LIMIT/OFFSET") {
    // two-tag frame so IN/regex select across keys
    val f = cpuFrame.withColumn("region",
      when(col("host") === "h1", "us").otherwise("eu"))
    val src = InfluxQLEval.Source(resolve = _ => f,
      tagKeys = _ => Seq("host", "region").toDF("tagKey"))
    val in = InfluxQLEval.run(
      """SHOW TAG VALUES FROM cpu WITH KEY IN ("host", "region")""", src)
    assert(in.as[(String, String)].collect().toSeq == Seq(
      ("host", "h1"), ("host", "h2"), ("region", "eu"), ("region", "us")))
    val re = InfluxQLEval.run(
      "SHOW TAG VALUES FROM cpu WITH KEY =~ /^reg/", src)
    assert(re.as[(String, String)].collect().toSeq ==
      Seq(("region", "eu"), ("region", "us")))
    val neg = InfluxQLEval.run(
      "SHOW TAG VALUES FROM cpu WITH KEY !~ /^reg/ LIMIT 1 OFFSET 1", src)
    assert(neg.as[(String, String)].collect().toSeq == Seq(("host", "h2")))
    val none = InfluxQLEval.run(
      "SHOW TAG VALUES FROM cpu WITH KEY =~ /nope/", src)
    assert(none.columns.toSeq == Seq("key", "value") && none.isEmpty)
  }

  // measurement-per-host view: FROM lists/regexes union per-measurement runs
  private val multiSource = InfluxQLEval.Source(
    resolve = m => cpuFrame.filter(col("host") === m),
    measurementNames = () => Seq("h1", "h2"))

  test("multi-measurement FROM evaluates per measurement and labels the union") {
    val out = InfluxQLEval.run("SELECT sum(usage) AS s FROM h1, h2", multiSource)
    assert(out.columns.head == "measurement")
    assert(out.select("measurement", "s").as[(String, Double)].collect().toSeq ==
      Seq(("h1", 9.0), ("h2", 10.0)))
  }

  test("FROM /regex/ selects matching measurements; no match is an error") {
    val out = InfluxQLEval.run("SELECT sum(usage) AS s FROM /^h[0-9]$/", multiSource)
    assert(out.select("measurement", "s").as[(String, Double)].collect().toSeq ==
      Seq(("h1", 9.0), ("h2", 10.0)))
    // a regex matching ONE measurement keeps the single-source shape
    val one = InfluxQLEval.run("SELECT sum(usage) AS s FROM /h2/", multiSource)
    assert(!one.columns.contains("measurement") &&
      one.select("s").as[Double].collect().toSeq == Seq(10.0))
    val e = intercept[InfluxQLEval.EvalException](
      InfluxQLEval.run("SELECT sum(usage) AS s FROM /nope/", multiSource))
    assert(e.getMessage.contains("no measurement"))
  }

  test("subquery FROM: max of hourly sums (the v1 max-of-downsample idiom)") {
    val out = InfluxQLEval.run(
      "SELECT max(v) AS max_v FROM (SELECT sum(usage) AS v FROM cpu " +
        "WHERE time >= '2024-01-08T00:00:00Z' AND time < '2024-01-08T02:00:00Z' " +
        "GROUP BY time(1h))", source)
    assert(out.select("max_v").as[Double].collect().toSeq == Seq(14.0))
    // outer GROUP BY over a column the inner result carries
    val grouped = InfluxQLEval.run(
      "SELECT max(v) AS max_v FROM (SELECT sum(usage) AS v FROM cpu " +
        "WHERE time >= '2024-01-08T00:00:00Z' AND time < '2024-01-08T02:00:00Z' " +
        "GROUP BY time(1h), host) GROUP BY host", source)
    assert(grouped.select("host", "max_v").as[(String, Double)].collect().toSet ==
      Set(("h1", 5.0), ("h2", 10.0))) // h1 hourly sums 4.0, 5.0 → max 5.0
  }

  test("ungrouped transform warns only for the nonlinear family") {
    val before = InfluxQLEval.ungroupedTransformWarnings.get()
    // RSI needs the full sequential prefix — still serializes ungrouped
    InfluxQLEval.run("SELECT relative_strength_index(usage, 2) FROM cpu WHERE host = 'h1'", source)
    assert(InfluxQLEval.ungroupedTransformWarnings.get() == before + 1)
    InfluxQLEval.run(
      "SELECT derivative(mean(usage)) FROM cpu GROUP BY time(1h), host", source)
    assert(InfluxQLEval.ungroupedTransformWarnings.get() == before + 1) // grouped: no warn
    // the lag-1 class distributes ungrouped (range partitions +
    // boundary carries) — no serialization, no warning
    val d = InfluxQLEval.run("SELECT difference(usage) FROM cpu WHERE host = 'h1'", source)
    assert(d.select("difference").as[Double].collect().toSeq == Seq(2.0, 2.0))
    assert(InfluxQLEval.ungroupedTransformWarnings.get() == before + 1)
    // moving_average distributes ungrouped via boundary-row carries
    val ma = InfluxQLEval.run("SELECT moving_average(usage, 2) FROM cpu WHERE host = 'h1'", source)
    assert(ma.select("moving_average").as[Double].collect().toSeq == Seq(2.0, 4.0))
    assert(InfluxQLEval.ungroupedTransformWarnings.get() == before + 1)
    // EMA distributes ungrouped via affine-map composition
    val ema = InfluxQLEval.run(
      "SELECT exponential_moving_average(usage, 2) FROM cpu WHERE host = 'h1'", source)
    assert(ema.select("exponential_moving_average").as[Double].collect().toSeq == Seq(2.0, 4.0))
    assert(InfluxQLEval.ungroupedTransformWarnings.get() == before + 1)
  }

  test("non_negative_derivative skips zero-interval pairs instead of leaking NaN") {
    // duplicate timestamp in an untagged scan: dt=0 would yield ±Inf/NaN,
    // and NaN >= 0 is true under Spark's NaN ordering — v1 skips the pair
    val dup = Seq(
      (java.sql.Timestamp.valueOf("2024-01-08 00:00:00"), 1.0),
      (java.sql.Timestamp.valueOf("2024-01-08 00:01:00"), 5.0),
      (java.sql.Timestamp.valueOf("2024-01-08 00:01:00"), 2.0),
      (java.sql.Timestamp.valueOf("2024-01-08 00:02:00"), 4.0))
      .toDF("time", "usage")
    val src = InfluxQLEval.Source(resolve = _ => dup)
    val out = InfluxQLEval.run(
      "SELECT non_negative_derivative(usage, 1m) FROM cpu", src)
      .select("non_negative_derivative").as[Double].collect().toSeq
    assert(out.forall(v => !v.isNaN && !v.isInfinite))
    assert(out.head == 4.0) // (5-1)/1min; the 2→4 pair's sign depends on dup ordering
    val plain = InfluxQLEval.run(
      "SELECT derivative(usage, 1m) FROM cpu", src)
      .select("derivative").as[Double].collect().toSeq
    assert(plain.forall(v => !v.isNaN && !v.isInfinite))
  }

  test("the three-arg tag form is rejected for aggregates other than top/bottom") {
    val e = intercept[InfluxQLEval.EvalException](
      InfluxQLEval.run("SELECT sample(usage, host, 2) FROM cpu", source))
    assert(e.getMessage.contains("top()/bottom()"))
    val e2 = intercept[InfluxQLEval.EvalException](
      InfluxQLEval.run("SELECT mean(usage, host, 2) FROM cpu", source))
    assert(e2.getMessage.contains("top()/bottom()"))
  }

  test("parses arithmetic projections, time() offset, tz, star, admin SHOWs") {
    val s = InfluxQL.parse(
      "SELECT (sum(errors) / sum(total)) * 100 AS pct FROM m " +
        "GROUP BY time(1h, -15m) tz('America/Chicago')").asInstanceOf[Select]
    assert(s.projs == Seq(ExprProj(
      PBin('*',
        PBin('/', PAgg(AggProj("sum", "errors", None, None)),
          PAgg(AggProj("sum", "total", None, None))),
        PNum(100.0)),
      Some("pct"))))
    assert(s.groupOffset.contains(Dur(-15, "m")) && s.tz.contains("America/Chicago"))
    assert(exprName(s.projs.head.asInstanceOf[ExprProj].expr) == "sum_sum")
    val star = InfluxQL.parse("SELECT * FROM m").asInstanceOf[Select]
    assert(star.projs == Seq(FieldProj("*", None)))
    assert(InfluxQL.parse("SHOW DATABASES") == ShowDatabases)
    assert(InfluxQL.parse("SHOW RETENTION POLICIES ON mydb") ==
      ShowRetentionPolicies(Some("mydb")))
    assert(InfluxQL.parse("SHOW SERIES FROM cpu WHERE usage > 1") ==
      ShowSeries(Some("cpu"), Some(CCmp(">", "usage", LInt(1)))))
  }

  test("arithmetic projections evaluate in aggregate and raw contexts") {
    // aggregate arithmetic, default composed name
    val agg = InfluxQLEval.run(
      "SELECT mean(usage) + max(usage) FROM cpu WHERE host = 'h1'", source)
    assert(agg.columns.toSeq == Seq("mean_max"))
    assert(agg.as[Double].collect().toSeq == Seq(8.0)) // mean 3 + max 5
    // the Grafana ratio idiom
    val pct = InfluxQLEval.run(
      "SELECT (sum(usage) / count(usage)) * 100 AS pct FROM cpu GROUP BY host", source)
    assert(pct.select("host", "pct").as[(String, Double)].collect().toSet ==
      Set(("h1", 300.0), ("h2", 1000.0)))
    // row-wise arithmetic over raw fields
    val raw = InfluxQLEval.run(
      "SELECT usage * 2 AS dbl FROM cpu WHERE host = 'h1'", source)
    assert(raw.select("dbl").as[Double].collect().toSeq == Seq(2.0, 6.0, 10.0))
    // aggregate and raw leaves cannot mix in one statement
    val e = intercept[InfluxQLEval.EvalException](InfluxQLEval.run(
      "SELECT mean(usage) + usage FROM cpu", source).collect())
    assert(e.getMessage.contains("raw field"))
  }

  test("GROUP BY time(1h, 30m) shifts bucket alignment; fill spine follows") {
    val out = InfluxQLEval.run(
      "SELECT sum(usage) FROM cpu WHERE time >= '2024-01-08T00:00:00Z' " +
        "AND time < '2024-01-08T02:00:00Z' GROUP BY time(1h, 30m) FILL(none)", source)
    assert(out.select(col("time").cast("string"), col("sum"))
      .as[(String, Double)].collect().toSet ==
      Set(("2024-01-07 23:30:00", 14.0), ("2024-01-08 00:30:00", 5.0)))
    val filled = InfluxQLEval.run(
      "SELECT sum(usage) FROM cpu WHERE time >= '2024-01-08T00:00:00Z' " +
        "AND time < '2024-01-08T02:00:00Z' GROUP BY time(1h, 30m) FILL(0)", source)
    assert(filled.select(col("time").cast("string"), col("sum"))
      .as[(String, Double)].collect().toSet ==
      Set(("2024-01-07 23:30:00", 14.0), ("2024-01-08 00:30:00", 5.0),
        ("2024-01-08 01:30:00", 0.0)))
  }

  test("tz() aligns buckets to local wall-clock time") {
    // Etc/GMT+5 = UTC-5: all points (00:05–01:05 UTC Jan 8) fall in the
    // LOCAL day Jan 7, whose bucket start is 05:00 UTC
    val out = InfluxQLEval.run(
      "SELECT sum(usage) FROM cpu WHERE time >= '2024-01-07T00:00:00Z' " +
        "AND time < '2024-01-09T00:00:00Z' GROUP BY time(1d) FILL(none) " +
        "tz('Etc/GMT+5')", source)
    assert(out.select(col("time").cast("string"), col("sum"))
      .as[(String, Double)].collect().toSet ==
      Set(("2024-01-07 05:00:00", 19.0)))
  }

  test("top/bottom select extreme points per series; distinct lists values; count(distinct())") {
    val top = InfluxQLEval.run("SELECT top(usage, 2) FROM cpu GROUP BY host", source)
    assert(top.columns.toSeq == Seq("time", "host", "top"))
    // rows come back in (series, time) order like v1: h1's two top
    // points are 3.0@00:25 then 5.0@01:05
    assert(top.select("host", "top").as[(String, Double)].collect().toSeq ==
      Seq(("h1", 3.0), ("h1", 5.0), ("h2", 10.0)))
    val bot = InfluxQLEval.run("SELECT bottom(usage, 1) FROM cpu", source)
    assert(bot.select("bottom").as[Double].collect().toSeq == Seq(1.0))
    val dv = InfluxQLEval.run("SELECT distinct(usage) AS v FROM cpu GROUP BY host", source)
    assert(dv.as[(String, Double)].collect().toSeq ==
      Seq(("h1", 1.0), ("h1", 3.0), ("h1", 5.0), ("h2", 10.0)))
    val cd = InfluxQLEval.run("SELECT count(distinct(usage)) FROM cpu", source)
    assert(cd.columns.toSeq == Seq("count")) // v1 names it plain "count"
    assert(cd.as[Long].collect().toSeq == Seq(4L))
  }

  test("SELECT * expands to all non-time columns; elapsed() counts whole units") {
    val star = InfluxQLEval.run("SELECT * FROM cpu WHERE host = 'h2'", source)
    assert(star.columns.toSeq == Seq("time", "host", "usage"))
    assert(star.count() == 1)
    val el = InfluxQLEval.run("SELECT elapsed(usage, 1m) FROM cpu WHERE host = 'h1'", source)
    assert(el.select("elapsed").as[Long].collect().toSeq == Seq(20L, 40L))
  }

  test("scalar math functions work over raw fields and aggregates") {
    val raw = InfluxQLEval.run(
      "SELECT abs(usage - 4) AS d FROM cpu WHERE host = 'h1'", source)
    assert(raw.select("d").as[Double].collect().toSeq == Seq(3.0, 1.0, 1.0))
    val agg = InfluxQLEval.run(
      "SELECT sqrt(sum(usage)) AS r, pow(max(usage), 2) AS p FROM cpu GROUP BY host", source)
    assert(agg.select("host", "r", "p").as[(String, Double, Double)].collect().toSet ==
      Set(("h1", 3.0, 25.0), ("h2", math.sqrt(10.0), 100.0)))
    // default composed name: v1 names abs(value) plain "abs"
    val named = InfluxQLEval.run("SELECT abs(usage) FROM cpu LIMIT 1", source)
    assert(named.columns.toSeq == Seq("time", "abs"))
  }

  test("GROUP BY * expands to every tag key from the source listing") {
    val withKeys = InfluxQLEval.Source(
      resolve = _ => cpuFrame,
      tagKeys = _ => Seq("host").toDF("tagKey"))
    val out = InfluxQLEval.run("SELECT mean(usage) FROM cpu GROUP BY *", withKeys)
    assert(out.columns.toSeq == Seq("host", "mean"))
    assert(out.as[(String, Double)].collect().toSet == Set(("h1", 3.0), ("h2", 10.0)))
    val e = intercept[IllegalArgumentException](
      InfluxQLEval.run("SELECT mean(usage) FROM cpu GROUP BY *", source))
    assert(e.getMessage.contains("tag-key listing"))
  }

  test("parseAll: semicolon-separated statement batches") {
    val stmts = InfluxQL.parseAll(
      "SELECT mean(usage) FROM cpu; SHOW MEASUREMENTS ; SELECT count(usage) FROM cpu;")
    assert(stmts.size == 3 && stmts(1) == ShowMeasurements())
    // a bare single statement still parses through parseAll
    assert(InfluxQL.parseAll("SHOW DATABASES") == Seq(ShowDatabases))
  }

  test("type qualifiers ::field/::tag/::float parse and drop") {
    val s = InfluxQL.parse(
      """SELECT mean("value"::field) AS m FROM cpu
        |WHERE "host"::tag = 'h1' GROUP BY time(1h), "host"::tag""".stripMargin
        .replace("\n", " ")).asInstanceOf[Select]
    assert(s.projs == Seq(AggProj("mean", "value", None, Some("m"))))
    assert(s.groupTags == Seq("host"))
    assert(InfluxQL.parse("SELECT value::float FROM cpu").asInstanceOf[Select]
      .projs == Seq(FieldProj("value", None)))
    intercept[InfluxQL.ParseException] {
      InfluxQL.parse("SELECT value::nope FROM cpu")
    }
  }

  test("percentile is nearest-rank and composes under transforms") {
    val src = InfluxQLEval.Source(resolve = _ =>
      (1 to 10).map(i => (i.toLong * 1000000L, "a", i.toDouble))
        .toDF("t", "event_type", "value")
        .select(org.apache.spark.sql.functions.timestamp_micros(col("t")).as("time"),
          col("event_type"), col("value")))
    // 10 values 1..10: rank = floor(10*0.9 + 0.5) = 9 → value 9 (v1
    // nearest-rank; interpolation would give 9.1)
    val p = InfluxQLEval.run(
      "SELECT percentile(value, 90) AS p FROM m GROUP BY event_type", src)
    assert(p.select("p").as[Double].collect().toSeq == Seq(9.0))
    // composes as a transform inner: staged rank windows ride through
    val d = InfluxQLEval.run(
      "SELECT derivative(percentile(value, 50), 1s) AS r FROM m " +
        "WHERE time >= '1970-01-01T00:00:00Z' AND time < '1970-01-01T01:00:00Z' " +
        "GROUP BY time(2s), event_type", src)
    assert(d.columns.contains("r") && d.count() > 0)
  }

  test("EXPLAIN [ANALYZE] returns the plan as QUERY PLAN rows") {
    assert(InfluxQL.parse("EXPLAIN SELECT mean(value) FROM events GROUP BY event_type")
      .isInstanceOf[Explain])
    val src = InfluxQLEval.Source(resolve =
      _ => Seq((1L, "a", 1.0), (2L, "a", 2.0)).toDF("time", "event_type", "value"))
    val plan = InfluxQLEval.run(
      "EXPLAIN SELECT mean(value) FROM events GROUP BY event_type", src)
    assert(plan.columns.toSeq == Seq("QUERY PLAN"))
    val text = plan.as[String].collect().mkString("\n")
    assert(text.contains("Physical Plan"))
    assert(text.contains("HashAggregate"))
    val analyzed = InfluxQLEval.run(
      "EXPLAIN ANALYZE SELECT mean(value) FROM events GROUP BY event_type", src)
      .as[String].collect()
    assert(analyzed.head.startsWith("EXECUTED: 1 rows"))
  }

  test("store-backed: non-float fields read back TYPED through /query") {
    val dir = java.nio.file.Files.createTempDirectory("graft-typed-fields")
    val tsdb = graft.dsl.Tsdb(spark, dir.toString)
    tsdb.catalog.createBucket("tdb", "greengrass")
    val t0 = 1704672000L * 1000000000L
    tsdb.writeLp("tdb", Seq(
      s"""svc,host=h1 usage=0.5,conns=42i,status="ok",up=true $t0""",
      s"""svc,host=h1 usage=0.7,conns=40i,status="degraded",up=false ${t0 + 1000000000L}"""))
    val json = graft.service.V1Query.run(tsdb, "tdb",
      "SELECT usage, conns, status, up FROM svc")
    val node = graft.service.Json.mapper.readTree(json)
    val s0 = node.at("/results/0/series/0")
    assert(s0.at("/columns").toString ==
      """["time","usage","conns","status","up"]""")
    val v0 = s0.at("/values/0")
    assert(v0.get(1).asDouble() == 0.5)
    assert(v0.get(2).isIntegralNumber && v0.get(2).asLong() == 42L)
    assert(v0.get(3).isTextual && v0.get(3).asText() == "ok")
    assert(v0.get(4).isBoolean && v0.get(4).asBoolean())
    // SHOW FIELD KEYS reports the real v1 type names
    val fk = graft.service.Json.mapper.readTree(
      graft.service.V1Query.run(tsdb, "tdb", "SHOW FIELD KEYS FROM svc"))
    val pairs = {
      val vs = fk.at("/results/0/series/0/values")
      (0 until vs.size()).map(i => vs.get(i).get(0).asText() -> vs.get(i).get(1).asText()).toMap
    }
    assert(pairs == Map("usage" -> "float", "conns" -> "integer",
      "status" -> "string", "up" -> "boolean"))
    // string and boolean predicates work against the typed columns
    val deg = graft.service.Json.mapper.readTree(
      graft.service.V1Query.run(tsdb, "tdb",
        "SELECT usage FROM svc WHERE status = 'degraded'"))
    assert(deg.at("/results/0/series/0/values").size() == 1)
    assert(deg.at("/results/0/series/0/values/0/1").asDouble() == 0.7)
    val down = graft.service.Json.mapper.readTree(
      graft.service.V1Query.run(tsdb, "tdb",
        "SELECT usage FROM svc WHERE up = false"))
    assert(down.at("/results/0/series/0/values").size() == 1)
    assert(down.at("/results/0/series/0/values/0/1").asDouble() == 0.7)
  }

  test("SELECT INTO preserves string and bool fields typed (all-type copy)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-into-typed")
    val tsdb = graft.dsl.Tsdb(spark, dir.toString)
    tsdb.catalog.createBucket("idb", "greengrass")
    val t0 = 1704672000L * 1000000000L
    tsdb.writeLp("idb", Seq(
      s"""svc,host=h1 usage=0.5,conns=42i,status="ok",up=true $t0""",
      s"""svc,host=h1 usage=0.7,conns=40i,status="degraded",up=false ${t0 + 1000000000L}"""))
    // raw all-field copy into a new measurement (v1's backfill shape)
    graft.service.V1Query.run(tsdb, "idb",
      "SELECT usage, conns, status, up INTO svc_copy FROM svc GROUP BY host")
    // the copy reads back with every field at its original TYPE
    val json = graft.service.Json.mapper.readTree(
      graft.service.V1Query.run(tsdb, "idb",
        "SELECT usage, conns, status, up FROM svc_copy"))
    val vs = json.at("/results/0/series/0/values")
    assert(vs.size() == 2)
    assert(vs.get(0).get(1).asDouble() == 0.5)
    assert(vs.get(0).get(2).isIntegralNumber && vs.get(0).get(2).asLong() == 42L)
    assert(vs.get(0).get(3).asText() == "ok")
    assert(vs.get(0).get(4).isBoolean && vs.get(0).get(4).asBoolean())
    assert(vs.get(1).get(3).asText() == "degraded")
    assert(vs.get(1).get(4).isBoolean && !vs.get(1).get(4).asBoolean())
    // GROUP BY tag rode along as a tag on the copy
    val fk = graft.service.Json.mapper.readTree(
      graft.service.V1Query.run(tsdb, "idb", "SHOW FIELD KEYS FROM svc_copy"))
    val pairs = {
      val v = fk.at("/results/0/series/0/values")
      (0 until v.size()).map(i => v.get(i).get(0).asText() -> v.get(i).get(1).asText()).toMap
    }
    assert(pairs == Map("usage" -> "float", "conns" -> "integer",
      "status" -> "string", "up" -> "boolean"))
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
    // v1 shape: columns [time, mean], aggregate rows carry epoch-0 time
    assert(series.get(0).get("columns").get(0).asText() == "time")
    assert(series.get(0).get("values").get(0).get(0).asText() == "1970-01-01T00:00:00Z")
    val byHost = (0 until series.size()).map { i =>
      series.get(i).get("tags").get("host").asText() ->
        series.get(i).get("values").get(0).get(1).asDouble()
    }.toMap
    assert(math.abs(byHost("h1") - 0.6) < 1e-9 && byHost("h2") == 0.9)
    // SHOW queries
    val meas = graft.service.Json.mapper.readTree(
      graft.service.V1Query.run(tsdb, "v1db", "SHOW MEASUREMENTS"))
    assert(meas.get("results").get(0).get("series").get(0)
      .get("values").get(0).get(0).asText() == "cpu")
    // admin SHOWs over the same catalog
    val src = InfluxQLEval.tsdbSource(tsdb, "v1db")
    assert(InfluxQLEval.run("SHOW MEASUREMENTS WITH MEASUREMENT =~ /^c/", src)
      .as[String].collect().toSeq == Seq("cpu"))
    assert(InfluxQLEval.run("SHOW MEASUREMENTS WITH MEASUREMENT =~ /^z/", src)
      .as[String].collect().isEmpty)
    assert(InfluxQLEval.run("SHOW MEASUREMENTS WITH MEASUREMENT = cpu LIMIT 1", src)
      .as[String].collect().toSeq == Seq("cpu"))
    assert(InfluxQLEval.run("SHOW DATABASES", src)
      .as[String].collect().toSeq.contains("v1db"))
    val rp = InfluxQLEval.run("SHOW RETENTION POLICIES", src)
    assert(rp.columns.toSeq ==
      Seq("name", "duration", "shardGroupDuration", "replicaN", "default"))
    assert(rp.select("name", "duration").as[(String, String)].collect().toSeq ==
      Seq(("autogen", "0s"))) // 0 retention = infinite, v1's "0s"
    assert(InfluxQLEval.run("SHOW SERIES FROM cpu", src)
      .as[String].collect().toSeq == Seq("cpu,host=h1", "cpu,host=h2"))
    assert(InfluxQLEval.run("SHOW SERIES", src)
      .as[String].collect().toSeq == Seq("cpu,host=h1", "cpu,host=h2"))
    // multi-statement batch: one results entry per statement, id-keyed
    val batch = graft.service.Json.mapper.readTree(
      graft.service.V1Query.run(tsdb, "v1db",
        "SELECT mean(usage) FROM cpu GROUP BY host; SHOW MEASUREMENTS"))
    val rs = batch.get("results")
    assert(rs.size() == 2)
    assert(rs.get(0).get("statement_id").asInt() == 0 &&
      rs.get(1).get("statement_id").asInt() == 1)
    assert(rs.get(1).get("series").get(0).get("values").get(0).get(0).asText() == "cpu")
  }

  test("store-backed: continuous query DDL downsample + DELETE/DROP MEASUREMENT") {
    val dir = java.nio.file.Files.createTempDirectory("graft-influxql-cq")
    val tsdb = graft.dsl.Tsdb(spark, dir.toString)
    tsdb.catalog.createBucket("cqdb", "greengrass")
    val t0 = 1704672000L * 1000000000L // 2024-01-08T00:00:00Z
    val m = 60L * 1000000000L
    tsdb.writeLp("cqdb", Seq(
      s"cpu,host=h1 usage=1.0 $t0",
      s"cpu,host=h1 usage=3.0 ${t0 + 10 * m}",
      s"cpu,host=h1 usage=5.0 ${t0 + 70 * m}",
      s"mem,host=h1 used=7.0 $t0")) // other measurement: must not leak in
    val cqs = new graft.streaming.ContinuousQueries(
      tsdb, dir.resolve("cq-ckpt").toString,
      defaultTrigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
    // CREATE via the /query surface, then drain the AvailableNow run
    graft.service.V1Query.run(tsdb, "cqdb",
      "CREATE CONTINUOUS QUERY cq_avg ON cqdb BEGIN " +
        "SELECT mean(usage) INTO cpu_1h FROM cpu GROUP BY time(1h) END",
      Some(cqs))
    cqs.awaitAll()
    val down = tsdb.fieldsAsCols("cqdb", "cpu_1h")
    val rows = down.select(col("time").cast("string"), col("mean"))
      .as[(String, Double)].collect().toSet
    assert(rows == Set( // window END labels, like aggregateWindow
      ("2024-01-08 01:00:00", 2.0), ("2024-01-08 02:00:00", 5.0)))
    // SHOW lists it; DROP stops + removes it
    val shown = graft.service.Json.mapper.readTree(
      graft.service.V1Query.run(tsdb, "cqdb", "SHOW CONTINUOUS QUERIES", Some(cqs)))
    assert(shown.get("results").get(0).get("series").get(0)
      .get("values").get(0).get(0).asText() == "cq_avg")
    graft.service.V1Query.run(tsdb, "cqdb",
      "DROP CONTINUOUS QUERY cq_avg ON cqdb", Some(cqs))
    assert(cqs.list.isEmpty)
    // ad-hoc SELECT INTO backfill: hourly means written as cpu_bf
    val intoResp = graft.service.Json.mapper.readTree(
      graft.service.V1Query.run(tsdb, "cqdb",
        "SELECT mean(usage) INTO cpu_bf FROM cpu " +
          "WHERE time >= '2024-01-08T00:00:00Z' AND time < '2024-01-08T02:00:00Z' " +
          "GROUP BY time(1h), host FILL(none)", Some(cqs)))
    val writtenRow = intoResp.get("results").get(0).get("series").get(0)
    assert(writtenRow.get("name").asText() == "result")
    assert(writtenRow.get("values").get(0).get(1).asLong() == 2L) // h1's two hourly windows
    val bf = tsdb.from("cqdb").toDF
      .filter(col("measurement") === "cpu_bf")
    assert(bf.count() == 2 && bf.select("field").distinct()
      .as[String].collect().toSeq == Seq("mean"))
    assert(bf.filter(col("tags.host") === "h1").count() == 2)
    // cardinality probes
    val card = graft.service.Json.mapper.readTree(
      graft.service.V1Query.run(tsdb, "cqdb",
        "SHOW SERIES CARDINALITY; SHOW MEASUREMENT CARDINALITY", Some(cqs)))
    // series: cpu×h1, mem×h1, cpu_1h×h1, cpu_bf×h1, cpu_bf... (h2 absent
    // from LP writes) — just assert both probes answer a positive count
    assert(card.get("results").get(0).get("series").get(0)
      .get("values").get(0).get(0).asLong() >= 4L)
    assert(card.get("results").get(1).get("series").get(0)
      .get("values").get(0).get(0).asLong() >= 3L)
    // tag/field key cardinality (with the ON db form targeting this db)
    val kcard = graft.service.Json.mapper.readTree(
      graft.service.V1Query.run(tsdb, "cqdb",
        "SHOW TAG KEY CARDINALITY; SHOW FIELD KEY CARDINALITY ON cqdb", Some(cqs)))
    assert(kcard.get("results").get(0).get("series").get(0)
      .get("values").get(0).get(0).asLong() == 1L) // host
    assert(kcard.get("results").get(1).get("series").get(0)
      .get("values").get(0).get(0).asLong() >= 3L) // usage, used, mean, …

    // DELETE with time bound + tag predicate, then DROP MEASUREMENT
    graft.service.V1Query.run(tsdb, "cqdb",
      s"DELETE FROM cpu WHERE time < ${t0 + 30 * m} AND host = 'h1'", Some(cqs))
    assert(tsdb.from("cqdb").toDF
      .filter(col("measurement") === "cpu").count() == 1) // only the 70-min point
    graft.service.V1Query.run(tsdb, "cqdb", "DROP MEASUREMENT mem", Some(cqs))
    assert(tsdb.from("cqdb").toDF
      .filter(col("measurement") === "mem").count() == 0)
  }

  test("CQ RESAMPLE EVERY/FOR: parse + trigger cadence resolution") {
    val c = InfluxQL.parse(
      "CREATE CONTINUOUS QUERY r ON db RESAMPLE EVERY 30m FOR 2h BEGIN " +
        "SELECT mean(usage) INTO cpu_1h FROM cpu GROUP BY time(1h) END")
      .asInstanceOf[CreateCq]
    assert(c.resampleEvery.contains(Dur(30, "m")) &&
      c.resampleFor.contains(Dur(2, "h")))
    val forOnly = InfluxQL.parse(
      "CREATE CONTINUOUS QUERY r ON db RESAMPLE FOR 90m BEGIN " +
        "SELECT mean(usage) INTO cpu_1h FROM cpu GROUP BY time(1h) END")
      .asInstanceOf[CreateCq]
    assert(forOnly.resampleEvery.isEmpty && forOnly.resampleFor.contains(Dur(90, "m")))
    assertThrows[ParseException](InfluxQL.parse(
      "CREATE CONTINUOUS QUERY r ON db RESAMPLE BEGIN " +
        "SELECT mean(u) INTO a FROM b GROUP BY time(1h) END"))
    import org.apache.spark.sql.streaming.Trigger
    assert(graft.streaming.ContinuousQueries.resolveTrigger(
      Trigger.AvailableNow(), Some(Dur(30, "m"))) == Trigger.ProcessingTime(1800000L))
    assert(graft.streaming.ContinuousQueries.resolveTrigger(
      Trigger.AvailableNow(), None) == Trigger.AvailableNow())
    // live-service default (no RESAMPLE EVERY, no explicit trigger):
    // the v1 run schedule = the GROUP BY time() interval — NOT a
    // drain-and-terminate AvailableNow
    assert(graft.streaming.ContinuousQueries.effectiveTrigger(
      None, None, Dur(1, "h")) == Trigger.ProcessingTime(3600000L))
    assert(graft.streaming.ContinuousQueries.effectiveTrigger(
      Some(Trigger.AvailableNow()), None, Dur(1, "h")) == Trigger.AvailableNow())
    assert(graft.streaming.ContinuousQueries.effectiveTrigger(
      Some(Trigger.AvailableNow()), Some(Dur(30, "m")), Dur(1, "h")) ==
      Trigger.ProcessingTime(1800000L))
  }

  test("CQ WHERE pushes tag predicates; unsupported clauses rejected at CREATE") {
    val dir = java.nio.file.Files.createTempDirectory("graft-influxql-cq-where")
    val tsdb = graft.dsl.Tsdb(spark, dir.toString)
    tsdb.catalog.createBucket("wdb", "greengrass")
    val t0 = 1704672000L * 1000000000L
    val m = 60L * 1000000000L
    tsdb.writeLp("wdb", Seq(
      s"cpu,host=h1 usage=2.0 $t0",
      s"cpu,host=h1 usage=4.0 ${t0 + 10 * m}",
      s"cpu,host=h2 usage=100.0 ${t0 + 20 * m}")) // must NOT be aggregated
    val cqs = new graft.streaming.ContinuousQueries(
      tsdb, dir.resolve("ckpt").toString,
      defaultTrigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
    graft.service.V1Query.run(tsdb, "wdb",
      "CREATE CONTINUOUS QUERY cq_h1 ON wdb BEGIN " +
        "SELECT mean(usage) INTO cpu_h1 FROM cpu WHERE host = 'h1' " +
        "GROUP BY time(1h) END", Some(cqs))
    cqs.awaitAll()
    val rows = tsdb.fieldsAsCols("wdb", "cpu_h1")
      .select(col("time").cast("string"), col("mean"))
      .as[(String, Double)].collect().toSet
    assert(rows == Set(("2024-01-08 01:00:00", 3.0))) // h2's 100.0 excluded
    // a WHERE the task can't honor must fail CREATE, not silently drop
    assertThrows[IllegalArgumentException](cqs.create("bad1", "wdb",
      InfluxQL.parse("SELECT mean(usage) INTO x FROM cpu " +
        "WHERE time > '2024-01-01T00:00:00Z' GROUP BY time(1h)")
        .asInstanceOf[Select], "t"))
    assertThrows[IllegalArgumentException](cqs.create("bad2", "wdb",
      InfluxQL.parse("SELECT mean(usage) INTO x FROM cpu " +
        "GROUP BY time(1h) FILL(0)").asInstanceOf[Select], "t"))
    assertThrows[IllegalArgumentException](cqs.create("bad3", "wdb",
      InfluxQL.parse("SELECT mean(usage) INTO x FROM cpu " +
        "GROUP BY time(1h) LIMIT 5").asInstanceOf[Select], "t"))
  }

  test("SHOW CONTINUOUS QUERIES echoes only the CREATE statement's own text") {
    val dir = java.nio.file.Files.createTempDirectory("graft-influxql-cq-echo")
    val tsdb = graft.dsl.Tsdb(spark, dir.toString)
    tsdb.catalog.createBucket("edb", "greengrass")
    tsdb.writeLp("edb", Seq(s"cpu,host=h1 usage=1.0 ${1704672000L * 1000000000L}"))
    val cqs = new graft.streaming.ContinuousQueries(
      tsdb, dir.resolve("ckpt").toString,
      defaultTrigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
    // multi-statement batch: the sibling SHOW must not leak into the echo
    graft.service.V1Query.run(tsdb, "edb",
      "CREATE CONTINUOUS QUERY only_me ON edb BEGIN " +
        "SELECT mean(usage) INTO cpu_1h FROM cpu GROUP BY time(1h) END; " +
        "SHOW CONTINUOUS QUERIES", Some(cqs))
    cqs.awaitAll()
    val echoed = cqs.list.head._3
    assert(echoed.startsWith("CREATE CONTINUOUS QUERY only_me"))
    assert(!echoed.contains("SHOW CONTINUOUS QUERIES"))
  }

  test("tag-key cache: repeated GROUP BY * plans with no key-discovery job") {
    val dir = java.nio.file.Files.createTempDirectory("graft-influxql-tkcache")
    val tsdb = graft.dsl.Tsdb(spark, dir.toString)
    tsdb.catalog.createBucket("tkdb", "greengrass")
    val t0 = 1704672000L * 1000000000L
    tsdb.writeLp("tkdb", Seq(
      s"cpu,host=h1,region=eu usage=0.5 $t0",
      s"cpu,host=h2,region=us usage=0.9 ${t0 + 1000000000L}"))
    val src = InfluxQLEval.tsdbSource(tsdb, "tkdb")
    // warm: the first plan pays the tag-key and field-key discovery scans
    val k1 = tsdb.store.tagKeys("tkdb", Some("cpu"))
    assert(k1 == Seq("host", "region"))
    // memoized: the very same instance comes back (no recompute)
    assert(tsdb.store.tagKeys("tkdb", Some("cpu")) eq k1)
    InfluxQLEval.run("SELECT mean(usage) FROM cpu GROUP BY *", src)
    InfluxQLEval.run("SHOW TAG VALUES FROM cpu WITH KEY =~ /host/", src)
    // a second GROUP BY * / SHOW TAG KEYS plans with zero Spark jobs
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    sc.addSparkListener(listener)
    try {
      InfluxQLEval.run("SELECT mean(usage) FROM cpu GROUP BY *", src) // plan only
      InfluxQLEval.run("SHOW TAG VALUES FROM cpu WITH KEY =~ /host/", src)
      Thread.sleep(500) // listener bus is async; jobs would land well within this
      assert(jobs.get() == 0, s"expected job-free plan construction, saw ${jobs.get()} jobs")
    } finally sc.removeSparkListener(listener)
    // results stay correct through the cache
    val grouped = InfluxQLEval.run("SELECT mean(usage) FROM cpu GROUP BY *", src)
    assert(grouped.columns.contains("host") && grouped.columns.contains("region"))
    // mutation invalidates: a write adding a new tag key is visible
    tsdb.writeLp("tkdb", Seq(s"cpu,host=h3,zone=z1 usage=0.1 ${t0 + 2000000000L}"))
    assert(tsdb.store.tagKeys("tkdb", Some("cpu")) == Seq("host", "region", "zone"))
  }

  test("CQ RESAMPLE FOR admits late data an un-RESAMPLEd CQ drops") {
    val dir = java.nio.file.Files.createTempDirectory("graft-influxql-cq-for")
    val tsdb = graft.dsl.Tsdb(spark, dir.toString)
    tsdb.catalog.createBucket("rdb", "greengrass")
    val t0 = 1704672000L * 1000000000L // 2024-01-08T00:00:00Z
    val m = 60L * 1000000000L
    val cqs = new graft.streaming.ContinuousQueries(
      tsdb, dir.resolve("ckpt").toString,
      defaultTrigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
    // on-time points in hour 0 plus a point at 03:30 that advances the
    // watermark past hour 0's window end
    tsdb.writeLp("rdb", Seq(
      s"cpu,host=h1 usage=1.0 ${t0 + 5 * m}",
      s"cpu,host=h1 usage=3.0 ${t0 + 25 * m}",
      s"cpu,host=h1 usage=9.0 ${t0 + 210 * m}"))
    val withFor = "CREATE CONTINUOUS QUERY cq_for ON rdb RESAMPLE FOR 4h BEGIN " +
      "SELECT mean(usage) INTO cpu_for FROM cpu GROUP BY time(1h) END"
    val noFor = "CREATE CONTINUOUS QUERY cq_strict ON rdb BEGIN " +
      "SELECT mean(usage) INTO cpu_strict FROM cpu GROUP BY time(1h) END"
    graft.service.V1Query.run(tsdb, "rdb", withFor, Some(cqs))
    graft.service.V1Query.run(tsdb, "rdb", noFor, Some(cqs))
    cqs.awaitAll()
    def hour0(meas: String): Set[Double] = tsdb.fieldsAsCols("rdb", meas)
      .filter(col("time").cast("string") === "2024-01-08 01:00:00")
      .select("mean").as[Double].collect().toSet
    assert(hour0("cpu_for") == Set(2.0) && hour0("cpu_strict") == Set(2.0))
    // a 3.5-hour-late point lands in hour 0; the next scheduled run
    // (drop + recreate resumes the same checkpoint, as EVERY would)
    // refines the FOR CQ's bucket and is beyond the strict watermark
    tsdb.writeLp("rdb", Seq(s"cpu,host=h1 usage=5.0 ${t0 + 10 * m}"))
    graft.service.V1Query.run(tsdb, "rdb",
      "DROP CONTINUOUS QUERY cq_for ON rdb; DROP CONTINUOUS QUERY cq_strict ON rdb",
      Some(cqs))
    graft.service.V1Query.run(tsdb, "rdb", withFor, Some(cqs))
    graft.service.V1Query.run(tsdb, "rdb", noFor, Some(cqs))
    cqs.awaitAll()
    assert(hour0("cpu_for") == Set(3.0))    // (1+3+5)/3 — refined
    assert(hour0("cpu_strict") == Set(2.0)) // late row dropped at watermark
  }
}
