package graft.flux

import graft.dsl.FluxFrame
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Evaluator: a parsed Flux [[FluxParser.Pipeline]] onto the FluxFrame
  * verb surface. Each verb is pure plan construction, so a Flux text
  * query gets the same Catalyst treatment as DSL calls (pushdown,
  * pruning, AQE).
  *
  * Column-name bridge: Flux exposes `_time`/`_value`/`_measurement`;
  * the [[Source]] resolver maps those onto the frame's actual columns.
  */
object FluxEval {
  import FluxParser._

  /** Bucket resolver + Flux-name → actual-column mapping. The frame is
    * normalized to Flux naming (`_time`, `_value`, `_measurement`, …)
    * right after `from`, so every later verb — and its default output
    * column names — lives in one consistent namespace, exactly like
    * Flux tables do.
    */
  final case class Source(
      resolve: String => FluxFrame,
      rename: Map[String, String] = Map.empty,
      write: Option[(String, DataFrame) => Unit] = None,
      /** Clock for now-relative ranges (`range(start: -1h)`) —
        * injectable so specs pin it.
        */
      nowNs: () => Long = () => System.currentTimeMillis() * 1000000L,
      /** Catalog listing for the `buckets()` head (Grafana's Flux
        * health check); null → unsupported on this source.
        */
      buckets: () => DataFrame = null,
      /** Directory `csv.from(file:)` may read from, or None to reject
        * the `file:` parameter entirely. None is the SERVER default:
        * `/api/v2/query` runs for any read token, so an unrestricted
        * driver-side file read would let any token holder probe and
        * exfiltrate arbitrary server paths (the engine disallows
        * `file:` in the server query context for the same reason —
        * it's a REPL/CLI affordance). Paths resolve strictly INSIDE
        * this directory: absolute paths and `..` segments are refused.
        */
      csvDir: Option[java.nio.file.Path] = None,
      /** Field-type lookup (bucket, measurement?, field) → LP kind
        * ("float"/"integer"/"unsigned"/"string"/"boolean") from the
        * store's schema cache. When a filter pins `r._field` (and
        * optionally `r._measurement`), the evaluator uses this to give
        * `_value` the field's REAL type — string/bool/int fields read
        * back typed through the text path instead of as the float
        * column's nulls. Default None → `_value` stays the numeric
        * column, the pre-existing behavior (and the only choice for
        * un-pinned multi-field frames, where Flux itself errors on
        * mixed-type columns).
        */
      fieldType: (String, Option[String], String) => Option[String] =
        (_, _, _) => None)

  final case class EvalException(msg: String) extends Exception(msg)

  def run(query: String, source: Source): DataFrame = {
    val prog = FluxParser.parseProgram(query)
    // reject BEFORE evaluating: eval is effectful (`to()` writes), so a
    // refused script must not leave a half-run's writes behind
    if (prog.mains.sizeIs > 1)
      throw EvalException(
        s"script yields ${prog.mains.size} results on a single-result " +
          "surface — use runAll / the HTTP query API")
    evalProgram(prog, source).head._2
  }

  /** Evaluate a (possibly multi-`yield`) program into the reference
    * engine's RESULT-SET shape: one `(resultName, frame)` per
    * standalone pipeline, in script order. A result's name is its
    * `yield(name:)` argument; an unnamed result is `_result` (the
    * dialect default [[graft.service.AnnotatedCsv.parseResults]]
    * assumes). Duplicate names reject loudly — the engine's response
    * encoding keys sections by name, and Flux itself errors on a
    * duplicate yield name.
    */
  def runAll(query: String, source: Source): Seq[(String, DataFrame)] =
    evalProgram(FluxParser.parseProgram(query), source)

  /** Task-surface execution: evaluate the full (possibly
    * multi-statement, multi-sink) program for its EFFECTS — `to()`
    * materializes during eval — and discard the result frames. Unlike
    * the HTTP query surface, result names key nothing here (no CSV
    * sections are emitted), so duplicate yield names are permitted:
    * two standalone `|> to()` pipelines, both implicitly `_result`,
    * are a normal task shape the reference task engine runs.
    */
  def runScript(query: String, source: Source): Unit = {
    val prog = FluxParser.parseProgram(query)
    evalStatements(prog, source)
    ()
  }

  private def resultName(p: Pipeline): String =
    p.calls.reverseIterator.collectFirst {
      case Call("yield", args) if args.contains("name") => str(args, "name")
    }.getOrElse("_result")

  private def evalProgram(prog: FluxParser.Program,
      source: Source): Seq[(String, DataFrame)] = {
    // names are parse-time facts — duplicate-name rejection happens
    // BEFORE any pipeline evaluates (eval is effectful via `to()`)
    val names = prog.mains.map(resultName)
    val dups = names.groupBy(identity).collect { case (n, xs) if xs.sizeIs > 1 => n }
    if (dups.nonEmpty)
      throw EvalException(s"duplicate yield name(s): ${dups.toSeq.sorted.mkString(", ")}")
    evalStatements(prog, source)
  }

  private def evalStatements(prog: FluxParser.Program,
      source: Source): Seq[(String, DataFrame)] = {
    // statements evaluate IN SCRIPT ORDER: an assignment is visible only
    // to statements after it — a forward reference fails with the same
    // undefined-identifier error the reference engine raises
    var env = Map.empty[String, FluxFrame]
    val out = Seq.newBuilder[(String, DataFrame)]
    prog.stmts.foreach {
      case FluxParser.SAssign(name, pipe) =>
        env += name -> evalPipeline(pipe, source, env)
      case FluxParser.SResult(pipe) =>
        out += resultName(pipe) -> evalPipeline(pipe, source, env).toDF
    }
    out.result()
  }

  private def evalPipeline(pipe: Pipeline, source: Source,
      env: Map[String, FluxFrame]): FluxFrame = {
    def fromBucket(bucket: String): FluxFrame =
      source.rename.foldLeft(source.resolve(bucket)) {
        case (fr, (flux, actual)) if fr.df.columns.contains(actual) => fr.rename(actual -> flux)
        case (fr, _) => fr
      }
    // influxdata/influxdb/schema package — what Grafana's Flux-mode
    // template variables issue. Output: single `_value` string column,
    // distinct + sorted, like the stdlib functions return.
    def schemaValues(df: DataFrame, c: Column): FluxFrame =
      FluxFrame(df.select(c.cast("string").as("_value"))
        .filter(col("_value").isNotNull).distinct().orderBy("_value"),
        Nil, "_value", "_value")
    val frame0 = pipe.calls.headOption match {
      case Some(Call("from", args)) =>
        fromBucket(str(args, "bucket"))
      case Some(Call("buckets", _)) =>
        // standalone head: the catalog listing (what Grafana's Flux
        // datasource health check runs)
        if (source.buckets == null)
          throw EvalException("buckets() is unsupported on this source")
        FluxFrame(source.buckets(), Nil, "name", "name")
      case Some(Call("schema.measurements", args)) =>
        schemaValues(fromBucket(str(args, "bucket")).df, col("_measurement"))
      case Some(Call("schema.tagValues", args)) =>
        val fr = fromBucket(str(args, "bucket"))
        val tag = str(args, "tag")
        val c =
          if (fr.df.columns.contains(tag)) col(tag)
          else if (fr.df.columns.contains("tags")) col("tags").getItem(tag)
          else throw EvalException(s"schema.tagValues: unknown tag '$tag'")
        schemaValues(fr.df, c)
      case Some(Call("schema.tagKeys", args)) =>
        val fr = fromBucket(str(args, "bucket"))
        if (fr.df.columns.contains("tags"))
          schemaValues(fr.df.select(explode(map_keys(col("tags"))).as("_k")), col("_k"))
        else {
          // flat frame: the tag keys are schema, not data
          val spark = fr.df.sparkSession
          import spark.implicits._
          val keys = fr.df.columns.filterNot(c =>
            c.startsWith("_") || c == "dt" || c == "time").sorted.toSeq
          FluxFrame(keys.toDF("_value"), Nil, "_value", "_value")
        }
      case Some(Call("schema.fieldKeys", args)) =>
        val fr = fromBucket(str(args, "bucket"))
        if (fr.df.columns.contains("_field")) schemaValues(fr.df, col("_field"))
        else throw EvalException("schema.fieldKeys needs a source with a _field column")
      // csv.from — the stdlib annotated-CSV source (`import "csv"`):
      // the round-trip for the engine's own /api/v2/query output.
      // Inline `csv:` string or a `file:` path; decoded driver-side
      // (script-embedded payloads are KBs, never corpus data).
      case Some(Call("csv.from", args)) =>
        val text = args.get("csv").map(str0)
          .orElse(args.get("file").map { f =>
            val name = str0(f)
            val dir = source.csvDir.getOrElse(throw EvalException(
              "csv.from(file:) is not available on this query surface; " +
                "inline the payload with csv.from(csv: \"…\")"))
            val p = java.nio.file.Paths.get(name)
            // normalize-then-containment check: symlink-free traversal
            // like "a/../../etc" cannot escape the configured directory
            val resolved = dir.resolve(p).normalize()
            if (p.isAbsolute || !resolved.startsWith(dir.normalize()))
              throw EvalException(
                s"csv.from(file: \"$name\"): path escapes the configured csv directory")
            java.nio.file.Files.readString(resolved)
          })
          .getOrElse(throw EvalException(
            "csv.from(csv: \"…\") or csv.from(file: \"…\") expected"))
        val spark = org.apache.spark.sql.SparkSession.active
        // optional result selection for multi-yield payloads: pick one
        // entry of the decoded result-set map by name (same-schema
        // blocks under that name union — a result is a stream of
        // tables, not a single block)
        val df =
          try args.get("result").map(str0) match {
            case None => graft.service.AnnotatedCsv.parse(text, spark)
            case Some(rn) =>
              val hits = graft.service.AnnotatedCsv.parseResults(text, spark)
                .collect { case (n, d) if n == rn => d }
              if (hits.isEmpty) throw EvalException(
                s"csv.from: no result named '$rn' in the payload")
              else if (hits.map(_.schema).distinct.lengthCompare(1) > 0)
                throw EvalException(
                  s"csv.from: result '$rn' spans blocks with different schemas")
              else hits.reduce(_ unionAll _)
          } catch { case e: IllegalArgumentException => throw EvalException(e.getMessage) }
        val timeCol = if (df.columns.contains("_time")) "_time" else df.columns.head
        val valueCol = if (df.columns.contains("_value")) "_value" else df.columns.last
        FluxFrame(df, Nil, timeCol, valueCol)
      case Some(Call("__ref", args)) =>
        val name = str(args, "name")
        env.getOrElse(name, throw EvalException(s"undefined table variable '$name'"))
      // join/union are standalone heads in Flux — their inputs are table
      // variables from earlier assignments, not the piped-in frame
      case Some(Call("join", args)) =>
        val (a, b) = args.get("tables") match {
          case Some(VRec(Seq((_, VIdent(x)), (_, VIdent(y))))) =>
            (ref(x, env), ref(y, env))
          case other => throw EvalException(s"join(tables: {a: x, b: y}) expected, got $other")
        }
        val how = args.get("method").map(str0).getOrElse("inner")
        a.joinOn(b, strArr(args, "on"), how)
      // as-of join (survey extension): left rows pick up the latest
      // right row at or before their time within the `on` key
      case Some(Call("asofJoin", args)) =>
        val (a, b) = args.get("tables") match {
          case Some(VRec(Seq((_, VIdent(x)), (_, VIdent(y))))) =>
            (ref(x, env), ref(y, env))
          case other => throw EvalException(s"asofJoin(tables: {l: x, r: y}) expected, got $other")
        }
        a.asofJoin(b, strArr(args, "on"), strArr(args, "columns"))
      case Some(Call("union", args)) =>
        args.get("tables") match {
          case Some(VArr(items)) if items.nonEmpty =>
            items.map { case VIdent(x) => ref(x, env); case o => throw EvalException(s"union table must be a variable, got $o") }
              .reduce(_ union _)
          case other => throw EvalException(s"union(tables: [a, b]) expected, got $other")
        }
      case Some(Call(v, args)) if v.startsWith("join.") =>
        // join-package heads name both sides explicitly
        joinPackage(None, v, args, env)
      case _ => throw EvalException("pipeline must start with from(bucket: ...) or a table variable")
    }
    val bucket0 = pipe.calls.headOption match {
      case Some(Call("from", args)) =>
        args.get("bucket").collect { case VStr(b) => b }
      case _ => None
    }
    pipe.calls.tail.foldLeft(frame0)((f, c) => apply(f, c, source, env, bucket0))
  }

  /** The single string literal a predicate pins `r.<name>` to with
    * top-level `==` conjuncts (e.g. `r._field == "status" and ...`),
    * if any — OR branches don't pin (either side may hold).
    */
  private def pinnedEq(e: FluxParser.Expr, name: String): Option[String] = e match {
    case FluxParser.Cmp("==", FluxParser.ColRef(`name`), FluxParser.Lit(VStr(s))) => Some(s)
    case FluxParser.Cmp("==", FluxParser.Lit(VStr(s)), FluxParser.ColRef(`name`)) => Some(s)
    case FluxParser.And(l, r) => pinnedEq(l, name).orElse(pinnedEq(r, name))
    case _ => None
  }

  private def apply(f: FluxFrame, call: Call, source: Source,
      env: Map[String, FluxFrame], bucket: Option[String] = None): FluxFrame =
    call.verb match {
    case "range" =>
      // start/stop accept RFC3339 instants OR now-relative durations
      // (`range(start: -1h)`, the Flux default idiom); stop defaults
      // to now()
      f.range(timeOrRelative(call.args("start"), source),
        call.args.get("stop").map(timeOrRelative(_, source))
          .getOrElse(nsToTimeStr(source.nowNs())))
    case "filter" =>
      val body = lambda(call.args, "fn").body
      val filtered = f.where(predicate(body, f, source))
      // typed `_value`: a filter that pins `r._field == "x"` names ONE
      // field, so `_value` can take that field's real type from the
      // store's schema cache (string/bool/int fields become readable
      // through the text path; Flux itself types columns per-field the
      // same way). Without a pin the frame may span mixed-type fields
      // and `_value` stays the numeric column as before.
      (for {
        b <- bucket
        fld <- pinnedEq(body, "_field")
        kind <- source.fieldType(b, pinnedEq(body, "_measurement"), fld)
        typedCol <- kind match {
          case "string" => Some("value_s")
          case "boolean" => Some("value_b")
          case "integer" => Some("value_i")
          case "unsigned" => Some("value_u")
          case _ => None // float/mixed: keep the numeric column
        }
        if filtered.df.columns.contains(typedCol) &&
          filtered.df.columns.contains(filtered.valueCol)
      } yield filtered.copy(df = filtered.df
        .drop(filtered.valueCol)
        .withColumnRenamed(typedCol, filtered.valueCol)))
        .getOrElse(filtered)
    case "group" =>
      val cols = strArr(call.args, "columns")
      // store frames keep tags in a map — a tag named as a group column
      // materializes as a real column first (reference dialect: every
      // tag IS a column of the table stream)
      val fm = materializeTagCols(f, cols)
      call.args.get("mode") match {
        case Some(VStr("except")) => fm.groupExcept(cols: _*)
        case _ => fm.group(cols: _*)
      }
    case "aggregateWindow" =>
      val fnV = call.args.getOrElse("fn", VIdent("mean"))
      val fn = aggFn(fnV, f.timeCol, call.args)
      val createEmpty = call.args.get("createEmpty").contains(VBool(true))
      val out = f.aggregateWindow(interval(call.args("every")), fn, createEmpty,
        offset = call.args.get("offset").map(interval).getOrElse("0 seconds"),
        location = call.args.get("location").map(str0).orNull)
      // Flux: COUNT of an empty window is 0 (the one aggregate defined
      // on empty tables); every other fn leaves the spine row null
      if (createEmpty && fnV == VIdent("count"))
        out.copy(df = out.df.withColumn(out.valueCol,
          coalesce(col(out.valueCol), lit(0L))))
      else out
    case "window" =>
      f.window(interval(call.args("every")),
        period = call.args.get("period").map(interval).orNull,
        offset = call.args.get("offset").map(interval).getOrElse("0 seconds"))
    // type-conversion verbs: cast _value (Flux toFloat/toInt/toString)
    case "toFloat" => f.mapValue(_.cast("double"))
    case "toInt" => f.mapValue(_.cast("long"))
    case "toString" => f.mapValue(_.cast("string"))
    case "truncateTimeColumn" =>
      f.withCol(f.timeCol, date_trunc(truncUnit(call.args("unit")), col(f.timeCol)))
    case "keep" => f.keep(strArr(call.args, "columns"): _*)
    case "drop" => f.dropCols(strArr(call.args, "columns"): _*)
    case "rename" => call.args("columns") match {
      case VRec(fields) =>
        f.rename(fields.map { case (k, v) => k -> str0(v) }: _*)
      case _ => throw EvalException("rename(columns: {old: \"new\"}) expected")
    }
    case "duplicate" =>
      f.duplicate(str(call.args, "column"), str(call.args, "as"))
    case "set" => f.set(str(call.args, "key"), str(call.args, "value"))
    case "sort" =>
      val desc = call.args.get("desc").contains(VBool(true))
      val names = strArr(call.args, "columns")
      val fm = materializeTagCols(f, names)
      val cols = names.map(c => if (desc) col(c).desc else col(c).asc)
      fm.sort(cols: _*)
    case "limit" =>
      f.limitPerGroup(num(call.args, "n").toInt,
        call.args.get("offset").map(v => num0(v).toInt).getOrElse(0))
    case "tail" => f.tail(num(call.args, "n").toInt)
    case "top" => f.top(num(call.args, "n").toInt)
    case "bottom" => f.bottom(num(call.args, "n").toInt)
    case "sample" => f.sample(num(call.args, "n").toInt,
      call.args.get("pos").map(v => num0(v).toInt).getOrElse(0))
    case "unique" => f.unique(call.args.get("column").map(str0).getOrElse(""))
    case "distinct" =>
      val c = call.args.get("column").map(str0).getOrElse("")
      val fm = if (c.isEmpty) f else materializeTagCols(f, Seq(c))
      FluxFrame(fm.distinctV(c), fm.groupKey, fm.timeCol, if (c.isEmpty) fm.valueCol else c)
    // aggregate verbs (per current group key). Every Flux aggregate
    // takes `column:` (default "_value") — honoring it here re-points
    // the frame's value column BEFORE aggregating, so `sum(column:
    // "other")` aggregates the named column instead of silently
    // summing _value
    case "count" => targeted(f, call.args, (fr, as) => fr.countRows(as))
    case "sum" => targeted(f, call.args, (fr, as) => fr.sumV(as))
    case "mean" => targeted(f, call.args, (fr, as) => fr.meanV(as))
    case "min" => targeted(f, call.args, (fr, as) => fr.minV(as))
    case "max" => targeted(f, call.args, (fr, as) => fr.maxV(as))
    case "median" => targeted(f, call.args, (fr, as) => fr.medianV(as))
    case "mode" => targeted(f, call.args, (fr, as) => fr.modeV(as))
    case "stddev" => targeted(f, call.args, (fr, as) => fr.stddevV(as))
    case "spread" => targeted(f, call.args, (fr, as) => fr.spread(as))
    case "first" => targeted(f, call.args, (fr, as) => fr.firstV(as))
    case "last" => targeted(f, call.args, (fr, as) => fr.lastV(as))
    case "quantile" =>
      // method: "exact_mean" (default here — interpolated percentile)
      // or "estimate_tdigest" → the mergeable sketch path
      // (graft_kll_quantiles; InfluxDB's t-digest analogue).
      val exact = call.args.get("method") match {
        case Some(VStr("estimate_tdigest")) => false
        case _ => true
      }
      targeted(f, call.args,
        (fr, as) => fr.quantile(num(call.args, "q"), exact = exact, as = as))
    case "integral" => f.integral(durSeconds(call.args.getOrElse("unit", VDur(1, "s"))))
    case "timeWeightedAvg" =>
      f.timeWeightedAvg(durSeconds(call.args.getOrElse("unit", VDur(1, "s"))))
    // engine extension (not InfluxDB core): gap-based session index
    case "sessionize" =>
      f.sessionize(durSeconds(call.args.getOrElse("maxGap", VDur(30, "m"))))
    // engine extensions: anomaly detection on the series frame
    case "anomalies" =>
      f.anomalies(call.args.get("k").map(num0).getOrElse(3.0))
    case "cusum" =>
      f.cusum(call.args.get("slack").map(num0).getOrElse(0.5),
        call.args.get("threshold").map(num0).getOrElse(4.0))
    case "decompose" =>
      f.decompose(num(call.args, "period").toInt)
    case "winsorize" =>
      f.winsorize(call.args.get("lo").map(num0).getOrElse(0.01),
        call.args.get("hi").map(num0).getOrElse(0.99))
    case "lttb" => f.lttb(num(call.args, "n").toInt)
    case "bursts" =>
      f.bursts(call.args.get("hi").map(num0).getOrElse(2.0),
        call.args.get("lo").map(num0).getOrElse(0.5))
    case "seasonalBaseline" =>
      f.seasonalBaseline(call.args.get("sigmas").map(num0).getOrElse(3.0))
    // engine extensions: series mining on the grouped frame
    case "acf" =>
      FluxFrame(f.acf(call.args.get("lags").map(num0).getOrElse(10.0).toInt),
        f.groupKey, "lag", "acf")
    case "forecastLinear" =>
      FluxFrame(f.forecastLinear(num(call.args, "h").toInt,
        durSeconds(call.args.getOrElse("every", VDur(1, "h")))),
        f.groupKey, "step", "yhat")
    case "changepoints" =>
      FluxFrame(f.changepoints(), f.groupKey, "t", "cost")
    case "theilSen" =>
      FluxFrame(f.theilSen(
          durSeconds(call.args.getOrElse("every", VDur(1, "d")))),
        f.groupKey, "n_pairs", "med_slope")
    // per-series transforms
    case "derivative" =>
      f.derivative(durSeconds(call.args.getOrElse("unit", VDur(1, "s"))),
        call.args.get("nonNegative").contains(VBool(true)))
    case "difference" => f.difference(
      call.args.get("nonNegative").contains(VBool(true)),
      call.args.get("keepFirst").contains(VBool(true)))
    case "increase" => f.increase()
    case "cumulativeSum" => f.cumulativeSum()
    case "movingAverage" => f.movingAverage(num(call.args, "n").toInt)
    case "timedMovingAverage" => f.timedMovingAverage(durSeconds(call.args("period")).toLong)
    case "exponentialMovingAverage" => f.ema(num(call.args, "n").toInt)
    case "doubleEMA" => f.doubleEma(num(call.args, "n").toInt)
    case "tripleEMA" => f.tripleEma(num(call.args, "n").toInt)
    case "relativeStrengthIndex" => f.rsi(num(call.args, "n").toInt)
    case "tripleExponentialDerivative" => f.trix(num(call.args, "n").toInt)
    case "kaufmansER" => f.kaufmansER(num(call.args, "n").toInt)
    case "chandeMomentumOscillator" => f.chandeMomentum(num(call.args, "n").toInt)
    case "kaufmansAMA" => f.kaufmansAma(num(call.args, "n").toInt)
    case "timeShift" => f.timeShift(interval(call.args("duration")))
    case "elapsed" => f.elapsed(durSeconds(call.args.getOrElse("unit", VDur(1, "s"))))
    case "fill" =>
      if (call.args.get("usePrevious").contains(VBool(true))) f.fillPrevious()
      else f.fill(num(call.args, "value"))
    case "stateCount" =>
      f.stateCount(predicate(lambda(call.args, "fn").body, f, source))
    case "stateDuration" =>
      f.stateDuration(predicate(lambda(call.args, "fn").body, f, source))
    case "map" => call.args("fn") match {
      case VMapLambda(_, fields) =>
        // all field expressions see the ORIGINAL record, like Flux
        // record-with (a sequential fold would feed rewritten columns
        // into later fields)
        f.copy(df = f.df.withColumns(
          fields.map { case (n, e) => n -> operand(e, f, source) }.toMap))
      case other => throw EvalException(s"map expects (r) => ({ r with ... }), got $other")
    }
    case "highestMax" => f.highestMax(num(call.args, "n").toInt)
    case "highestAverage" => f.highestAverage(num(call.args, "n").toInt)
    case "highestCurrent" => f.highestCurrent(num(call.args, "n").toInt)
    case "lowestMin" => f.lowestMin(num(call.args, "n").toInt)
    case "lowestAverage" => f.lowestAverage(num(call.args, "n").toInt)
    case "lowestCurrent" => f.lowestCurrent(num(call.args, "n").toInt)
    case "covariance" =>
      val cols = strArr(call.args, "columns")
      if (cols.size != 2) throw EvalException("covariance(columns: [x, y]) expects two columns")
      if (call.args.get("pearsonr").contains(VBool(true))) f.pearsonr(cols(0), cols(1))
      else f.covariance(cols(0), cols(1))
    // influxdata/influxdb/monitor package (SURVEY §2B's last row): row
    // classification into v2's `_level` status schema + the transition
    // filter over it. Predicates are plain row lambdas — the same
    // machinery as filter(fn:).
    case "monitor.check" =>
      def levelPred(k: String): Option[Column] = call.args.get(k).map {
        case VLambda(_, body) => predicate(body, f, source)
        case other => throw EvalException(s"monitor.check $k expects a predicate lambda, got $other")
      }
      val checkName = call.args.get("data") match {
        case Some(VRec(fields)) =>
          fields.collectFirst { case ("_check_name", VStr(s)) => s }.getOrElse("check")
        case _ => "check"
      }
      f.monitorCheck(levelPred("crit"), levelPred("warn"), levelPred("info"),
        levelPred("ok"), checkName)
    case "monitor.deadman" =>
      f.monitorDeadman(to_timestamp(lit(
        timeOrRelative(call.args.getOrElse("t",
          throw EvalException("monitor.deadman requires t:")), source))))
    case "monitor.stateChanges" =>
      f.monitorStateChanges(
        call.args.get("fromLevel").map(str0).getOrElse("any"),
        call.args.get("toLevel").map(str0).getOrElse("any"))
    case "monitor.stateChangesOnly" =>
      f.monitorStateChanges("any", "any")
    // join package method variants (`import "join"`, post-2.0.9 Flux —
    // what current Grafana emits): the piped-in frame is the left side
    // unless `left:` names a table variable.
    case v if v.startsWith("join.") =>
      joinPackage(Some(f), v, call.args, env)
    case "keys" =>
      // group-key column names as a _value listing (Flux's keys())
      val spark = f.df.sparkSession
      import spark.implicits._
      FluxFrame(f.groupKey.sorted.toDF("_value"), Nil, "_value", "_value")
    case "columns" =>
      val spark = f.df.sparkSession
      import spark.implicits._
      FluxFrame(f.df.columns.sorted.toSeq.toDF("_value"), Nil, "_value", "_value")
    case "hourSelection" =>
      f.hourSelection(num(call.args, "start").toInt, num(call.args, "stop").toInt)
    case "interpolate" | "interpolateLinear" =>
      f.interpolateLinear(durSeconds(call.args("every")).toLong)
    case "holtWinters" =>
      val fc = num(call.args, "n").toInt
      val season = num(call.args, "seasonality").toInt
      val out = f.holtWinters(fc, season)
      FluxFrame(out, Seq("_hw_key"), f.timeCol, "fitted")
    case "histogram" =>
      val bins = call.args.get("bins") match {
        case Some(VArr(items)) => items.map(num0)
        case other => throw EvalException(s"histogram(bins: [..]) expected, got $other")
      }
      FluxFrame(f.histogram(bins), f.groupKey, "le", "_value")
    case "histogramQuantile" =>
      val q = num(call.args, "quantile")
      FluxFrame(f.histogramQuantile(q), f.groupKey,
        f.groupKey.headOption.getOrElse("_value"), "_value")
    case "pivot" =>
      val rowKey = strArr(call.args, "rowKey")
      val colKeys = strArr(call.args, "columnKey")
      if (colKeys.size != 1)
        throw EvalException("pivot supports exactly one columnKey column")
      val valueColumn = str(call.args, "valueColumn")
      val wide = FluxFrame(f.df, f.groupKey, f.timeCol, valueColumn)
        .pivot(rowKey, colKeys.head)
      val tc = if (rowKey.contains(f.timeCol)) f.timeCol else rowKey.head
      FluxFrame(wide, rowKey, tc, rowKey.head)
    case "reduce" =>
      (call.args.get("fn"), call.args.get("identity")) match {
        case (Some(VReduceLambda(_, _, fields)), Some(VRec(idFields))) =>
          val identity = idFields.map { case (k, v) => k -> num0(v) }
          val accIdx = identity.map(_._1).zipWithIndex.toMap
          def compile(e: Expr): (Array[Double], org.apache.spark.sql.Row) => Double = e match {
            case Lit(VNum(d)) => (_, _) => d
            case ColRef(c) => (_, r) => r.get(r.fieldIndex(c)) match {
              case n: java.lang.Number => n.doubleValue()
              case _ => Double.NaN
            }
            case AccRef(n) =>
              val i = accIdx.getOrElse(n,
                throw EvalException(s"unknown accumulator field '$n'"))
              (a, _) => a(i)
            case Arith(op, l, r) =>
              val (lf, rf) = (compile(l), compile(r))
              op match {
                case "+" => (a, row) => lf(a, row) + rf(a, row)
                case "-" => (a, row) => lf(a, row) - rf(a, row)
                case "*" => (a, row) => lf(a, row) * rf(a, row)
                case "/" => (a, row) => lf(a, row) / rf(a, row)
                case "%" => (a, row) => lf(a, row) % rf(a, row)
                case o => throw EvalException(s"unsupported arithmetic '$o'")
              }
            // `if accumulator.count > 0 then … else …` — Flux allows
            // conditionals over the accumulator inside reduce bodies
            case Cond(c, x, y) =>
              val (cf, xf, yf) = (compileB(c), compile(x), compile(y))
              (a, row) => if (cf(a, row)) xf(a, row) else yf(a, row)
            case other => throw EvalException(s"unsupported reduce expression $other")
          }
          def compileB(e: Expr): (Array[Double], org.apache.spark.sql.Row) => Boolean = e match {
            case Cmp(op, l, r) =>
              val (lf, rf) = (compile(l), compile(r))
              op match {
                case "==" => (a, row) => lf(a, row) == rf(a, row)
                case "!=" => (a, row) => lf(a, row) != rf(a, row)
                case ">"  => (a, row) => lf(a, row) > rf(a, row)
                case "<"  => (a, row) => lf(a, row) < rf(a, row)
                case ">=" => (a, row) => lf(a, row) >= rf(a, row)
                case "<=" => (a, row) => lf(a, row) <= rf(a, row)
                case o => throw EvalException(s"unsupported reduce comparison '$o'")
              }
            case And(l, r) =>
              val (lf, rf) = (compileB(l), compileB(r)); (a, row) => lf(a, row) && rf(a, row)
            case Or(l, r) =>
              val (lf, rf) = (compileB(l), compileB(r)); (a, row) => lf(a, row) || rf(a, row)
            case Not(x) =>
              val xf = compileB(x); (a, row) => !xf(a, row)
            case other => throw EvalException(s"unsupported reduce predicate $other")
          }
          val fieldFns = fields.toMap.map { case (k, e) => k -> compile(e) }
          // accumulator layout = identity order; a field the fn doesn't
          // rewrite keeps its previous value
          val stepFns = identity.map { case (n, _) =>
            fieldFns.getOrElse(n,
              (a: Array[Double], _: org.apache.spark.sql.Row) => a(accIdx(n)))
          }.toArray
          val out = f.reduce(identity, (acc, row) => stepFns.map(fn => fn(acc, row)))
          FluxFrame(out, f.groupKey,
            f.groupKey.headOption.getOrElse(identity.head._1), identity.head._1)
        case _ => throw EvalException(
          "reduce expects fn: (r, accumulator) => ({...}) and identity: {...}")
      }
    // to(bucket:) — materialize the piped table into a bucket and pass
    // it through unchanged (the canonical InfluxDB task body:
    // `from |> aggregateWindow |> to`). The frame's Flux-namespace
    // columns reverse-map to storage names; `time_ns` is derived from
    // the µs time axis when the pipeline aggregated it away.
    case "to" =>
      val bucket = str(call.args, "bucket")
      val sink = source.write.getOrElse(throw EvalException(
        "to(bucket:) is not available on this query surface (no write sink)"))
      // typed `_value`: the field-pinned filter (see the filter case)
      // can hand this frame a string/bool/int `_value`; the generic
      // reverse rename would drop it into the FLOAT store column,
      // where the write casts it to null. Route it by dataType to the
      // matching typed store column instead — ints land in value_i
      // (Flux to() writes integers as integer fields; unsigned needs
      // an explicit uint cast there too).
      val df0: DataFrame =
        if (source.rename.get("_value").contains("value_f") &&
            f.toDF.columns.contains("_value")) {
          import org.apache.spark.sql.types._
          val d = f.toDF
          d.schema("_value").dataType match {
            case StringType => d.withColumnRenamed("_value", "value_s")
            case BooleanType => d.withColumnRenamed("_value", "value_b")
            case IntegerType | LongType =>
              d.withColumn("_value", col("_value").cast("long"))
                .withColumnRenamed("_value", "value_i")
            case DoubleType => d
            case FloatType => d.withColumn("_value", col("_value").cast("double"))
            case other => throw EvalException(
              s"to(): cannot write _value of type ${other.simpleString}")
          }
        } else f.toDF
      // monitor.check output → the statuses write shape: the status
      // dimensions ride as TAGS (v2 stores _level/_check_name/_type/
      // _source_measurement as tags on the statuses measurement), so
      // they survive the canonical-schema projection and read back
      // queryable from the status bucket. Keyed on BOTH `_level` AND
      // `_check_name` being present — the pair only monitor.check
      // produces — so user data that coincidentally carries a `_level`
      // column is not silently folded into tags (r13 ADVICE).
      val df1 =
        if (!(df0.columns.contains("_level") && df0.columns.contains("_check_name"))) df0
        else {
          val statusTags = Seq("_level", "_check_name", "_type",
            "_source_measurement").filter(df0.columns.contains)
          val tagMap = map(statusTags.flatMap(c =>
            Seq(lit(c), coalesce(col(c).cast("string"), lit("")))): _*)
          val merged =
            if (df0.columns.contains("tags")) map_concat(col("tags"), tagMap)
            else tagMap
          df0.withColumn("tags", merged).drop(statusTags: _*)
        }
      val back = source.rename.foldLeft(df1) {
        case (d, (flux, actual)) if d.columns.contains(flux) && !d.columns.contains(actual) =>
          d.withColumnRenamed(flux, actual)
        case (d, _) => d
      }
      val withNs =
        if (back.columns.contains("time_ns") || !back.columns.contains("time")) back
        else back.withColumn("time_ns", unix_micros(col("time")) * 1000L)
      sink(bucket, withNs)
      f
    case "yield" => f // naming marker
    case other => throw EvalException(s"unsupported verb '$other'")
  }

  private def ref(name: String, env: Map[String, FluxFrame]): FluxFrame =
    env.getOrElse(name, throw EvalException(s"undefined table variable '$name'"))

  /** Honors an aggregate verb's `column:` argument (Flux default
    * "_value"): re-points the frame's value column and, like Flux,
    * keeps the OUTPUT under the same name; an unknown name fails the
    * verb loudly rather than silently aggregating _value.
    */
  private def targeted(f: FluxFrame, args: Map[String, Value],
      g: (FluxFrame, String) => FluxFrame): FluxFrame =
    args.get("column").map(str0) match {
      case None => g(f, "_value")
      case Some(c) =>
        if (!f.df.columns.contains(c))
          throw EvalException(s"aggregate column '$c' does not exist")
        g(f.copy(valueCol = c), c)
    }

  // --- predicate translation: Flux lambda AST → Catalyst Column

  /** Column reference resolution, TAG-AWARE over the store source: the
    * reference engine's table stream exposes every tag as a string
    * column (`r.host`), while the store frame keeps tags in a MAP —
    * a name that is not a flat column resolves through the map. Flat
    * columns win (a tag shadowed by a real column behaves like the
    * flattened shape), and dotted paths (`r.tags.host`) keep their
    * explicit meaning via their head segment. Found by the r18 service
    * soak: tag filters/grouping over `/api/v2/query` previously raised
    * UNRESOLVED_COLUMN — a dialect gap, since gates run on flat
    * parquet frames where tags are already columns.
    */
  private def resolveCol(f: FluxFrame, c: String): Column =
    if (f.df.columns.contains(c.split('.').head)) col(c)
    else if (f.df.columns.contains("tags")) col("tags").getItem(c)
    else col(c) // unresolved: let Spark name the missing column

  /** Materialize tag-map members as real columns for verbs that take
    * COLUMN NAMES (`group`, `sort`, `distinct`): grouping by a map
    * lookup expression would lose the name the output schema needs.
    */
  private def materializeTagCols(f: FluxFrame, names: Seq[String]): FluxFrame =
    names.foldLeft(f) { (acc, c) =>
      if (!acc.df.columns.contains(c) && acc.df.columns.contains("tags"))
        acc.copy(df = acc.df.withColumn(c, col("tags").getItem(c)))
      else acc
    }

  private def predicate(e: Expr, f: FluxFrame, source: Source): Column = e match {
    case And(l, r) => predicate(l, f, source) && predicate(r, f, source)
    case Or(l, r) => predicate(l, f, source) || predicate(r, f, source)
    case Not(x) => !predicate(x, f, source)
    case Exists(x) => x match {
      // Flux `exists r.col` is false for a MISSING member, not a plan
      // error — a pivot over a range with no rows of some measurement
      // simply never emits that column, and `exists` must then drop
      // the rows, not fail the query with an AnalysisException.
      // Over the store frame a non-column name may still be a TAG:
      // exists then means "this row carries the tag" (map lookup).
      case ColRef(c) if !f.df.columns.contains(c.split('.').head) =>
        if (f.df.columns.contains("tags")) col("tags").getItem(c).isNotNull
        else lit(false)
      case _ => operand(x, f, source).isNotNull
    }
    case Cmp(op, lhs, rhs) =>
      val l = operand(lhs, f, source)
      (op, rhs) match {
        case ("=~", Regex(p)) => l.rlike(p)
        case ("!~", Regex(p)) => !l.rlike(p)
        case _ =>
          val r = operand(rhs, f, source)
          op match {
            case "==" => l === r
            case "!=" => l =!= r
            case ">"  => l > r
            case "<"  => l < r
            case ">=" => l >= r
            case "<=" => l <= r
            case o => throw EvalException(s"unsupported comparison '$o'")
          }
      }
    case ColRef(c) => resolveCol(f, c) // bare boolean column
    // boolean-returning stdlib calls used AS the predicate
    // (strings.hasPrefix, regexp.matchRegexpString, math.isNaN, …)
    case fc: FnCall => operand(fc, f, source)
    case other => throw EvalException(s"unsupported predicate $other")
  }

  private def operand(e: Expr, f: FluxFrame, source: Source): Column = e match {
    case ColRef(c) => resolveCol(f, c)
    case Lit(VStr(s)) => lit(s)
    case Lit(VNum(d)) => lit(d)
    case Lit(VBool(b)) => lit(b)
    case Lit(VTime(t)) => to_timestamp(lit(t.replace("T", " ").stripSuffix("Z")))
    case Arith(op, l, r) =>
      val (lc, rc) = (operand(l, f, source), operand(r, f, source))
      op match {
        case "+" => lc + rc
        case "-" => lc - rc
        case "*" => lc * rc
        case "/" => lc / rc
        case "%" => lc % rc
        case o => throw EvalException(s"unsupported arithmetic '$o'")
      }
    case Cond(c, a, b) =>
      when(predicate(c, f, source), operand(a, f, source))
        .otherwise(operand(b, f, source))
    case FnCall(name, args) => stdlibCall(name, args, f, source)
    // boolean expressions as VALUES: map fields and conversion args may
    // be predicates (`hot: r._value > 50.0`, `string(v: r.a == r.b)`)
    case b @ (Cmp(_, _, _) | And(_, _) | Or(_, _) | Not(_) | Exists(_)) =>
      predicate(b, f, source)
    case other => throw EvalException(s"unsupported operand $other")
  }

  /** Flux stdlib scalar calls inside `map()`/`filter()` lambda bodies —
    * the everyday Grafana query shape (unit conversions, string
    * munging, time bucketing inside `map()`). Every name maps to a
    * codegen'd Spark built-in per SURVEY §2B's scalar-package table, so
    * the translated expression stays inside whole-stage codegen exactly
    * like the DSL path. Dispatch is by the reference stdlib's own
    * names and NAMED argument spellings (`math.pow(x:, y:)`,
    * `strings.substring(v:, start:, end:)`, `date.hour(t:)`); an
    * unknown name throws the loud eval error a spec pins.
    *
    * Documented divergences from Go-stdlib corner semantics:
    * `strings.strlen` counts like Spark `length` (code points; equal on
    * BMP text), `string(v: time)` formats whole-second RFC3339 (the
    * engine's µs axis zero-pads sub-second as Flux does only when
    * non-zero), `strings.index` returns a CHARACTER index (Spark
    * `instr`) where Go `strings.Index` returns a BYTE offset — equal
    * on ASCII, smaller on multi-byte UTF-8 — and `strings.substring`
    * slices by code point where Flux slices by rune (equal; both
    * diverge from byte slicing on non-ASCII), and `strings.title` is
    * not offered (Go's rune-title
    * rules have no codegen'd Spark analogue — initcap lowercases the
    * tail, a silent wrong answer; users get the loud error instead).
    */
  private def stdlibCall(name: String, args: Seq[(String, FluxParser.Expr)],
      f: FluxFrame, source: Source): Column = {
    val argMap = args.toMap
    def e(k: String): Expr = argMap.getOrElse(k,
      throw EvalException(s"$name: missing argument '$k:'"))
    def a(k: String): Column = operand(e(k), f, source)
    def litStr(k: String): String = e(k) match {
      case Lit(VStr(s)) => s
      case other => throw EvalException(s"$name: '$k:' must be a string literal, got $other")
    }
    // regex-typed args (`r:` in the regexp package): a /pattern/ literal
    // or a plain string literal, both static — Spark's rlike/regexp_*
    // compile the pattern once per task either way
    def rx(k: String): String = e(k) match {
      case Regex(p) => p
      case Lit(VStr(s)) => s
      case other => throw EvalException(s"$name: '$k:' must be a regex literal, got $other")
    }
    def quote(s: String): String = java.util.regex.Pattern.quote(s)
    // conversions branch on the argument's RESOLVED type (Flux `int(v:
    // time)` is ns-since-epoch, `int(v: float)` truncates): resolving
    // one projected column against the frame is plan-time-only work
    def dt(k: String): org.apache.spark.sql.types.DataType =
      f.df.select(a(k)).schema.head.dataType
    import org.apache.spark.sql.types._
    name match {
      // ---- math package (Go-math named args: x/y, hypot p/q, isNaN f)
      case "math.abs" => abs(a("x"))
      case "math.sqrt" => sqrt(a("x"))
      case "math.cbrt" => cbrt(a("x"))
      case "math.exp" => exp(a("x"))
      case "math.exp2" => pow(lit(2.0), a("x"))
      case "math.expm1" => expm1(a("x"))
      case "math.log" => log(a("x"))
      case "math.log2" => log2(a("x"))
      case "math.log10" => log10(a("x"))
      case "math.log1p" => log1p(a("x"))
      // floor/ceil return LONG in Spark; Flux math.* stays float
      case "math.floor" => floor(a("x")).cast("double")
      case "math.ceil" => ceil(a("x")).cast("double")
      // Spark round = HALF_UP = away-from-zero on halves, same as Go
      case "math.round" => round(a("x")).cast("double")
      case "math.trunc" =>
        val x = a("x"); when(x >= 0, floor(x)).otherwise(ceil(x)).cast("double")
      case "math.sin" => sin(a("x"))
      case "math.cos" => cos(a("x"))
      case "math.tan" => tan(a("x"))
      case "math.asin" => asin(a("x"))
      case "math.acos" => acos(a("x"))
      case "math.atan" => atan(a("x"))
      case "math.atan2" => atan2(a("y"), a("x"))
      case "math.sinh" => sinh(a("x"))
      case "math.cosh" => cosh(a("x"))
      case "math.tanh" => tanh(a("x"))
      case "math.pow" => pow(a("x"), a("y"))
      case "math.hypot" => hypot(a("p"), a("q"))
      case "math.mMax" => greatest(a("x"), a("y"))
      case "math.mMin" => least(a("x"), a("y"))
      // Go math.Mod takes the dividend's sign — Spark % agrees
      case "math.mod" => a("x") % a("y")
      case "math.isNaN" => isnan(a("f"))
      // ---- strings package (main arg v:)
      case "strings.toUpper" => upper(a("v"))
      case "strings.toLower" => lower(a("v"))
      case "strings.trimSpace" => trim(a("v"))
      case "strings.trim" => trim(a("v"), litStr("cutset"))
      case "strings.trimLeft" => ltrim(a("v"), litStr("cutset"))
      case "strings.trimRight" => rtrim(a("v"), litStr("cutset"))
      case "strings.trimPrefix" =>
        regexp_replace(a("v"), "^" + quote(litStr("prefix")), "")
      case "strings.trimSuffix" =>
        regexp_replace(a("v"), quote(litStr("suffix")) + "$", "")
      // literal (non-regex) replace-all — Spark's replace()
      case "strings.replaceAll" => replace(a("v"), a("t"), a("u"))
      case "strings.strlen" => length(a("v")).cast("long")
      // Flux substring: 0-based, end-exclusive → Spark 1-based substr
      case "strings.substring" =>
        a("v").substr(a("start").cast("int") + 1,
          (a("end") - a("start")).cast("int"))
      case "strings.containsStr" => a("v").contains(a("substr"))
      case "strings.hasPrefix" => a("v").startsWith(a("prefix"))
      case "strings.hasSuffix" => a("v").endsWith(a("suffix"))
      // Flux index: -1 when absent; instr's 0-when-absent shifts to it
      case "strings.index" => (instr(a("v"), litStr("substr")) - 1).cast("long")
      case "strings.repeat" => e("i") match {
        case Lit(VNum(n)) => repeat(a("v"), n.toInt)
        case other => throw EvalException(s"strings.repeat: 'i:' must be an integer literal, got $other")
      }
      // ---- regexp package
      case "regexp.matchRegexpString" => a("v").rlike(rx("r"))
      case "regexp.replaceAllString" => regexp_replace(a("v"), rx("r"), litStr("t"))
      case "regexp.findString" => regexp_extract(a("v"), rx("r"), 0)
      // ---- date package (arg t:) — Flux returns ints
      case "date.year" => year(a("t")).cast("long")
      case "date.month" => month(a("t")).cast("long")
      case "date.monthDay" => dayofmonth(a("t")).cast("long")
      // Flux weekDay: Sunday = 0; Spark dayofweek: Sunday = 1
      case "date.weekDay" => (dayofweek(a("t")) - 1).cast("long")
      case "date.yearDay" => dayofyear(a("t")).cast("long")
      case "date.hour" => hour(a("t")).cast("long")
      case "date.minute" => minute(a("t")).cast("long")
      case "date.second" => second(a("t")).cast("long")
      case "date.truncate" => e("unit") match {
        case Lit(d: VDur) => date_trunc(truncUnit(d), a("t"))
        case other => throw EvalException(s"date.truncate: 'unit:' must be a duration literal, got $other")
      }
      // ---- type conversions (bare calls, arg v:)
      case "float" => a("v").cast("double")
      case "int" | "uint" => dt("v") match {
        // Flux int(v: time) = ns since epoch (the engine's time axis
        // is µs-resolution, so the tail is zeros)
        case TimestampType | TimestampNTZType =>
          unix_micros(a("v").cast("timestamp")) * lit(1000L)
        // float → int truncates toward zero in both (cast semantics)
        case _ => a("v").cast("long")
      }
      case "string" => dt("v") match {
        // RFC3339, like Flux (session clock is pinned UTC)
        case TimestampType | TimestampNTZType =>
          date_format(a("v"), "yyyy-MM-dd'T'HH:mm:ss'Z'")
        case _ => a("v").cast("string")
      }
      case "bool" => a("v").cast("boolean")
      case "time" => dt("v") match {
        // numeric input is ns since epoch; the µs axis floors it.
        // Integral `div`, NOT Column./ — epoch-ns (~1.7e18) exceeds
        // double's exact-integer range, so float division would land
        // on the wrong microsecond. (Caveat on the TEXT surface:
        // numeric literals are doubles, so ns ARITHMETIC like
        // `int(v: r._time) + 3600000000000.0` coerces through double —
        // exact only while the operands stay on a ≥512 ns grid, which
        // whole-second timestamps and whole-second shifts do. Sub-µs
        // text arithmetic should go through timeShift/duration verbs.)
        // `div` truncates toward zero, which for pre-1970 (negative)
        // ns would round UP; subtracting pmod (always in [0,1000))
        // first makes it a true floor on both sides of the epoch.
        case LongType | IntegerType | DoubleType =>
          val ns = a("v").cast("long")
          timestamp_micros(call_function("div",
            ns - pmod(ns, lit(1000L)), lit(1000L)))
        case _ => a("v").cast("timestamp")
      }
      // durations are ns counts on this surface (SURVEY §2B conv table)
      case "duration" => a("v").cast("long")
      // universe-package membership test — the Grafana multi-select
      // template shape `filter(fn: (r) => contains(value: r.x, set:
      // ${var:json}))`; translates to isin, which Catalyst pushes to
      // the scan as an IN filter
      case "contains" => e("set") match {
        case Lit(VArr(items)) =>
          val vals: Seq[Any] = items.map {
            case VStr(s) => s
            case VNum(d) => d
            case VBool(b) => b
            case other => throw EvalException(
              s"contains: set elements must be literals, got $other")
          }
          a("value").isin(vals: _*)
        case other => throw EvalException(
          s"contains: 'set:' must be an array literal, got $other")
      }
      case other => throw EvalException(
        s"unsupported function '$other(…)' in expression (supported: math.*, " +
          "strings.*, regexp.*, date.*, float/int/uint/string/bool/time/duration)")
    }
  }

  // --- helpers

  /** `aggregateWindow(fn:)` verb table — the full set the DSL verbs
    * cover (VERDICT r13 #2 closed the text/DSL asymmetry): selectors
    * `first`/`last` aggregate as min_by/max_by over the frame's raw
    * time column (visible inside the window groupBy — single-pass
    * partial aggregates, no second shuffle). Duplicate-timestamp
    * tie-break: the ordering key is struct(time, value), so ties on
    * time resolve to the smallest (`first`) / largest (`last`) VALUE —
    * deterministic under any partitioning, where Flux resolves by
    * table order (a property a shuffled engine cannot reproduce
    * without materializing an ingest-order column; documented
    * divergence, r14 ADVICE). `mode`/`spread` mirror
    * [[FluxFrame.modeV]]/[[FluxFrame.spread]], and `quantile` reads its
    * `q:`/`method:` from the aggregateWindow call itself (Flux passes
    * them by currying `quantile`; named args on the window call are
    * this surface's spelling) — `estimate_tdigest` routes to the
    * engine's mergeable KLL sketch like the bare quantile verb.
    */
  private def aggFn(v: Value, timeCol: String,
      args: Map[String, Value]): Column => Column = v match {
    case VIdent("mean") => avg
    case VIdent("sum") => sum
    case VIdent("count") => count
    case VIdent("min") => min
    case VIdent("max") => max
    case VIdent("median") => c => percentile(c, lit(0.5))
    case VIdent("stddev") => stddev_samp
    case VIdent("first") => c => min_by(c, struct(col(timeCol), c))
    case VIdent("last") => c => max_by(c, struct(col(timeCol), c))
    case VIdent("mode") => c => mode(c)
    case VIdent("spread") => c => max(c) - min(c)
    case VIdent("quantile") =>
      val q = args.get("q").map(num0).getOrElse(
        throw EvalException("aggregateWindow(fn: quantile) requires q:"))
      args.get("method") match {
        case Some(VStr("estimate_tdigest")) =>
          c => element_at(call_function("graft_kll_quantiles",
            c, array(lit(q)), lit(1024)), 1)
        case _ => c => percentile(c, lit(q))
      }
    case other => throw EvalException(s"unsupported aggregate fn $other")
  }

  /** Flux truncateTimeColumn(unit: 1h) durations → date_trunc fields
    * (truncation only makes sense on whole calendar units).
    */
  private def truncUnit(v: Value): String = v match {
    case VDur(1, "s") => "second"
    case VDur(1, "m") => "minute"
    case VDur(1, "h") => "hour"
    case VDur(1, "d") => "day"
    case VDur(1, "w") => "week"
    case other => throw EvalException(
      s"truncateTimeColumn expects a unit duration (1s/1m/1h/1d/1w), got $other")
  }

  private def interval(v: Value): String = v match {
    case VDur(n, "ns") => s"${n / 1000} microseconds"
    case VDur(n, "us") => s"$n microseconds"
    case VDur(n, "ms") => s"$n milliseconds"
    case VDur(n, "s") => s"$n seconds"
    case VDur(n, "m") => s"$n minutes"
    case VDur(n, "h") => s"$n hours"
    case VDur(n, "d") => s"$n days"
    case VDur(n, "w") => s"${n * 7} days"
    // calendar units: only aggregateWindow(every:) understands these
    // (epoch-aligned month buckets); fixed-width consumers reject the
    // "months" spelling with their own errors
    case VDur(n, "mo") => s"$n months"
    case VDur(n, "y") => s"${n * 12} months"
    case other => throw EvalException(s"expected duration, got $other")
  }

  private def durSeconds(v: Value): Double = v match {
    case VDur(n, "ns") => n / 1e9
    case VDur(n, "us") => n / 1e6
    case VDur(n, "ms") => n / 1e3
    case VDur(n, "s") => n.toDouble
    case VDur(n, "m") => n * 60.0
    case VDur(n, "h") => n * 3600.0
    case VDur(n, "d") => n * 86400.0
    case VDur(n, "w") => n * 604800.0
    case other => throw EvalException(s"expected duration, got $other")
  }

  /** join-package evaluation (join.inner/left/right/full/time): resolve
    * both sides, extract equi-keys from the `on` two-param lambda
    * (conjunctions of `l.k == r.k`; ColRef binds left, AccRef right) or
    * a plain column array, align unequal right-side key names onto the
    * left's, and delegate to [[FluxFrame.joinOn]] — one keyed shuffle,
    * Catalyst free to broadcast the small side. `join.time` adds the
    * time column to the key set (the stdlib's equality-on-_time join).
    */
  private def joinPackage(piped: Option[FluxFrame], verb: String,
      args: Map[String, Value], env: Map[String, FluxFrame]): FluxFrame = {
    val method = verb.stripPrefix("join.")
    val how = method match {
      case "time" => "inner"
      case "inner" | "left" | "right" | "full" => method
      case other => throw EvalException(s"unsupported join method '$other'")
    }
    def side(k: String): Option[FluxFrame] = args.get(k).map {
      case VIdent(x) => ref(x, env)
      case other => throw EvalException(s"join.$method $k expects a table variable, got $other")
    }
    val left = side("left").orElse(piped).getOrElse(
      throw EvalException(s"join.$method needs a left side (piped in or left:)"))
    val right = side("right").getOrElse(
      throw EvalException(s"join.$method requires right: <table>"))
    def equiPairs(e: Expr): Seq[(String, String)] = e match {
      case And(a, b) => equiPairs(a) ++ equiPairs(b)
      case Cmp("==", ColRef(lk), AccRef(rk)) => Seq(lk -> rk)
      case Cmp("==", AccRef(rk), ColRef(lk)) => Seq(lk -> rk)
      case other => throw EvalException(
        s"join.$method on-lambda must be a conjunction of l.k == r.k, got $other")
    }
    val pairs: Seq[(String, String)] = args.get("on") match {
      case Some(VLambda2(_, _, body)) => equiPairs(body)
      case Some(VArr(items)) => items.map(str0).map(k => k -> k)
      case None if method == "time" => Nil
      case _ => throw EvalException(
        s"join.$method requires on: (l, r) => l.k == r.k … or on: [cols]")
    }
    // join.full's `as:` merge function (stdlib: resolves the two sides'
    // values into one record) is a per-row lambda over BOTH records —
    // not implemented; reject loudly rather than silently leaving the
    // unmerged null-padded shape (r13 ADVICE).
    if (method == "full" && args.contains("as"))
      throw EvalException(
        "join.full(as:) is not supported — project/coalesce the columns after the join instead")
    val rightAligned0 = pairs.filter { case (lk, rk) => lk != rk }
      .foldLeft(right) { case (r, (lk, rk)) => r.rename(rk -> lk) }
    // join.time equi-joins on the TIME column: align the right frame's
    // own time column onto the left's name first — the two sides may
    // name their axes differently, and without the rename the join
    // either fails unresolved or, worse, matches a coincidentally
    // same-named non-time column (r13 ADVICE).
    val rightAligned =
      if (method == "time" && rightAligned0.timeCol != left.timeCol &&
          rightAligned0.df.columns.contains(rightAligned0.timeCol))
        rightAligned0.rename(rightAligned0.timeCol -> left.timeCol)
      else rightAligned0
    val keys = pairs.map(_._1) ++ (if (method == "time") Seq(left.timeCol) else Nil)
    left.joinOn(rightAligned, keys.distinct, how)
  }

  private def lambda(args: Map[String, Value], k: String): VLambda = args(k) match {
    case l: VLambda => l
    case other => throw EvalException(s"expected lambda for '$k', got $other")
  }
  private def str(args: Map[String, Value], k: String): String = str0(
    args.getOrElse(k, throw EvalException(s"missing argument '$k'")))
  private def str0(v: Value): String = v match {
    case VStr(s) => s
    case other => throw EvalException(s"expected string, got $other")
  }
  private def strArr(args: Map[String, Value], k: String): Seq[String] =
    args.getOrElse(k, throw EvalException(s"missing argument '$k'")) match {
      case VArr(items) => items.map(str0)
      case other => throw EvalException(s"expected array, got $other")
    }
  private def num(args: Map[String, Value], k: String): Double =
    num0(args.getOrElse(k, throw EvalException(s"missing argument '$k'")))
  private def num0(v: Value): Double = v match {
    case VNum(d) => d
    case other => throw EvalException(s"expected number, got $other")
  }
  private def timeStr(args: Map[String, Value], k: String): String =
    args.getOrElse(k, throw EvalException(s"missing argument '$k'")) match {
      case VTime(t) => t.replace("T", " ").stripSuffix("Z")
      case VStr(s) => s
      case other => throw EvalException(s"expected time for '$k', got $other")
    }

  private val relUnitNs = Map("ns" -> 1L, "us" -> 1000L, "ms" -> 1000000L,
    "s" -> 1000000000L, "m" -> 60L * 1000000000L, "h" -> 3600L * 1000000000L,
    "d" -> 86400L * 1000000000L, "w" -> 7L * 86400L * 1000000000L)

  private def nsToTimeStr(ns: Long): String = {
    val inst = java.time.Instant.ofEpochSecond(
      Math.floorDiv(ns, 1000000000L), Math.floorMod(ns, 1000000000L))
    inst.toString.replace("T", " ").stripSuffix("Z")
  }

  private def timeOrRelative(v: Value, source: Source): String = v match {
    case VTime(t) => t.replace("T", " ").stripSuffix("Z")
    case VStr(s) => s
    case VDur(amount, unit) =>
      val ns = relUnitNs.getOrElse(unit, throw EvalException(
        s"calendar duration '$unit' is not valid in a relative range " +
          "(month/year arithmetic is calendar-dependent; use an absolute time)"))
      nsToTimeStr(source.nowNs() + amount * ns)
    case other => throw EvalException(s"expected time or duration, got $other")
  }
}
