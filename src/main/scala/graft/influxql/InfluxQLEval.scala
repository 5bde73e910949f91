package graft.influxql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Evaluator: InfluxQL AST → DataFrame plans (the v1 compat surface of
  * the pinned engine). Pure plan construction like [[graft.flux.FluxEval]]
  * — Catalyst gets the same pushdown/pruning/AQE opportunities whether a
  * query arrives as InfluxQL text, Flux text, or DSL calls.
  */
object InfluxQLEval {
  import InfluxQL._

  /** Measurement resolver + schema surface for SHOW queries.
    *
    * `resolve` returns a frame with `timeCol` (TimestampType) plus field
    * and tag columns; a store-backed frame may carry tags as a `tags`
    * map column — [[ref]] falls through to it.
    */
  final case class Source(
      resolve: String => DataFrame,
      timeCol: String = "time",
      measurements: () => DataFrame = null,
      tagKeys: Option[String] => DataFrame = null,
      fieldKeys: Option[String] => DataFrame = null,
      /** Measurement-name listing for `FROM /regex/` and un-FROM-ed
        * SHOW TAG VALUES. Catalog-scale metadata (the list IS part of
        * the query plan, like Spark's own pivot-value inference) — not
        * a data-path materialization.
        */
      measurementNames: () => Seq[String] = null,
      /** Driver-side tag-key listing for plan-time expansion
        * (`GROUP BY *`, `SHOW TAG VALUES WITH KEY =~`). Store-backed
        * sources serve this from the catalog's mutation-versioned cache
        * so repeated queries don't re-run a distinct scan; when null,
        * the evaluator falls back to collecting [[tagKeys]].
        */
      tagKeyList: Option[String] => Seq[String] = null,
      /** Catalog listings for the admin SHOWs (store-backed sources). */
      databases: () => DataFrame = null,
      retentionPolicies: Option[String] => DataFrame = null,
      nowNs: () => Long = () => System.currentTimeMillis() * 1000000L)

  final case class EvalException(msg: String) extends Exception(msg)

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Count of "ungrouped transform serializes through one task" warnings
    * (visible to specs; the log line is the user-facing signal).
    */
  private[graft] val ungroupedTransformWarnings =
    new java.util.concurrent.atomic.AtomicLong

  def run(q: String, source: Source): DataFrame =
    evalStmt(InfluxQL.parse(q), source)

  /** Evaluate one already-parsed statement (multi-statement /query
    * batches parse once via [[InfluxQL.parseAll]] and eval per entry).
    *
    * `v1Time = true` (the /query JSON surface) adds the v1 engine's
    * `time` column to aggregate results that have no GROUP BY time():
    * the selected POINT's timestamp for a lone selector
    * (first/last/min/max), epoch 0 otherwise — what Grafana's
    * singlestat `SELECT last(…)` panels read. Library/gate callers
    * keep the bare aggregate row (default false).
    */
  def evalStmt(stmt: Stmt, source: Source, v1Time: Boolean = false): DataFrame = stmt match {
    case s: Select => select(if (v1Time) s.copy(v1Time = true) else s, source)
    case Explain(sel, analyze) =>
      // engine-specific by nature (v1 prints its iterator tree, we the
      // Catalyst plan); ANALYZE executes first and leads with the
      // observed row count + wall time
      val df = select(sel, source)
      val spark = df.sparkSession
      import spark.implicits._
      val lines = scala.collection.mutable.ArrayBuffer[String]()
      if (analyze) {
        val t0 = System.nanoTime()
        val n = df.count()
        lines += f"EXECUTED: $n rows in ${(System.nanoTime() - t0) / 1e6}%.1f ms"
      }
      lines ++= df.queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
        .linesIterator.filter(_.nonEmpty)
      lines.toSeq.toDF("QUERY PLAN")
    case ShowMeasurements(re, lim, off) =>
      require(source.measurements != null, "SHOW MEASUREMENTS unsupported by this source")
      val base = source.measurements()
      val nameCol = col(base.columns.head)
      val filtered = re.map(r => base.filter(nameCol.rlike(r))).getOrElse(base)
      val shifted = off.map(filtered.offset).getOrElse(filtered)
      lim.map(shifted.limit).getOrElse(shifted)
    case ShowTagKeys(m) =>
      require(source.tagKeys != null, "SHOW TAG KEYS unsupported by this source")
      m match {
        // v1 splits the FROM-less listing into one series per
        // measurement; the per-measurement key sets come from the same
        // mutation-versioned cache the scoped form uses (plan-time,
        // job-free once warm)
        case None if source.measurementNames != null =>
          val per = source.measurementNames().map(n =>
            source.tagKeys(Some(n)).withColumn("measurement", lit(n)))
          per.reduceOption(_ unionByName _)
            .map(_.select(col("measurement"), col("tagKey"))
              .orderBy("measurement", "tagKey"))
            .getOrElse(source.tagKeys(None).withColumn("measurement", lit("")).limit(0)
              .select(col("measurement"), col("tagKey")))
        case _ => source.tagKeys(m)
      }
    case ShowFieldKeys(m) =>
      require(source.fieldKeys != null, "SHOW FIELD KEYS unsupported by this source")
      m match {
        // same per-measurement split as SHOW TAG KEYS
        case None if source.measurementNames != null =>
          val per = source.measurementNames().map(n =>
            source.fieldKeys(Some(n)).withColumn("measurement", lit(n)))
          per.reduceOption(_ unionByName _)
            .map(_.select(col("measurement"), col("fieldKey"), col("fieldType"))
              .orderBy("measurement", "fieldKey"))
            .getOrElse(source.fieldKeys(None)
              .withColumn("measurement", lit("")).limit(0)
              .select(col("measurement"), col("fieldKey"), col("fieldType")))
        case _ => source.fieldKeys(m)
      }
    case ShowTagValues(m, key, where, limit, offset) =>
      showTagValues(m, key, where, limit, offset, source)
    case ShowDatabases =>
      require(source.databases != null, "SHOW DATABASES unsupported by this source")
      source.databases()
    case ShowRetentionPolicies(db) =>
      require(source.retentionPolicies != null,
        "SHOW RETENTION POLICIES unsupported by this source")
      source.retentionPolicies(db)
    case ShowSeries(m, where) => showSeries(m, where, source)
    case ShowSeriesCardinality(_) =>
      showSeries(None, None, source).agg(count(lit(1)).as("count"))
    case ShowMeasurementCardinality(_) =>
      require(source.measurements != null,
        "SHOW MEASUREMENT CARDINALITY unsupported by this source")
      source.measurements().agg(count(lit(1)).as("count"))
    case ShowTagKeyCardinality(_) =>
      require(source.tagKeys != null,
        "SHOW TAG KEY CARDINALITY unsupported by this source")
      source.tagKeys(None).agg(count(lit(1)).as("count"))
    case ShowFieldKeyCardinality(_) =>
      require(source.fieldKeys != null,
        "SHOW FIELD KEY CARDINALITY unsupported by this source")
      source.fieldKeys(None).agg(count(lit(1)).as("count"))
    case _: DeleteStmt | _: DropMeasurement | _: CreateCq | _: DropCq |
        ShowContinuousQueries =>
      throw EvalException(
        "write/DDL statements run through the store-backed /query API (V1Query)")
  }

  /** Split a DELETE WHERE into [startNs, stopNs) bounds plus a raw-store
    * predicate over the `tags` map — the reference's /api/v2/delete
    * shape (time bounds + tag equality; richer predicates are not part
    * of the v1 delete contract).
    */
  private[graft] def deleteParts(where: Option[Cond],
      nowNs: () => Long = () => System.currentTimeMillis() * 1000000L): (Long, Long, Column) = {
    // v1's minimum timestamp is 1677-09-21 (negative epoch-ns), so an
    // unbounded DELETE must cover pre-1970 points: default lo is
    // Long.MinValue, not 0.
    var lo = Long.MinValue
    var hi = Long.MaxValue
    var pred: Column = lit(true)
    def ns(v: Lit): Long = v match {
      case LInt(n) => n
      case LNum(d) => d.toLong
      case LStr(str) =>
        val inst = java.time.Instant.parse(
          if (str.contains("T")) (if (str.endsWith("Z")) str else str + "Z")
          else str.replace(" ", "T") + "Z")
        inst.getEpochSecond * 1000000000L + inst.getNano
      case LNow(sign, d) =>
        nowNs() + sign * d.map(x => (x.seconds * 1e9).toLong).getOrElse(0L)
      case LBool(_) => throw EvalException("boolean literal in a time comparison")
    }
    def walk(c: Cond): Unit = c match {
      case CAnd(l, r) => walk(l); walk(r)
      case CCmp(op, "time", v) => op match {
        case ">=" => lo = ns(v)
        case ">" => lo = ns(v) + 1
        case "<" => hi = ns(v)
        case "<=" => hi = ns(v) + 1
        case o => throw EvalException(s"unsupported time comparison '$o' in DELETE")
      }
      case CCmp("=", key, LStr(s)) =>
        pred = pred && (col("tags").getItem(key) === s)
      case _ =>
        throw EvalException("DELETE supports AND-ed time bounds and tag = 'v' predicates")
    }
    where.foreach(walk)
    (lo, hi, pred)
  }

  /** `SHOW SERIES`: one `key` row per distinct series —
    * `measurement[,tag=v…]` with tags sorted by key, the v1 format.
    * Tags come from the frame's `tags` map column (store-backed view);
    * a frame without one is a single tagless series per measurement.
    */
  private def showSeries(m: Option[String], where: Option[Cond],
      source: Source): DataFrame = {
    val names = m.map(Seq(_)).getOrElse {
      require(source.measurementNames != null,
        "SHOW SERIES without FROM needs a measurement listing")
      source.measurementNames()
    }
    names.map { n =>
      val df = source.resolve(n)
      val f = where.map(w => df.filter(cond(w, df, source))).getOrElse(df)
      val keyCol =
        if (f.columns.contains("tags")) {
          val tagPart = array_join(
            org.apache.spark.sql.functions.transform(
              array_sort(map_entries(col("tags"))),
              e => concat(e.getField("key"), lit("="), e.getField("value"))),
            ",")
          when(size(map_entries(col("tags"))) === 0, lit(n))
            .otherwise(concat(lit(n), lit(","), tagPart))
        } else lit(n)
      f.select(keyCol.as("key")).distinct()
    }.reduce(_ union _).distinct().orderBy("key")
  }

  /** `SHOW TAG VALUES`: distinct (key, value) rows, the shape Grafana's
    * template-variable queries consume. WHERE (time bounds, tag
    * predicates) filters the points whose tag values are listed, as in
    * the v1 engine.
    */
  private def showTagValues(m: Option[String], sel: InfluxQL.KeySel,
      where: Option[Cond], limit: Option[Int], offset: Option[Int],
      source: Source): DataFrame = {
    // Resolve the selector to concrete key names. IN/= name them
    // directly; the regex forms match against the tag-key listing —
    // catalog-scale metadata collected at plan time, like the
    // measurement listing for FROM /regex/.
    val keys: Seq[String] = sel match {
      case InfluxQL.KeyEq(k) => Seq(k)
      case InfluxQL.KeyIn(ks) => ks.distinct
      case InfluxQL.KeyRegex(pat, neg) =>
        val re = java.util.regex.Pattern.compile(pat)
        resolvedTagKeys(source, m, "SHOW TAG VALUES WITH KEY =~")
          .filter(k => re.matcher(k).find() != neg)
    }
    // FROM-less form: v1 lists per MEASUREMENT (one response series
    // each), so rows carry a leading measurement column there
    val frames: Seq[(Option[String], DataFrame)] = m match {
      case Some(name) => Seq(None -> source.resolve(name))
      case None =>
        require(source.measurementNames != null,
          "SHOW TAG VALUES without FROM needs a measurement listing")
        source.measurementNames().map(n => Some(n) -> source.resolve(n))
    }
    if (keys.isEmpty) {
      val spark = frames.head._2.sparkSession
      import spark.implicits._
      return Seq.empty[(String, String)].toDF("key", "value")
    }
    val rows = frames.flatMap { case (mName, df) =>
      val f = where.map(w => df.filter(cond(w, df, source))).getOrElse(df)
      keys.map { k =>
        val kv = f.select(lit(k).as("key"), ref(f, k).cast("string").as("value"))
        mName.map(n => kv.select(lit(n).as("measurement"), col("key"), col("value")))
          .getOrElse(kv)
      }
    }.reduce(_ union _)
      .filter(col("value").isNotNull)
      .distinct()
    val sorted =
      if (m.isEmpty) rows.orderBy("measurement", "key", "value")
      else rows.orderBy("key", "value")
    // v1 LIMIT/OFFSET trim the sorted value listing
    val off = offset.map(sorted.offset).getOrElse(sorted)
    limit.map(off.limit).getOrElse(off)
  }

  /** Store-backed source: a v1 "database" maps onto a bucket, a
    * measurement onto its wide [[graft.dsl.Tsdb.fieldsAsCols]] view
    * (fields as columns, tags as the `tags` map), and the SHOW
    * queries onto catalog scans.
    */
  def tsdbSource(tsdb: graft.dsl.Tsdb, bucket: String): Source = Source(
    resolve = m => tsdb.fieldsAsCols(bucket, m),
    timeCol = "time",
    measurements = () => tsdb.from(bucket).toDF
      .select(col("measurement").as("name")).distinct().orderBy("name"),
    measurementNames = () => tsdb.from(bucket).toDF
      .select(col("measurement")).distinct().orderBy("measurement")
      .collect().map(_.getString(0)).toSeq,
    // served from the store's mutation-versioned cache: SHOW TAG KEYS
    // and plan-time expansion run zero Spark jobs once warm
    tagKeys = m => {
      import tsdb.spark.implicits._
      tsdb.store.tagKeys(bucket, m).toDF("tagKey")
    },
    tagKeyList = m => tsdb.store.tagKeys(bucket, m),
    fieldKeys = m => {
      // v1 pairs each key with its REAL type, from the store's
      // mutation-versioned per-field type cache
      import tsdb.spark.implicits._
      val types = tsdb.store.fieldTypes(bucket, m)
      tsdb.store.fieldKeys(bucket, m)
        .map(k => (k, types.getOrElse(k, "float")))
        .toDF("fieldKey", "fieldType")
    },
    databases = () => {
      import tsdb.spark.implicits._
      tsdb.catalog.listBuckets.map(_.name).sorted.toDF("name")
    },
    // v1 presents one policy per database; a v2 bucket's retention maps
    // onto the default "autogen" policy (0 retention = infinite = "0s")
    retentionPolicies = db => {
      import tsdb.spark.implicits._
      val name = db.getOrElse(bucket)
      val meta = tsdb.catalog.bucket(name)
        .getOrElse(throw EvalException(s"unknown database '$name'"))
      Seq(("autogen", s"${meta.retentionNs / 1000000000L}s",
        s"${meta.retentionNs / 1000000000L}s", 1, true))
        .toDF("name", "duration", "shardGroupDuration", "replicaN", "default")
    })

  /** Plan-time tag-key listing: the cached driver-side list when the
    * source provides one, else a one-off collect of the tagKeys frame.
    */
  private def resolvedTagKeys(source: Source, m: Option[String], what: String): Seq[String] =
    if (source.tagKeyList != null) source.tagKeyList(m)
    else {
      require(source.tagKeys != null, s"$what needs a tag-key listing")
      source.tagKeys(m).collect().map(_.getString(0)).toSeq
    }

  /** Column for a WHERE/GROUP BY key: a real column if the frame has
    * one, else a lookup into the `tags` map (store-backed frames).
    */
  private def ref(df: DataFrame, key: String): Column =
    if (df.columns.contains(key)) col(key)
    else if (df.columns.contains("tags")) col("tags").getItem(key)
    else col(key)

  private def timeLit(v: Lit, source: Source): Column = v match {
    case LStr(s) => to_timestamp(lit(s.replace("T", " ").stripSuffix("Z")))
    case LInt(ns) => timestamp_micros(lit(ns / 1000)) // epoch-ns literal, Long-exact
    case LNum(ns) => timestamp_micros(lit((ns / 1000).toLong)) // fractional epoch-ns literal
    case LNow(sign, d) =>
      val ns = source.nowNs() + sign * d.map(x => (x.seconds * 1e9).toLong).getOrElse(0L)
      timestamp_micros(lit(ns / 1000))
    case LBool(_) => throw EvalException("boolean literal in a time comparison")
  }

  /** Plan-time µs value of a time literal (for the pushable
    * time_ns/dt conjuncts) — same conversions as [[timeBounds]]' local
    * helper.
    */
  private def usLit(v: Lit, source: Source): Option[Long] = v match {
    case LStr(str) =>
      val inst = java.time.Instant.parse(
        if (str.contains("T")) (if (str.endsWith("Z")) str else str + "Z")
        else str.replace(" ", "T") + "Z")
      Some(inst.getEpochSecond * 1000000L + inst.getNano / 1000L)
    case LInt(ns) => Some(ns / 1000)
    case LNum(ns) => Some((ns / 1000).toLong)
    case LNow(sign, d) =>
      Some((source.nowNs() + sign * d.map(x => (x.seconds * 1e9).toLong).getOrElse(0L)) / 1000L)
    case LBool(_) => None
  }

  private def cond(c: Cond, df: DataFrame, source: Source): Column = c match {
    case CAnd(l, r) => cond(l, df, source) && cond(r, df, source)
    case COr(l, r) => cond(l, df, source) || cond(r, df, source)
    case CCmp(op, "time", v) =>
      val t = col(source.timeCol)
      val lt = timeLit(v, source)
      val base = op match {
        case "=" => t === lt
        case "!=" => t =!= lt
        case ">" => t > lt
        case "<" => t < lt
        case ">=" => t >= lt
        case "<=" => t <= lt
        case o => throw EvalException(s"unsupported time comparison '$o'")
      }
      // store-backed frames: conjoin equivalent time_ns/dt bounds —
      // only predicates on the LWW dedup window's partition columns
      // push through it to the scan, so without these an uncompacted
      // bucket's v1 range query scans every partition (same fix as
      // FluxFrame.rangeImpl). µs-literal comparisons translate
      // exactly; pre-1970 literals skip the push (truncation
      // direction) — usLit is plan-time, so nothing is added at all
      // for them.
      usLit(v, source).filter(_ >= 1).map { usV =>
        val extras = Seq.newBuilder[Column]
        if (df.columns.contains("time_ns")) {
          val ns = col("time_ns")
          op match {
            case "=" => extras += (ns >= usV * 1000L && ns < (usV + 1) * 1000L)
            case ">=" => extras += (ns >= usV * 1000L)
            case ">" => extras += (ns >= (usV + 1) * 1000L)
            case "<" => extras += (ns < usV * 1000L)
            case "<=" => extras += (ns < (usV + 1) * 1000L)
            case _ => ()
          }
        }
        if (df.columns.contains("dt")) {
          val d = java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(
            Math.floorDiv(usV, 86400L * 1000000L)))
          op match {
            case "=" => extras += (col("dt") === lit(d))
            case ">=" | ">" => extras += (col("dt") >= lit(d))
            case "<" | "<=" => extras += (col("dt") <= lit(d))
            case _ => ()
          }
        }
        extras.result().foldLeft(base)(_ && _)
      }.getOrElse(base)
    case CCmp(op, key, v) =>
      val k = ref(df, key)
      val lt: Column = v match {
        case LStr(s) => lit(s)
        case LNum(d) => lit(d)
        case LInt(n) => lit(n)
        case LBool(b) => lit(b)
        case _: LNow => throw EvalException("now() only compares against time")
      }
      op match {
        case "=" => k === lt
        case "!=" => k =!= lt
        case ">" => k > lt
        case "<" => k < lt
        case ">=" => k >= lt
        case "<=" => k <= lt
        case "=~" => k.rlike(v.asInstanceOf[LStr].s)
        case "!~" => !k.rlike(v.asInstanceOf[LStr].s)
        case o => throw EvalException(s"unsupported comparison '$o'")
      }
  }

  /** Column for an arithmetic projection. In aggregate mode the leaves
    * are aggregate calls (raw fields are rejected — a grouped query has
    * no row context); in raw mode the leaves are row-wise field refs.
    */
  private def exprCol(e: PExpr, df: DataFrame, timeCol: String,
      aggMode: Boolean): Column = e match {
    case PNum(v) => lit(v)
    case PAgg(a) if aggMode => aggExpr(a.copy(alias = Some("_")), df, timeCol)
    case PAgg(a) => throw EvalException(
      s"aggregate ${a.fn}() in a raw-field expression")
    case PField(n) if !aggMode => ref(df, n)
    case PField(n) => throw EvalException(
      s"raw field '$n' mixed into an aggregate expression")
    case PBin(op, l, r) =>
      val lc = exprCol(l, df, timeCol, aggMode)
      val rc = exprCol(r, df, timeCol, aggMode)
      op match {
        case '+' => lc + rc
        case '-' => lc - rc
        case '*' => lc * rc
        case '/' => lc / rc
        case o => throw EvalException(s"unsupported operator '$o'")
      }
    case PFun(fn, args) =>
      def a(i: Int): Column = {
        if (args.size <= i)
          throw EvalException(s"$fn() expects ${i + 1} argument(s)")
        exprCol(args(i), df, timeCol, aggMode)
      }
      fn match {
        case "abs" => abs(a(0))
        // ceil/floor: Spark returns LONG, v1 returns a float — cast
        case "ceil" => ceil(a(0)).cast("double")
        case "floor" => floor(a(0)).cast("double")
        case "round" => round(a(0))
        case "exp" => exp(a(0))
        case "ln" => org.apache.spark.sql.functions.log(a(0))
        case "log2" => log2(a(0))
        case "log10" => log10(a(0))
        case "sqrt" => sqrt(a(0))
        case "pow" => pow(a(0), a(1))
        case "sin" => sin(a(0))
        case "cos" => cos(a(0))
        case "tan" => tan(a(0))
        case "asin" => asin(a(0))
        case "acos" => acos(a(0))
        case "atan" => atan(a(0))
        case "atan2" => atan2(a(0), a(1))
        case other => throw EvalException(s"unsupported function '$other'")
      }
  }

  /** GROUP BY time(d, off) bucket offset, normalized into [0, step). */
  private def bucketOffsetUs(s: Select, stepUs: Long): Long = {
    val raw = s.groupOffset.map(o => (o.seconds * 1e6).toLong).getOrElse(0L)
    ((raw % stepUs) + stepUs) % stepUs
  }

  private def aggExpr(p: AggProj, df: DataFrame, timeCol: String): Column = {
    // v1 aggregates FIELDS only; a field key the measurement does not
    // (yet) carry aggregates over nothing → null → an empty series,
    // exactly the reference's answer — never an UNRESOLVED_COLUMN 500.
    // The r18 service soak hit this live: `SELECT mean(v) FROM soak`
    // planned in the window before soak's first point landed, when the
    // pivot had no `v` column.
    val c =
      if (df.columns.contains(p.field)) col(p.field)
      else lit(null).cast("double")
    val e = p.fn match {
      case "count" => count(c)
      case "sum" => sum(c)
      case "mean" => avg(c)
      case "min" => min(c)
      case "max" => max(c)
      case "median" => percentile(c, lit(0.5))
      case "mode" => mode(c)
      case "stddev" => stddev_samp(c)
      case "spread" => max(c) - min(c)
      // struct(time, value) key: duplicate timestamps resolve to the
      // smallest/largest VALUE deterministically under any partitioning
      // (same documented divergence from table order as the Flux side)
      case "first" => min_by(c, struct(col(timeCol), c))
      case "last" => max_by(c, struct(col(timeCol), c))
      case "percentile" =>
        // only reachable INSIDE arithmetic expressions (the plain
        // projection path stages v1's nearest-rank selection); an
        // interpolated quantile inside arithmetic would silently
        // diverge from v1, so reject rather than approximate
        throw EvalException(
          "percentile() inside an arithmetic expression is unsupported")
      case "count_distinct" => count_distinct(c) // count(distinct(f))
      case other => throw EvalException(s"unsupported aggregate '$other'")
    }
    // v1 names count(distinct(f)) plain "count"
    e.as(p.alias.getOrElse(if (p.fn == "count_distinct") "count" else p.fn))
  }

  /** Resolve the FROM clause to (measurement label, frame) pairs. A
    * subquery resolves to ONE source: the inner select's result (its
    * aliased columns become the outer query's fields).
    */
  private def resolveFrom(s: Select, source: Source): Seq[(String, DataFrame)] =
    s.from match {
      case FromSelect(inner) => Seq(fromName(inner.from) -> select(inner, source))
      case FromMeasurements(ns) => ns.map(n => n -> source.resolve(n))
      case FromRegex(p) =>
        require(source.measurementNames != null,
          "FROM /regex/ requires a source with a measurement listing")
        val re = p.r
        val ns = source.measurementNames()
          .filter(n => re.findFirstIn(n).isDefined).sorted
        if (ns.isEmpty) throw EvalException(s"no measurement matches /$p/")
        ns.map(n => n -> source.resolve(n))
    }

  /** InfluxQL evaluates a multi-measurement statement per measurement
    * and concatenates the per-measurement series — so each resolved
    * frame runs the whole select independently (LIMIT/FILL/transforms
    * apply within a measurement, matching the v1 engine), labeled by a
    * `measurement` column when there is more than one.
    */
  private def select(s0: Select, source: Source): DataFrame = {
    // GROUP BY *: every tag key becomes a group tag (the per-series
    // split Grafana's repeat-by-series panels rely on). The key LIST is
    // catalog-scale metadata resolved at plan time, like pivot-value
    // inference — not a data-path materialization.
    val s =
      if (!s0.groupTags.contains("*")) s0
      else {
        val m = s0.from match {
          case FromMeasurements(Seq(n)) => Some(n)
          case _ => None
        }
        val keys = resolvedTagKeys(source, m, "GROUP BY *").sorted
        s0.copy(groupTags =
          s0.groupTags.filterNot(_ == "*") ++
            keys.filterNot(s0.groupTags.contains))
      }
    val srcs = resolveFrom(s, source)
    if (srcs.lengthCompare(1) == 0) selectOn(s, srcs.head._2, source)
    else {
      val parts = srcs.map { case (n, base) =>
        selectOn(s, base, source).withColumn("measurement", lit(n))
      }
      val u = parts.reduce(_ unionByName _)
      val ordered = "measurement" +: u.columns.filterNot(_ == "measurement").toSeq
      val sortKeys = col("measurement") +:
        (if (u.columns.contains("time"))
          (if (s.orderDesc) col("time").desc else col("time").asc) +: s.groupTags.map(col)
        else s.groupTags.map(col))
      u.select(ordered.map(col): _*).orderBy(sortKeys: _*)
    }
  }

  private def selectOn(s: Select, base: DataFrame, source: Source): DataFrame = {
    // the three-arg tag form exists only for top()/bottom(); the parser
    // accepts it syntactically for any call, so reject it here rather
    // than silently evaluating e.g. sample(value, tag, N) as the
    // two-arg form
    s.projs.foreach {
      case a: AggProj if a.tagKey.isDefined && a.fn != "top" && a.fn != "bottom" =>
        throw EvalException(s"${a.fn}(field, tag, N) is unsupported; " +
          "the tag argument applies to top()/bottom() only")
      case _ => ()
    }
    s.projs match {
      case Seq(t: TransProj) => return transform(t, s, base, source)
      case _ if s.projs.exists(_.isInstanceOf[TransProj]) =>
        throw EvalException("a transformation must be the only projection")
      case Seq(a: AggProj) if a.fn == "top" || a.fn == "bottom" =>
        return topBottom(a, s, base, source)
      case Seq(a: AggProj) if a.fn == "distinct" =>
        return distinctValues(a, s, base, source)
      case Seq(a: AggProj) if a.fn == "sample" =>
        return sampleValues(a, s, base, source)
      case _ => ()
    }
    val filtered = s.where.map(w => base.filter(cond(w, base, source))).getOrElse(base)
    // v1 aggregate-star: `mean(*)` applies the call to EVERY data
    // field (sorted, like SELECT * expansion), each output named
    // <fn>_<field> — schema-scale expansion at plan time
    val starFields = filtered.columns
      .filterNot(c => c == source.timeCol || c == "tags" || c == "dt" ||
        c == "time_ns" || c == "measurement" || s.groupTags.contains(c))
      .sorted.toSeq
    val numericStarFields = starFields.filter(c => filtered.schema(c).dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType])
    def fieldRegex(f: String): Option[scala.util.matching.Regex] =
      if (f.length > 1 && f.startsWith("/") && f.endsWith("/"))
        Some(f.substring(1, f.length - 1).r)
      else None
    val aggs = s.projs.collect { case a: AggProj => a }.flatMap {
      case a if a.field == "*" || fieldRegex(a.field).isDefined =>
        // star / regex expansion: count() covers every (matching)
        // field; numeric functions the numeric ones only, as v1 does
        val base = if (a.fn == "count") starFields else numericStarFields
        val fs = fieldRegex(a.field) match {
          case Some(re) => base.filter(c => re.findFirstIn(c).isDefined)
          case None => base
        }
        fs.map(f => a.copy(field = f, alias = Some(
          a.alias.getOrElse(if (a.fn == "count_distinct") "count" else a.fn) + "_" + f)))
      case a => Seq(a)
    }
    val fields = s.projs.collect { case f: FieldProj => f }
    val exprs = s.projs.collect { case e: ExprProj => e }
    def hasAgg(e: PExpr): Boolean = e match {
      case _: PAgg => true
      case PBin(_, l, r) => hasAgg(l) || hasAgg(r)
      case PFun(_, args) => args.exists(hasAgg)
      case _ => false
    }
    val (aggExprs, rawExprs) = exprs.partition(e => hasAgg(e.expr))
    if ((aggs.nonEmpty || aggExprs.nonEmpty) && (fields.nonEmpty || rawExprs.nonEmpty))
      throw EvalException("mixing aggregate and raw field projections is unsupported")

    val out: DataFrame =
      if (aggs.isEmpty && aggExprs.isEmpty) {
        // raw select: time + fields; `*` expands to every non-time data
        // column (the `tags` map and partition columns stay internal),
        // `/re/` to the matching ones
        val allRaw = filtered.columns
          .filterNot(c => c == source.timeCol || c == "tags" || c == "dt" ||
            c == "time_ns")
          .sorted.toSeq
        val expanded: Seq[FieldProj] = fields.flatMap {
          case FieldProj("*", _) => allRaw.map(FieldProj(_, None))
          case f => fieldRegex(f.field) match {
            case Some(re) =>
              allRaw.filter(c => re.findFirstIn(c).isDefined).map(FieldProj(_, None))
            case None => Seq(f)
          }
        }.distinct
        // GROUP BY tags on a raw select keep the series keys in the
        // output (v1 emits per-series blocks; here tags are columns) —
        // transforms over raw fields partition on them
        val tagKeep = s.groupTags
          .filterNot(t => expanded.exists(p => p.alias.getOrElse(p.field) == t))
          .map(t => ref(filtered, t).as(t))
        val cols = col(source.timeCol).as("time") +:
          (tagKeep ++
            expanded.map(f => ref(filtered, f.field).as(f.alias.getOrElse(f.field))) ++
            rawExprs.map(e => exprCol(e.expr, filtered, source.timeCol, aggMode = false)
              .as(e.alias.getOrElse(exprName(e.expr)))))
        filtered.select(cols: _*)
      } else {
        // integral(field[, unit]) sums consecutive-pair trapezoids
        // ordered by time WITHIN each (tags[, bucket]) partition —
        // staged as a per-row contribution column before the groupBy,
        // then aggregated as a plain sum (pairs crossing a bucket
        // boundary contribute to neither bucket).
        val integralIdx = aggs.zipWithIndex.collect {
          case (a, i) if a.fn == "integral" => i
        }
        // percentile(field, N) is a v1 SELECTOR: the nearest-rank point
        // value — sorted[floor(n·N/100 + 0.5)] 1-based, nil when the
        // rank is 0 — NOT an interpolated quantile. Staged like
        // integral: per-row rank + non-null count within each
        // (tags[, bucket]) partition, then the aggregate picks the row
        // whose rank equals the target (max-of-one-match; ties at the
        // boundary share the value, so tie order cannot matter).
        val percentileIdx = aggs.zipWithIndex.collect {
          case (a, i) if a.fn == "percentile" => i
        }
        def pctTarget(i: Int): Column = {
          val pct = aggs(i).param.getOrElse(
            throw EvalException("percentile(field, N) needs N"))
          floor(col(s"_pct_n_$i") * pct / 100.0 + 0.5).cast("int")
        }
        def stagePercentiles(df: DataFrame, bucket: Option[Column]): DataFrame =
          percentileIdx.foldLeft(df) { (d, i) =>
            val W = org.apache.spark.sql.expressions.Window
            val parts = s.groupTags.map(t => ref(d, t)) ++ bucket.toSeq
            val base = if (parts.isEmpty) W.partitionBy() else W.partitionBy(parts: _*)
            val v = ref(d, aggs(i).field)
            // non-null values rank first (isNull false < true), so
            // ranks 1.._pct_n cover exactly the non-null points
            d.withColumn(s"_pct_rk_$i", row_number().over(base.orderBy(v.isNull, v)))
              .withColumn(s"_pct_n_$i", count(v).over(base))
          }
        def stageIntegrals(df: DataFrame, bucket: Option[Column]): DataFrame =
          integralIdx.foldLeft(df) { (d, i) =>
            val a = aggs(i)
            val unitSec = a.dur.map(_.seconds).getOrElse(1.0)
            val W = org.apache.spark.sql.expressions.Window
            val parts = s.groupTags.map(t => ref(d, t)) ++ bucket.toSeq
            val w = (if (parts.isEmpty) W.partitionBy()
              else W.partitionBy(parts: _*)).orderBy(col(source.timeCol))
            val v = ref(d, a.field).cast("double")
            val pv = lag(v, 1).over(w)
            val dtSec = col(source.timeCol).cast("double") -
              lag(col(source.timeCol), 1).over(w).cast("double")
            d.withColumn(s"_itg_$i",
              coalesce((v + pv) / 2.0 * dtSec / lit(unitSec), lit(0.0)))
          }
        val tagCols = s.groupTags.map(t => ref(filtered, t).as(t))
        val aggCols = aggs.zipWithIndex.map {
          case (a, i) if a.fn == "integral" =>
            sum(col(s"_itg_$i")).as(a.alias.getOrElse("integral"))
          case (a, i) if a.fn == "percentile" =>
            max(when(col(s"_pct_rk_$i") === pctTarget(i), ref(filtered, a.field)))
              .as(a.alias.getOrElse("percentile"))
          case (a, _) => aggExpr(a, filtered, source.timeCol)
        } ++
          aggExprs.map(e => exprCol(e.expr, filtered, source.timeCol, aggMode = true)
            .as(e.alias.getOrElse(exprName(e.expr))))
        val aggNames = aggs.map(a => a.alias.getOrElse(
          if (a.fn == "count_distinct") "count" else a.fn)) ++
          aggExprs.map(e => e.alias.getOrElse(exprName(e.expr)))
        s.groupTime match {
          case None =>
            val work = stagePercentiles(stageIntegrals(filtered, None), None)
            // v1Time (the /query response boundary): a lone selector row
            // carries its point's timestamp (earliest on value ties),
            // anything else epoch 0 — only on the outermost select
            val v1TimeCol: Seq[Column] =
              if (!s.v1Time) Nil
              else if (aggExprs.isEmpty && aggs.length == 1) {
                val t = col(source.timeCol)
                val c = col(aggs.head.field)
                aggs.head.fn match {
                  case "first" => Seq(min(t).as("time"))
                  case "last" => Seq(max(t).as("time"))
                  case "min" => Seq(min_by(t, struct(c, unix_micros(t))).as("time"))
                  case "max" => Seq(min_by(t, struct(negate(c), unix_micros(t))).as("time"))
                  case "percentile" if aggs.head.param.isDefined =>
                    // percentile is a selector too: its point's time
                    Seq(min(when(col("_pct_rk_0") === pctTarget(0), t)).as("time"))
                  case _ => Seq(timestamp_micros(lit(0L)).as("time"))
                }
              } else Seq(timestamp_micros(lit(0L)).as("time"))
            val allAggs = v1TimeCol ++ aggCols
            if (s.groupTags.isEmpty) work.agg(allAggs.head, allAggs.tail: _*)
            else work.groupBy(tagCols: _*).agg(allAggs.head, allAggs.tail: _*)
          case Some(d) =>
            // InfluxQL labels each bucket with its aligned START: epoch-
            // aligned, shifted by the GROUP BY time() offset, and — under
            // tz() — aligned to the zone's wall clock (bucket in local
            // time, convert the start back to UTC).
            val stepUs = (d.seconds * 1e6).toLong
            val offUs = bucketOffsetUs(s, stepUs)
            val bucketIn = s.tz match {
              case Some(z) => from_utc_timestamp(col(source.timeCol), z)
              case None => col(source.timeCol)
            }
            val win = window(bucketIn, d.interval, d.interval,
              s"${offUs} microseconds")
            val start = s.tz match {
              case Some(z) => to_utc_timestamp(win.getField("start"), z)
              case None => win.getField("start")
            }
            val keyed = stagePercentiles(stageIntegrals(filtered, Some(start)), Some(start))
              .withColumn("time", start)
            val grouped = keyed.groupBy((col("time") +: tagCols): _*)
              .agg(aggCols.head, aggCols.tail: _*)
            applyFill(grouped, s, d, aggNames, source)
        }
      }

    // SLIMIT/SOFFSET: slice the SERIES (distinct GROUP BY tag sets in
    // tag order) before the point-level LIMIT — the per-series list is
    // tiny, so orderBy+offset+limit plans as a take, then a semi-join
    // restricts the big frame.
    val seriesLimited =
      if (s.slimit.isEmpty && s.soffset.isEmpty) out
      else {
        if (s.groupTags.isEmpty)
          throw EvalException("SLIMIT/SOFFSET require GROUP BY tags")
        var combos = out.select(s.groupTags.map(col): _*).distinct()
          .orderBy(s.groupTags.map(col): _*)
        combos = s.soffset.map(combos.offset).getOrElse(combos)
        combos = s.slimit.map(combos.limit).getOrElse(combos)
        out.join(broadcast(combos), s.groupTags, "left_semi")
      }
    def ordering(df: DataFrame): DataFrame =
      if (df.columns.contains("time")) {
        val t = if (s.orderDesc) col("time").desc else col("time").asc
        // the v1Time boundary column is per-series metadata, not a time
        // axis: series stay in tag order (as v1 emits them), so tags
        // sort first there
        if (s.v1Time && s.groupTime.isEmpty)
          df.orderBy(s.groupTags.map(col) :+ t: _*)
        else df.orderBy(t +: s.groupTags.map(col): _*)
      } else if (s.groupTags.nonEmpty) df.orderBy(s.groupTags.map(col): _*)
      else df
    // v1 LIMIT/OFFSET paginate POINTS PER SERIES when the query groups
    // by tags ("returns the first N points from each series"); only an
    // ungrouped query trims globally (sorted first). The per-series
    // form is one row_number window in the statement's time direction,
    // applied BEFORE the output sort (the window's shuffle would
    // destroy it).
    if (s.limit.isEmpty && s.offset.isEmpty) ordering(seriesLimited)
    else if (s.groupTags.nonEmpty && seriesLimited.columns.contains("time")) {
      val W = org.apache.spark.sql.expressions.Window
      val t = if (s.orderDesc) col("time").desc else col("time").asc
      val w = W.partitionBy(s.groupTags.map(col): _*).orderBy(t)
      val lo = s.offset.getOrElse(0)
      val hi = s.limit.map(n => lo.toLong + n).getOrElse(Long.MaxValue)
      ordering(seriesLimited.withColumn("_lim_rn", row_number().over(w))
        .filter(col("_lim_rn") > lo && col("_lim_rn") <= hi)
        .drop("_lim_rn"))
    } else {
      val ord = ordering(seriesLimited)
      val off = s.offset.map(ord.offset).getOrElse(ord)
      s.limit.map(off.limit).getOrElse(off)
    }
  }

  /** `top(field, N)` / `bottom(field, N)`: the N extreme POINTS
    * (time + value) per GROUP BY tag series — multi-row selectors, not
    * scalar aggregates. Ties on value resolve to the earlier timestamp,
    * as in v1. Ungrouped form plans as orderBy+limit
    * (TakeOrderedAndProject — per-partition top-n, no global sort);
    * grouped form is a per-series row_number window.
    */
  private def topBottom(a: AggProj, s: Select, base: DataFrame,
      source: Source): DataFrame = {
    val n = a.param.map(_.toInt)
      .getOrElse(throw EvalException(s"${a.fn}(field, N) needs N"))
    val filtered = s.where.map(w => base.filter(cond(w, base, source))).getOrElse(base)
    val name = a.alias.getOrElse(a.fn)
    val v = ref(filtered, a.field)
    val valueOrd = if (a.fn == "top") v.desc else v.asc
    s.groupTime.foreach { d =>
      // v1 GROUP BY time() form: the N extreme POINTS per (tags,
      // bucket), output rows keep the points' actual timestamps (not
      // the bucket label). One row_number window, no shuffle beyond it.
      if (a.tagKey.isDefined)
        throw EvalException(s"${a.fn}(field, tag, N) with GROUP BY time() is unsupported")
      import org.apache.spark.sql.expressions.Window
      val stepUs = (d.seconds * 1e6).toLong
      val offUs = bucketOffsetUs(s, stepUs)
      val bucketIn = s.tz match {
        case Some(z) => from_utc_timestamp(col(source.timeCol), z)
        case None => col(source.timeCol)
      }
      val bucket = window(bucketIn, d.interval, d.interval,
        s"${offUs} microseconds").getField("start")
      val w = Window
        .partitionBy(s.groupTags.map(t => ref(filtered, t)) :+ bucket: _*)
        .orderBy(valueOrd, col(source.timeCol).asc)
      // nulls pre-filtered: under asc ordering (bottom) they would
      // otherwise rank first and consume the N slots
      val nn = filtered.filter(v.isNotNull)
      return nn.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") <= n)
        .select((col(source.timeCol).as("time") +:
          s.groupTags.map(t => ref(nn, t).as(t)) :+ ref(nn, a.field).as(name)): _*)
        .orderBy(s.groupTags.map(col) :+ col("time"): _*)
    }
    a.tagKey.foreach { tag =>
      // v1 three-arg form: the extreme point of each distinct tag
      // value, then the N most extreme among those — output keeps the
      // tag column
      if (s.groupTags.nonEmpty)
        throw EvalException(s"${a.fn}(field, tag, N) with GROUP BY tags is unsupported")
      import org.apache.spark.sql.expressions.Window
      val w1 = Window.partitionBy(ref(filtered, tag))
        .orderBy(valueOrd, col(source.timeCol).asc)
      val best = filtered.withColumn("_r1", row_number().over(w1))
        .filter(col("_r1") === 1)
      return best
        .orderBy(if (a.fn == "top") v.desc else v.asc, col(source.timeCol).asc)
        .limit(n)
        .select(col(source.timeCol).as("time"), ref(filtered, tag).as(tag), v.as(name))
    }
    if (s.groupTags.isEmpty)
      filtered
        .select(col(source.timeCol).as("time"), v.as(name))
        .orderBy(if (a.fn == "top") col(name).desc else col(name).asc, col("time").asc)
        .limit(n)
    else {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(s.groupTags.map(t => ref(filtered, t)): _*)
        .orderBy(valueOrd, col(source.timeCol).asc)
      filtered.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") <= n)
        .select((col(source.timeCol).as("time") +:
          s.groupTags.map(t => ref(filtered, t).as(t)) :+ v.as(name)): _*)
        .orderBy(s.groupTags.map(col) :+ col("time"): _*)
    }
  }

  /** `sample(field, N)`: N points per GROUP BY tag series. v1 samples
    * with an RNG; this engine derives the selection from a
    * deterministic hash of the point time (tie-broken by value), so
    * re-runs, retries of failed tasks, and the DuckDB oracle all pick
    * the same rows — the same determinism-over-RNG stance as
    * `SampleOps.assignSplit`.
    */
  private def sampleValues(a: AggProj, s: Select, base: DataFrame,
      source: Source): DataFrame = {
    val n = a.param.map(_.toInt)
      .getOrElse(throw EvalException("sample(field, N) needs N"))
    val filtered = s.where.map(w => base.filter(cond(w, base, source))).getOrElse(base)
    val name = a.alias.getOrElse("sample")
    val v = ref(filtered, a.field)
    val h = md5(unix_micros(col(source.timeCol)).cast("string"))
    s.groupTime.foreach { d =>
      // v1 GROUP BY time() form: N sampled points per (tags, bucket),
      // rows keeping their actual timestamps. Same deterministic
      // time-hash stand-in for v1's RNG as the flat form (documented).
      import org.apache.spark.sql.expressions.Window
      val stepUs = (d.seconds * 1e6).toLong
      val offUs = bucketOffsetUs(s, stepUs)
      val bucketIn = s.tz match {
        case Some(z) => from_utc_timestamp(col(source.timeCol), z)
        case None => col(source.timeCol)
      }
      val bucket = window(bucketIn, d.interval, d.interval,
        s"${offUs} microseconds").getField("start")
      val w = Window
        .partitionBy(s.groupTags.map(t => ref(filtered, t)) :+ bucket: _*)
        .orderBy(h.asc, v.asc)
      return filtered.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") <= n)
        .select((col(source.timeCol).as("time") +:
          s.groupTags.map(t => ref(filtered, t).as(t)) :+ v.as(name)): _*)
        .orderBy(s.groupTags.map(col) :+ col("time"): _*)
    }
    if (s.groupTags.isEmpty)
      filtered.withColumn("_h", h)
        .orderBy(col("_h").asc, v.asc)
        .limit(n)
        .select(col(source.timeCol).as("time"), v.as(name))
    else {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(s.groupTags.map(t => ref(filtered, t)): _*)
        .orderBy(h.asc, v.asc)
      filtered.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") <= n)
        .select((col(source.timeCol).as("time") +:
          s.groupTags.map(t => ref(filtered, t).as(t)) :+ v.as(name)): _*)
        .orderBy(s.groupTags.map(col) :+ col("time"): _*)
    }
  }

  /** `distinct(field)`: the distinct values per GROUP BY tag series —
    * a multi-row selector (v1 drops the time column).
    */
  private def distinctValues(a: AggProj, s: Select, base: DataFrame,
      source: Source): DataFrame = {
    val filtered = s.where.map(w => base.filter(cond(w, base, source))).getOrElse(base)
    val name = a.alias.getOrElse("distinct")
    s.groupTime.foreach { d =>
      // v1 GROUP BY time() form: distinct values per (tags, bucket),
      // rows labeled with the bucket start
      val stepUs = (d.seconds * 1e6).toLong
      val offUs = bucketOffsetUs(s, stepUs)
      val bucketIn = s.tz match {
        case Some(z) => from_utc_timestamp(col(source.timeCol), z)
        case None => col(source.timeCol)
      }
      val win = window(bucketIn, d.interval, d.interval, s"${offUs} microseconds")
      val start = s.tz match {
        case Some(z) => to_utc_timestamp(win.getField("start"), z)
        case None => win.getField("start")
      }
      val cols = start.as("time") +: (s.groupTags.map(t => ref(filtered, t).as(t)) :+
        ref(filtered, a.field).as(name))
      return filtered.select(cols: _*).distinct()
        .orderBy(col("time") +: (s.groupTags.map(col) :+ col(name)): _*)
    }
    val cols = s.groupTags.map(t => ref(filtered, t).as(t)) :+
      ref(filtered, a.field).as(name)
    filtered.select(cols: _*).distinct()
      .orderBy(cols.indices.map(i => col(if (i < s.groupTags.size) s.groupTags(i) else name)): _*)
  }

  /** A transformation projection: evaluate the inner projection (the
    * aggregated series when GROUP BY time() is present, else raw
    * points), then apply the window transform per GROUP BY tag series
    * in time order.
    */
  private def transform(t: TransProj, s: Select, base: DataFrame,
      source: Source): DataFrame = {
    val inner = t.inner match {
      case a: AggProj => a.copy(alias = Some("_v"))
      case f: FieldProj => f.copy(alias = Some("_v"))
      case e: ExprProj => e.copy(alias = Some("_v"))
      case _: TransProj => throw EvalException("nested transformations are unsupported")
    }
    // Transformations operate on non-null points (InfluxQL skips nulls:
    // an empty fill(null) bucket contributes nothing, while fill(0) /
    // fill(previous) values are real points and participate) — so a
    // fill(null) spine would be built only to be dropped; plan none.
    val innerFill = if (s.fill == FillNull) FillNone else s.fill
    val filled = selectOn(
      s.copy(projs = Seq(inner), fill = innerFill,
        orderDesc = false, limit = None, offset = None),
      base, source)
    val core = filled.filter(col("_v").isNotNull)
    import org.apache.spark.sql.expressions.Window
    // Everything with bounded lookback or a LINEAR recurrence
    // distributes even WITHOUT tags: lag-1 via SeriesScan.ungroupedLag,
    // cumulative_sum via the two-pass prefix sum, moving_average via
    // n−1 boundary-row carries, and the EMA family via affine-map
    // composition (SeriesScan.ungroupedEma — doubleEMA/tripleEMA chain
    // it). Only the genuinely nonlinear transforms (RSI/CMO/KAMA/
    // Holt-Winters) still serialize an untagged series through one
    // task.
    val lagClass = Set("derivative", "non_negative_derivative",
      "difference", "non_negative_difference", "elapsed", "cumulative_sum",
      "moving_average", "exponential_moving_average",
      "double_exponential_moving_average", "triple_exponential_moving_average")
    if (s.groupTags.isEmpty && !lagClass.contains(t.fn)) {
      ungroupedTransformWarnings.incrementAndGet()
      log.warn("InfluxQL transform without GROUP BY tags: the series " +
        "moves through ONE window task. GROUP BY a tag to distribute.")
    }
    val w = (if (s.groupTags.isEmpty) Window.partitionBy()
      else Window.partitionBy(s.groupTags.map(col): _*)).orderBy(col("time"))
    val name = t.alias.getOrElse(t.fn)
    val v = col("_v")
    /** core + `_pv`/`_pt` (lag-1 of value and time): a per-series
      * window when tags partition the series, the distributed
      * range-partition carry scan when untagged.
      */
    def withPrev(): DataFrame =
      if (s.groupTags.isEmpty)
        graft.dsl.SeriesScan.ungroupedLag(core, "time", Seq("_v", "time"),
          core.sparkSession.sparkContext.defaultParallelism)
          .withColumnRenamed("_prev__v", "_pv")
          .withColumnRenamed("_prev_time", "_pt")
      else core.withColumn("_pv", lag(v, 1).over(w))
        .withColumn("_pt", lag(col("time"), 1).over(w))
    val staged: DataFrame = t.fn match {
      case "derivative" | "non_negative_derivative" =>
        // Default unit: the GROUP BY time() interval when transforming an
        // aggregated series (the canonical Grafana
        // `derivative(mean(v)) … GROUP BY time(1h)` reads per-interval
        // rate), else 1s — matching the v1 engine.
        val unitSec = t.dur.map(_.seconds)
          .orElse(s.groupTime.map(_.seconds)).getOrElse(1.0)
        val dtSec = col("time").cast("double") - col("_pt").cast("double")
        val d = (v - col("_pv")) / (dtSec / lit(unitSec))
        // v1 omits negative rows entirely (docs: "returns only
        // non-negative rates of change"), it does not null them.
        // Zero-interval pairs (duplicate timestamps across series in an
        // untagged scan) are skipped as v1 does — without this, dt=0
        // yields ±Infinity/NaN, and NaN >= 0 is TRUE under Spark's NaN
        // ordering so NaN rows would leak through the filter below.
        val staged0 = withPrev().withColumn(name, d)
          .filter(col("_pv").isNotNull && col("_pt") =!= col("time"))
          .drop("_pv", "_pt")
        if (t.fn == "non_negative_derivative") staged0.filter(col(name) >= 0)
        else staged0
      case "difference" | "non_negative_difference" =>
        val staged0 = withPrev().withColumn(name, v - col("_pv"))
          .filter(col("_pv").isNotNull).drop("_pv", "_pt")
        if (t.fn == "non_negative_difference") staged0.filter(col(name) >= 0)
        else staged0
      case "cumulative_sum" =>
        if (s.groupTags.isEmpty)
          // distributed two-pass prefix sum (per-partition totals →
          // offsets) instead of one global running-window task
          graft.dsl.SeriesScan.ungroupedPrefixSum(core, "time", "_v", name,
            core.sparkSession.sparkContext.defaultParallelism)
        else
          core.withColumn(name, sum(v).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      case "moving_average" =>
        val n = t.n.getOrElse(throw EvalException("moving_average(x, N) needs N"))
        if (s.groupTags.isEmpty)
          // distributed n−1 boundary-row carry scan instead of one
          // global window task (core is non-null-filtered, so the
          // all-non-null mode mirrors the count(v) === n filter below)
          graft.dsl.SeriesScan.ungroupedMovingAvg(core, "time", "_v", n, name,
            requireAllNonNull = true,
            core.sparkSession.sparkContext.defaultParallelism)
        else {
          val frame = w.rowsBetween(-(n - 1), 0)
          core.withColumn("_c", count(v).over(frame))
            .withColumn(name, avg(v).over(frame))
            .filter(col("_c") === n).drop("_c")
        }
      case fn @ ("exponential_moving_average" | "double_exponential_moving_average" |
          "triple_exponential_moving_average" | "relative_strength_index" |
          "chande_momentum_oscillator" | "kaufmans_adaptive_moving_average") =>
        // v1's technical-analysis family — same kernels as the Flux
        // verbs (SeriesScan per-series folds, hash-gated by the
        // ema/dema/tema/rsi/cmo/kama gates); the staged series
        // (time, tags, _v) IS a FluxFrame
        val n = t.n.getOrElse(throw EvalException(s"$fn(field, N) needs N"))
        val ff = graft.dsl.FluxFrame(core, s.groupTags, "time", "_v")
        (fn match {
          case "exponential_moving_average" => ff.ema(n, name)
          case "double_exponential_moving_average" => ff.doubleEma(n, name)
          case "triple_exponential_moving_average" => ff.tripleEma(n, name)
          case "relative_strength_index" => ff.rsi(n, name)
          case "chande_momentum_oscillator" => ff.chandeMomentum(n, name)
          case "kaufmans_adaptive_moving_average" => ff.kaufmansAma(n, name)
        }).df
      case fn @ ("holt_winters" | "holt_winters_with_fit") =>
        // v1 HOLT_WINTERS(agg(field), N, S): additive triple-exponential
        // smoothing over the GROUP BY time() grid with α/β/γ FITTED per
        // series (the pinned engine optimizes them; our optimizer is
        // SeriesScan.hwFitParams' deterministic grid schedule, SQL-
        // replicable where Nelder-Mead is not), N forecast steps,
        // seasonal length S. Plain holt_winters returns only the N
        // forecast rows; _with_fit also returns the fitted curve.
        val nFc = t.n.getOrElse(throw EvalException(s"$fn(agg(field), N, S) needs N"))
        val m = t.n2.getOrElse(
          throw EvalException(s"$fn(agg(field), N, S) needs the seasonal length S"))
        // S = 0 is v1's no-seasonality form (Holt's linear trend)
        if (m < 0) throw EvalException("holt_winters seasonal length must be >= 0")
        if (s.groupTime.isEmpty)
          throw EvalException(s"$fn requires GROUP BY time() (a regular grid)")
        val withUs = core.withColumn("_tus", unix_micros(col("time")))
        val hw = graft.dsl.SeriesScan.holtWintersFitSeries(
          withUs, s.groupTags, "_tus", "_v", nFc, m)
        // _hw_key carries the NUL-joined tag tuple; restore the columns
        val parts = split(col("_hw_key"), "\u0000", -1)
        val restored = s.groupTags.zipWithIndex.foldLeft(hw) {
          case (d, (tg, i)) => d.withColumn(tg, element_at(parts, i + 1))
        }.withColumn("time", timestamp_micros(col("_tus")))
        val kept = if (fn == "holt_winters") restored.filter(col("is_forecast"))
          else restored
        kept.withColumn(name, col("fitted"))
      case "elapsed" =>
        // v1 elapsed(field[, unit]): whole units between consecutive
        // points, integer-truncated; default unit 1ns. Integer `div`
        // keeps ns math exact where double division could round.
        val unitNs = t.dur.map(x => (x.seconds * 1e9).toLong).getOrElse(1L)
        withPrev()
          .withColumn("_dns",
            (unix_micros(col("time")) - unix_micros(col("_pt"))) * lit(1000L))
          .withColumn(name, expr(s"_dns div ${unitNs}L"))
          .filter(col("_pt").isNotNull).drop("_pv", "_pt", "_dns")
      case other => throw EvalException(s"unsupported transformation '$other'")
    }
    staged.select((col("time") +: s.groupTags.map(col) :+ col(name)): _*)
  }

  /** FILL(…) over a GROUP BY time() result: generate the full window
    * spine between the WHERE clause's absolute time bounds (required —
    * InfluxQL likewise only fills inside an explicit range) crossed with
    * the observed tag combinations, then left-join the aggregates.
    */
  private def applyFill(grouped: DataFrame, s: Select, d: Dur,
      aggNames: Seq[String], source: Source): DataFrame = s.fill match {
    case FillNone => grouped
    case fill =>
      val bounds = timeBounds(s.where, source)
      if (bounds.isEmpty && fill == FillNull)
        // fill(null) is the GROUP BY time() *default*; without absolute
        // bounds there is no spine to fill — degrade to none rather than
        // reject every unbounded GROUP BY time() query.
        return grouped
      val (lo, hi) = bounds.getOrElse(
        throw EvalException("FILL requires absolute time bounds in WHERE"))
      val stepUs = (d.seconds * 1e6).toLong
      val offUs = bucketOffsetUs(s, stepUs)
      // tz(): the spine steps in LOCAL wall-clock µs (matching the
      // bucket alignment), each start converted back to UTC below
      def toLocal(us: Long): Long = s.tz match {
        case Some(z) =>
          val inst = java.time.Instant.ofEpochSecond(us / 1000000L, us % 1000000L * 1000L)
          us + java.time.ZoneId.of(z).getRules.getOffset(inst).getTotalSeconds * 1000000L
        case None => us
      }
      val (loL, hiL) = (toLocal(lo), toLocal(hi))
      val loAligned = Math.floorDiv(loL - offUs, stepUs) * stepUs + offUs
      val spineLocal = grouped.sparkSession.range(loAligned, hiL, stepUs)
        .select(timestamp_micros(col("id")).as("time"))
      val spine = s.tz match {
        case Some(z) => spineLocal.select(to_utc_timestamp(col("time"), z).as("time"))
        case None => spineLocal
      }
      val spineKeys =
        if (s.groupTags.isEmpty) spine
        else spine.crossJoin(grouped.select(s.groupTags.map(col): _*).distinct())
      val joined = spineKeys.join(grouped, "time" +: s.groupTags, "left")
      fill match {
        case FillValue(v) =>
          aggNames.foldLeft(joined)((df, n) => df.withColumn(n, coalesce(col(n), lit(v))))
        case FillPrevious =>
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(s.groupTags.map(col): _*).orderBy(col("time"))
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
          aggNames.foldLeft(joined)((df, n) =>
            df.withColumn(n, last(col(n), ignoreNulls = true).over(w)))
        case FillLinear =>
          // v1 fill(linear): interpolate empty buckets between the
          // nearest non-null neighbors on each side; leading/trailing
          // gaps (no neighbor) stay null. Same neighbor-window algebra
          // as FluxFrame.interpolateLinear, per series partition — the
          // window is bounded by (range ÷ interval) spine rows.
          val W = org.apache.spark.sql.expressions.Window
          val base = W.partitionBy(s.groupTags.map(col): _*).orderBy(col("time"))
          val back = base.rowsBetween(W.unboundedPreceding, -1)
          val fwd = base.rowsBetween(1, W.unboundedFollowing)
          val tSec = col("time").cast("double")
          aggNames.foldLeft(joined) { (df, n) =>
            val pv = last(col(n), ignoreNulls = true).over(back)
            val pt = last(when(col(n).isNotNull, tSec), ignoreNulls = true).over(back)
            val nv = first(col(n), ignoreNulls = true).over(fwd)
            val nt = first(when(col(n).isNotNull, tSec), ignoreNulls = true).over(fwd)
            df.withColumn(n, when(col(n).isNotNull, col(n))
              .otherwise(pv + (nv - pv) * (tSec - pt) / (nt - pt)))
          }
        case _ => joined // FillNull: spine rows keep their nulls
      }
  }

  /** Extract absolute [lo, hi) µs bounds from AND-ed time comparisons. */
  private def timeBounds(where: Option[Cond], source: Source): Option[(Long, Long)] = {
    var lo: Option[Long] = None
    var hi: Option[Long] = None
    def us(v: Lit): Long = v match {
      case LStr(str) =>
        val inst = java.time.Instant.parse(
          if (str.contains("T")) (if (str.endsWith("Z")) str else str + "Z")
          else str.replace(" ", "T") + "Z")
        // full µs precision (toEpochMilli would truncate sub-ms bounds
        // that the WHERE filter itself keeps)
        inst.getEpochSecond * 1000000L + inst.getNano / 1000L
      case LInt(ns) => ns / 1000
      case LNum(ns) => (ns / 1000).toLong
      case LNow(sign, d) =>
        (source.nowNs() + sign * d.map(x => (x.seconds * 1e9).toLong).getOrElse(0L)) / 1000L
      case LBool(_) => throw EvalException("boolean literal in a time comparison")
    }
    def walk(c: Cond): Unit = c match {
      case CAnd(l, r) => walk(l); walk(r)
      case CCmp(">=", "time", v) => lo = Some(us(v))
      case CCmp(">", "time", v) => lo = Some(us(v) + 1)
      case CCmp("<", "time", v) => hi = Some(us(v))
      case CCmp("<=", "time", v) => hi = Some(us(v) + 1)
      case _ => ()
    }
    where.foreach(walk)
    for (l <- lo; h <- hi) yield (l, h)
  }
}
