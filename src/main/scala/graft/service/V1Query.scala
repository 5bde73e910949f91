package graft.service

import graft.dsl.Tsdb
import graft.influxql.{InfluxQL, InfluxQLEval}
import org.apache.spark.sql.functions.col

/** The v1 compatibility query response: InfluxQL result → the
  * `{"results":[{"series":[{name, tags, columns, values}]}]}` JSON shape
  * the pinned engine serves on `/query` (what Grafana's InfluxQL data
  * source consumes). A request may batch several semicolon-separated
  * statements (one per dashboard panel); each becomes one `results`
  * entry keyed by `statement_id`. Write/DDL statements (DELETE, DROP
  * MEASUREMENT, CREATE/DROP CONTINUOUS QUERY) execute against the
  * store and answer with a bare statement_id entry, the v1 shape for
  * writes. Rows stream through `toLocalIterator` like the
  * annotated-CSV writer — the serializer is a response formatter, not
  * a computation site.
  */
object V1Query {

  /** ns-per-unit divisors for the `epoch` request param (Grafana always
    * sends `epoch=ms`); absent/unknown → RFC3339 strings, the v1
    * default.
    */
  private val epochDivisors = Map(
    "ns" -> 1L, "u" -> 1000L, "µ" -> 1000L, "ms" -> 1000000L,
    "s" -> 1000000000L, "m" -> 60L * 1000000000L, "h" -> 3600L * 1000000000L)

  def run(tsdb: Tsdb, db: String, q: String,
      cqs: Option[graft.streaming.ContinuousQueries] = None,
      epoch: Option[String] = None): String = {
    // v1 truncates toward zero when scaling UnixNano to the unit
    val epochDiv = epoch.flatMap(epochDivisors.get)
    val stmts = InfluxQL.parseAll(q)
    val source = InfluxQLEval.tsdbSource(tsdb, db)
    def registry = cqs.getOrElse(throw new IllegalArgumentException(
      "continuous queries are not enabled on this endpoint"))

    val mapper = Json.mapper
    val root = mapper.createObjectNode()
    val results = root.putArray("results")
    stmts.zipWithIndex.foreach { case (stmt, idx) =>
      val res = results.addObject()
      res.put("statement_id", idx)
      stmt match {
        case d: InfluxQL.DeleteStmt =>
          val (lo, hi, pred) = InfluxQLEval.deleteParts(d.where)
          tsdb.store.delete(db, lo, hi,
            col("measurement") === d.measurement && pred)
        case InfluxQL.DropMeasurement(m) =>
          // full-range drop incl. pre-1970 (negative epoch-ns) points
          tsdb.store.delete(db, Long.MinValue, Long.MaxValue, col("measurement") === m)
        case c: InfluxQL.CreateCq =>
          // echo only this statement's own text in SHOW CONTINUOUS
          // QUERIES, not the whole multi-statement batch
          registry.create(c.name, c.db, c.sel,
            if (c.text.nonEmpty) c.text else q,
            resampleEvery = c.resampleEvery, resampleFor = c.resampleFor)
        case InfluxQL.DropCq(name, cdb) =>
          registry.drop(name, cdb)
        case s: InfluxQL.Select if s.into.isDefined =>
          // ad-hoc SELECT INTO — the v1 backfill idiom: evaluate, write
          // the result as points of the target measurement, answer with
          // the v1 "result" series carrying the written count
          val written = selectInto(tsdb, db, s, source)
          val sObj = res.putArray("series").addObject()
          sObj.put("name", "result")
          val colsArr = sObj.putArray("columns")
          colsArr.add("time"); colsArr.add("written")
          val vals = sObj.putArray("values").addArray()
          epochDiv match {
            case Some(_) => vals.add(0L)
            case None => vals.add("1970-01-01T00:00:00Z")
          }
          vals.add(written)
        case readStmt =>
          val rr = evalRead(readStmt, tsdb, db, source, registry _)
          serialize(rr.df, rr.name, rr.tagCols, res, epochDiv, rr.nameCol)
      }
    }
    // an empty result still answers with one empty statement result
    mapper.writeValueAsString(root)
  }

  private final case class ReadResult(df: org.apache.spark.sql.DataFrame,
      name: String, tagCols: Seq[String], nameCol: Option[String])

  private def evalRead(readStmt: InfluxQL.Stmt, tsdb: Tsdb, db: String,
      source: InfluxQLEval.Source,
      registry: () => graft.streaming.ContinuousQueries): ReadResult = {
    val df = readStmt match {
      case InfluxQL.ShowContinuousQueries =>
        import tsdb.spark.implicits._
        registry().list.filter(_._1 == db).map(t => (t._2, t._3))
          .toDF("name", "query")
      case other =>
        // `… CARDINALITY ON db` targets another database: re-source
        val src = cardinalityOn(other).filter(_ != db)
          .map(InfluxQLEval.tsdbSource(tsdb, _)).getOrElse(source)
        InfluxQLEval.evalStmt(other, src, v1Time = true)
    }
    val (name, tagCols) = readStmt match {
      case s: InfluxQL.Select => (InfluxQL.fromName(s.from), s.groupTags)
      case e: InfluxQL.Explain => (InfluxQL.fromName(e.sel.from), Nil)
      case _: InfluxQL.ShowMeasurements => ("measurements", Nil)
      // v1 names the metadata series after the measurement: FROM
      // narrows to one; the FROM-less forms split one series per
      // measurement via the leading measurement column (nameCol
      // below), so the fallback label never shows on this source
      case s: InfluxQL.ShowTagKeys => (s.from.getOrElse("tagKeys"), Nil)
      case s: InfluxQL.ShowFieldKeys => (s.from.getOrElse("fieldKeys"), Nil)
      case s: InfluxQL.ShowTagValues => (s.from.getOrElse("tagValues"), Nil)
      case InfluxQL.ShowDatabases => ("databases", Nil)
      case _: InfluxQL.ShowRetentionPolicies => ("retentionPolicies", Nil)
      case _: InfluxQL.ShowSeries => ("series", Nil)
      case _: InfluxQL.ShowSeriesCardinality => ("series cardinality", Nil)
      case _: InfluxQL.ShowMeasurementCardinality => ("measurement cardinality", Nil)
      case _: InfluxQL.ShowTagKeyCardinality => ("tag key cardinality", Nil)
      case _: InfluxQL.ShowFieldKeyCardinality => ("field key cardinality", Nil)
      case InfluxQL.ShowContinuousQueries => (db, Nil)
      case other => throw new IllegalStateException(s"unserializable $other")
    }
    // FROM-less metadata listings split one series per measurement,
    // named by a leading measurement column (v1's shape); the column
    // itself stays out of the values
    val nameCol = (readStmt match {
      case s: InfluxQL.ShowTagKeys if s.from.isEmpty => Some("measurement")
      case s: InfluxQL.ShowTagValues if s.from.isEmpty => Some("measurement")
      case s: InfluxQL.ShowFieldKeys if s.from.isEmpty => Some("measurement")
      case _ => None
    }).filter(df.columns.contains)
    ReadResult(df, name, tagCols, nameCol)
  }

  /** Chunked mode (`chunked=true[&chunk_size=N]`): each chunk is one
    * complete `{"results":[…]}` JSON document passed to `emit`,
    * covering at most `chunkSize` rows of ONE series — v1's streaming
    * contract for large results (series-major: rows re-sort to
    * (series, time) so a series streams contiguously; v1 emits
    * series-major too). A series continuing into the next chunk
    * carries `"partial": true` on both the series and results objects.
    * Write/DDL statements answer with their usual single document.
    */
  def runChunked(tsdb: Tsdb, db: String, q: String,
      cqs: Option[graft.streaming.ContinuousQueries],
      epoch: Option[String], chunkSize: Int)(emit: String => Unit): Unit = {
    val epochDiv = epoch.flatMap(epochDivisors.get)
    val stmts = InfluxQL.parseAll(q)
    val source = InfluxQLEval.tsdbSource(tsdb, db)
    def registry = cqs.getOrElse(throw new IllegalArgumentException(
      "continuous queries are not enabled on this endpoint"))
    val mapper = Json.mapper
    def emitBare(idx: Int): Unit = {
      val root = mapper.createObjectNode()
      root.putArray("results").addObject().put("statement_id", idx)
      emit(mapper.writeValueAsString(root))
    }
    stmts.zipWithIndex.foreach { case (stmt, idx) =>
      stmt match {
        case d: InfluxQL.DeleteStmt =>
          val (lo, hi, pred) = InfluxQLEval.deleteParts(d.where)
          tsdb.store.delete(db, lo, hi,
            col("measurement") === d.measurement && pred)
          emitBare(idx)
        case InfluxQL.DropMeasurement(m) =>
          tsdb.store.delete(db, Long.MinValue, Long.MaxValue,
            col("measurement") === m)
          emitBare(idx)
        case c: InfluxQL.CreateCq =>
          registry.create(c.name, c.db, c.sel,
            if (c.text.nonEmpty) c.text else q,
            resampleEvery = c.resampleEvery, resampleFor = c.resampleFor)
          emitBare(idx)
        case InfluxQL.DropCq(name, cdb) =>
          registry.drop(name, cdb)
          emitBare(idx)
        case s: InfluxQL.Select if s.into.isDefined =>
          val written = selectInto(tsdb, db, s, source)
          val root = mapper.createObjectNode()
          val res = root.putArray("results").addObject()
          res.put("statement_id", idx)
          val sObj = res.putArray("series").addObject()
          sObj.put("name", "result")
          val colsArr = sObj.putArray("columns")
          colsArr.add("time"); colsArr.add("written")
          val vals = sObj.putArray("values").addArray()
          if (epochDiv.isDefined) vals.add(0L) else vals.add("1970-01-01T00:00:00Z")
          vals.add(written)
          emit(mapper.writeValueAsString(root))
        case readStmt =>
          val rr = evalRead(readStmt, tsdb, db, source, registry _)
          val cols = rr.df.columns.toSeq
          // series-major streaming order: series key first, then the
          // original time direction
          val orderKeys = (rr.nameCol.toSeq ++ rr.tagCols).map(col) ++
            (if (cols.contains("time")) readStmt match {
              case s: InfluxQL.Select if s.orderDesc => Seq(col("time").desc)
              case _ => Seq(col("time").asc)
            } else Nil)
          val ordered = if (orderKeys.nonEmpty) rr.df.orderBy(orderKeys: _*) else rr.df
          val valueCols = cols.filterNot(c =>
            rr.tagCols.contains(c) || rr.nameCol.contains(c))
          val keyIdx = (rr.nameCol.toSeq ++ rr.tagCols).map(cols.indexOf)
          val valIdx = valueCols.map(cols.indexOf)
          val it = ordered.toLocalIterator()
          val buf = new java.util.ArrayList[org.apache.spark.sql.Row]()
          var curKey: Seq[String] = null
          var emitted = false
          // v1's two partial flags diverge: series-level "partial"
          // marks the SAME series continuing into the next chunk;
          // results-level "partial" marks ANY further chunk for this
          // statement (including a different series under GROUP BY)
          def flush(seriesPartial: Boolean, resultPartial: Boolean): Unit = {
            if (curKey == null) return
            val root = mapper.createObjectNode()
            val res = root.putArray("results").addObject()
            res.put("statement_id", idx)
            val sObj = res.putArray("series").addObject()
            sObj.put("name",
              if (rr.nameCol.isDefined) curKey.head else rr.name)
            val tagVals = if (rr.nameCol.isDefined) curKey.tail else curKey
            if (rr.tagCols.nonEmpty) {
              val tags = sObj.putObject("tags")
              rr.tagCols.zip(tagVals).foreach { case (tc, tv) => tags.put(tc, tv) }
            }
            val columns = sObj.putArray("columns")
            valueCols.foreach(columns.add)
            val values = sObj.putArray("values")
            buf.forEach { row =>
              val arr = values.addArray()
              valIdx.foreach(i => addCell(arr, row.get(i), epochDiv))
            }
            if (seriesPartial) sObj.put("partial", true)
            if (resultPartial) res.put("partial", true)
            emit(mapper.writeValueAsString(root))
            buf.clear()
            emitted = true
          }
          while (it.hasNext) {
            val row = it.next()
            val key = keyIdx.map(i => String.valueOf(row.get(i)))
            if (curKey != null && (key != curKey || buf.size() >= chunkSize))
              // mid-stream flush: the row in hand always follows in a
              // later chunk, so the result is partial regardless of
              // whether the series continues
              flush(seriesPartial = key == curKey, resultPartial = true)
            curKey = key
            buf.add(row)
          }
          flush(seriesPartial = false, resultPartial = false)
          if (!emitted) { // empty result still answers one bare document
            val root = mapper.createObjectNode()
            root.putArray("results").addObject().put("statement_id", idx)
            emit(mapper.writeValueAsString(root))
          }
      }
    }
  }


  private def addCell(arr: com.fasterxml.jackson.databind.node.ArrayNode,
      v: Any, epochDiv: Option[Long]): Unit = v match {
    case null => arr.addNull(); ()
    case t: java.sql.Timestamp => epochDiv match {
      case Some(div) =>
        val inst = t.toInstant
        arr.add((inst.getEpochSecond * 1000000000L + inst.getNano) / div); ()
      case None => arr.add(t.toInstant.toString); ()
    }
    case d: java.lang.Double => arr.add(d.doubleValue()); ()
    case l: java.lang.Long => arr.add(l.longValue()); ()
    case n: java.lang.Integer => arr.add(n.intValue()); ()
    case b: java.lang.Boolean => arr.add(b.booleanValue()); ()
    case other => arr.add(String.valueOf(other)); ()
  }

  private def cardinalityOn(s: InfluxQL.Stmt): Option[String] = s match {
    case InfluxQL.ShowSeriesCardinality(on) => on
    case InfluxQL.ShowMeasurementCardinality(on) => on
    case InfluxQL.ShowTagKeyCardinality(on) => on
    case InfluxQL.ShowFieldKeyCardinality(on) => on
    case _ => None
  }

  /** Evaluate the SELECT (sans INTO), convert its result rows to
    * canonical points of the target measurement (one point per value
    * column; GROUP BY tags become the tag set; null aggregates are not
    * written, as in v1), write through the store, return the count.
    * An ungrouped aggregate row carries epoch-0 time like the v1
    * engine's INTO output.
    */
  private def selectInto(tsdb: Tsdb, db: String, s: InfluxQL.Select,
      source: InfluxQLEval.Source): Long = {
    import org.apache.spark.sql.functions._
    val df0 = InfluxQLEval.evalStmt(s.copy(into = None), source)
    val df =
      if (df0.columns.contains("time")) df0
      else df0.withColumn("time", timestamp_micros(lit(0L)))
    val tagCols = s.groupTags
    val valueCols = df.columns.filterNot(c => c == "time" || tagCols.contains(c))
    val tagsCol =
      if (tagCols.isEmpty) typedLit(Map.empty[String, String])
      else map_from_arrays(
        array(tagCols.map(lit): _*),
        array(tagCols.map(t => col(t).cast("string")): _*))
    val parts = valueCols.map { c =>
      // dispatch each result column to its typed store column, the way
      // the v1 engine's INTO preserves field types (string/bool were
      // previously skipped as a documented boundary — now written;
      // unsigned can't be told apart from long in a DataFrame, so
      // uint history re-lands as integer, the lossless superset)
      import org.apache.spark.sql.types._
      val nullD = lit(null).cast("double")
      val nullL = lit(null).cast("long")
      val nullS = lit(null).cast("string")
      val nullB = lit(null).cast("boolean")
      val (vf, vi, vs, vb) = df.schema(c).dataType match {
        case BooleanType => (nullD, nullL, nullS, col(c))
        case StringType => (nullD, nullL, col(c), nullB)
        case ByteType | ShortType | IntegerType | LongType =>
          (nullD, col(c).cast("long"), nullS, nullB)
        case _ => (col(c).cast("double"), nullL, nullS, nullB)
      }
      df.select(
        col("time"),
        (unix_micros(col("time")) * 1000L).as("time_ns"),
        lit(s.into.get).as("measurement"),
        lit(c).as("field"),
        vf.as("value_f"),
        vi.as("value_i"),
        vs.as("value_s"),
        vb.as("value_b"),
        tagsCol.as("tags"))
        .filter(col("value_f").isNotNull || col("value_i").isNotNull ||
          col("value_s").isNotNull || col("value_b").isNotNull)
    }
    val long = parts.reduce(_ unionByName _).cache()
    try {
      val n = long.count()
      tsdb.to(db, long)
      n
    } finally { long.unpersist(); () }
  }

  private def serialize(df: org.apache.spark.sql.DataFrame, name: String,
      tagCols: Seq[String],
      res: com.fasterxml.jackson.databind.node.ObjectNode,
      epochDiv: Option[Long] = None,
      nameCol: Option[String] = None): Unit = {
    val cols = df.columns.toSeq
    val valueCols = cols.filterNot(c => tagCols.contains(c) || nameCol.contains(c))
    val tagIdx = tagCols.map(cols.indexOf)
    val nameIdx = nameCol.map(cols.indexOf)
    val valIdx = valueCols.map(cols.indexOf)
    val seriesArr = res.putArray("series")

    // one series per tag combination (InfluxQL splits series by GROUP BY
    // tags) — or per `nameCol` value for FROM-less metadata listings;
    // insertion order = first appearance in the ordered result
    val series = new java.util.LinkedHashMap[Seq[String], com.fasterxml.jackson.databind.node.ArrayNode]()
    val it = df.toLocalIterator()
    while (it.hasNext) {
      val row = it.next()
      val key = (nameIdx.toSeq ++ tagIdx).map(i => String.valueOf(row.get(i)))
      val values = series.computeIfAbsent(key, { k =>
        val s = seriesArr.addObject()
        s.put("name", if (nameIdx.isDefined) k.head else name)
        val tagVals = if (nameIdx.isDefined) k.tail else k
        if (tagCols.nonEmpty) {
          val tags = s.putObject("tags")
          tagCols.zip(tagVals).foreach { case (tc, tv) => tags.put(tc, tv) }
        }
        val columns = s.putArray("columns")
        valueCols.foreach(columns.add)
        s.putArray("values")
      })
      val arr = values.addArray()
      valIdx.foreach(i => addCell(arr, row.get(i), epochDiv))
    }
  }
}
