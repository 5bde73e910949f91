package graft.service

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Flux annotated-CSV response encoder — the engine's query response
  * format (`/api/v2/query` streams annotated CSV; SURVEY §2B "CSV
  * annotated output"). Emits the `#datatype` / `#group` / `#default`
  * annotation rows, a `result` column (defaulted via `#default`), and a
  * per-group-key `table` index, like the pinned engine does.
  *
  * The encoder STREAMS: rows flow `toLocalIterator → Appendable`, so
  * driver memory stays O(partition fetch) no matter how large the
  * (already limited/aggregated) result is — the HTTP path hands it the
  * chunked response stream directly; [[format]] is the buffered
  * convenience for tests and small results.
  */
object AnnotatedCsv {

  def format(df: DataFrame, groupKey: Seq[String] = Nil, resultName: String = "_result"): String = {
    val sb = new java.lang.StringBuilder
    write(df, sb, groupKey, resultName)
    sb.toString
  }

  /** Stream the annotated-CSV encoding of `df` into `out` (an
    * `Appendable` — a Writer over the HTTP chunked stream, or a
    * StringBuilder in [[format]]).
    */
  def write(df: DataFrame, out: Appendable, groupKey: Seq[String] = Nil,
      resultName: String = "_result"): Unit = {
    val schema = df.schema
    val cols = schema.fields.toSeq

    def dt(t: DataType): String = t match {
      case StringType => "string"
      case LongType | IntegerType | ShortType | ByteType => "long"
      case DoubleType | FloatType | _: DecimalType => "double"
      case BooleanType => "boolean"
      case TimestampType => "dateTime:RFC3339"
      case DateType => "dateTime:RFC3339"
      case _ => "string"
    }

    out.append("#datatype,string,long")
    cols.foreach(f => out.append(',').append(dt(f.dataType)))
    out.append("\r\n")

    out.append("#group,false,false")
    cols.foreach(f => out.append(',').append(groupKey.contains(f.name).toString))
    out.append("\r\n")

    out.append("#default,").append(resultName).append(",")
    cols.foreach(_ => out.append(','))
    out.append("\r\n")

    out.append(",result,table")
    cols.foreach(f => out.append(',').append(escape(f.name)))
    out.append("\r\n")

    val keyIdx = groupKey.flatMap(k => cols.indexWhere(_.name == k) match {
      case -1 => None
      case i => Some(i)
    })
    var table = -1
    var lastKey: Seq[Any] = null
    val fmt = java.time.format.DateTimeFormatter.ISO_INSTANT

    df.toLocalIterator().forEachRemaining { row =>
      val key = keyIdx.map(row.get)
      if (lastKey == null || key != lastKey) { table += 1; lastKey = key }
      out.append(",,").append(table.toString)
      var i = 0
      while (i < cols.length) {
        out.append(',')
        val v = row.get(i)
        if (v != null) cols(i).dataType match {
          case TimestampType =>
            out.append(fmt.format(row.getTimestamp(i).toInstant))
          case DateType =>
            out.append(v.toString).append("T00:00:00Z")
          case StringType => out.append(escape(v.toString))
          case _ => out.append(v.toString)
        }
        i += 1
      }
      out.append("\r\n")
    }
    out.append("\r\n") // table terminator
    ()
  }

  /** The empty STRING is written as a quoted empty (`""`) so it stays
    * distinguishable from a null's bare empty cell — the one place
    * this dialect diverges from Go's encoding/csv (which writes both
    * bare, making "" and null collapse on read); [[parse]] accepts
    * either spelling, treating a bare empty cell as default/null and a
    * quoted empty as the empty string.
    */
  private def escape(s: String): String =
    if (s.isEmpty) "\"\""
    else if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  // ---------------- decoder: the Flux stdlib `csv.from` source ----------------

  /** Decode the annotated-CSV dialect [[write]] emits back into a
    * DataFrame — the `csv.from` round-trip a Flux user expects
    * (query → annotated CSV → `csv.from` ≡ query). Schema comes from
    * the `#datatype` row; the transport bookkeeping (`result`/`table`
    * columns, `#group`/`#default` rows) is consumed, not returned —
    * the pipeline operates on the data columns and the frame
    * re-synthesizes bookkeeping on output.
    *
    * Multi-table payloads (a real 2.0.9 multi-`yield` response is
    * several annotation sections, each with its own `#datatype`) are
    * decoded per block: same-schema blocks union into one frame; a
    * payload whose blocks carry DIFFERENT schemas is genuinely
    * ambiguous as a single frame and rejects loudly, pointing at
    * [[parseResults]] / `csv.from(result:)` to select one.
    *
    * Decodes on the driver BY DESIGN: `csv.from(csv:)` payloads are
    * script-embedded strings (KBs — a script body), never corpus data;
    * file-scale CSV belongs to `spark.read.csv` with an explicit
    * schema.
    */
  def parse(text: String, spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val rs = parseResults(text, spark)
    if (rs.lengthCompare(1) == 0) rs.head._2
    else if (rs.map(_._2.schema).distinct.lengthCompare(1) == 0)
      rs.map(_._2).reduce(_ unionAll _)
    else
      throw new IllegalArgumentException(
        "csv.from: payload contains multiple annotated tables with different " +
          s"schemas (results: ${rs.map(_._1).mkString(", ")}) — select one with " +
          "csv.from(csv: …, result: \"name\") or decode the result-set map " +
          "with AnnotatedCsv.parseResults")
  }

  /** Decode a (possibly multi-table) annotated-CSV payload into Flux's
    * result-set map: one `(resultName, frame)` entry per annotation
    * block, in payload order. The result name comes from the block's
    * `#default` row (the dialect's result default) or, when body rows
    * carry an explicit `result` cell, the first such value; blocks
    * without either decode as `_result`. Names are NOT deduplicated —
    * a multi-yield script can emit two blocks under one name (same
    * result, new schema); callers selecting by name union same-schema
    * matches.
    */
  def parseResults(text: String,
      spark: org.apache.spark.sql.SparkSession): Seq[(String, DataFrame)] = {
    // Driver-side decode needs a byte bound (mirrors the cosPairs
    // guard pattern): the payload is parsed single-threaded on the
    // driver inside the query path, so a pathological multi-MB body
    // must fail fast instead of stalling the server. The limit is
    // generous for script-embedded payloads; file-scale CSV belongs
    // in spark.read.csv with an explicit schema.
    val maxBytes = spark.conf.get("spark.graft.csvFrom.maxBytes", (4 * 1024 * 1024).toString).toLong
    if (text.length > maxBytes)
      throw new IllegalArgumentException(
        s"csv.from: payload is ${text.length} bytes, over the " +
          s"spark.graft.csvFrom.maxBytes limit of $maxBytes — " +
          "load file-scale CSV with spark.read.csv and an explicit schema instead")
    // a one-cell UNQUOTED empty record is a blank separator line (the
    // table terminator). A QUOTED one (`""`) is kept here: in a
    // single-column string table it is a data row holding the empty
    // string (the write→parse lossless claim extends to that shape);
    // decodeBlock drops it as a stray separator only once the block's
    // width proves it cannot be data.
    val recs = records(text)
      .filterNot(r => r.length == 1 && r.head.v.isEmpty && !r.head.quoted)
    if (recs.isEmpty)
      throw new IllegalArgumentException("csv.from: empty annotated CSV")
    // block split: a new annotation row AFTER the current block's
    // header/body opens the next table's section (new #datatype ⇒ new
    // schema — the multi-yield wire shape)
    val blocks = Seq.newBuilder[Seq[Seq[Cell]]]
    var cur = Seq.newBuilder[Seq[Cell]]
    var curN = 0
    var seenBody = false
    recs.foreach { r =>
      val isAnn = r.head.v.startsWith("#")
      if (isAnn && seenBody) {
        blocks += cur.result(); cur = Seq.newBuilder; curN = 0; seenBody = false
      }
      if (!isAnn && !(r.length == 1 && r.head.v.isEmpty)) seenBody = true
      cur += r; curN += 1
    }
    if (curN > 0) blocks += cur.result()
    blocks.result().map(b => decodeBlock(b, spark))
  }

  /** Decode one annotation block (annotations + header + body rows)
    * into its result name and frame.
    */
  private def decodeBlock(recs: Seq[Seq[Cell]],
      spark: org.apache.spark.sql.SparkSession): (String, DataFrame) = {
    val datatype = recs.find(_.head.v == "#datatype").getOrElse(
      throw new IllegalArgumentException("csv.from: missing #datatype annotation"))
    // the header is the first non-annotation record; a lone quoted
    // empty cannot be a header (a single unnamed column is not a
    // schema), so skip those while searching
    val header = recs.find(r => !r.head.v.startsWith("#") &&
        !(r.length == 1 && r.head.v.isEmpty)).getOrElse(
      throw new IllegalArgumentException("csv.from: missing header row"))
    // bookkeeping prefix: "",result,table — tolerate its absence so a
    // hand-written annotated CSV without the transport columns loads too
    val dataStart = header.indexWhere(_.v == "table") match {
      case -1 => 0
      case i => i + 1
    }
    val names = header.drop(dataStart).map(_.v)
    // the #datatype row leads with its marker cell; when the payload
    // has no transport columns (dataStart = 0) the marker must still
    // be dropped or names/types misalign by one
    val types = datatype.drop(math.max(dataStart, 1)).map(_.v).map {
      case "long" | "unsignedLong" => LongType
      case "double" => DoubleType
      case "boolean" => BooleanType
      case t if t.startsWith("dateTime") => TimestampType
      case _ => StringType
    }
    if (names.length != types.length)
      throw new IllegalArgumentException(
        s"csv.from: #datatype has ${types.length} entries for ${names.length} columns")
    // #default row: the dialect's per-column fill for EMPTY cells —
    // an empty cell takes the default (itself parsed by the column
    // type); only an empty default yields null
    // like #datatype, the #default row leads with its marker cell —
    // without transport columns (dataStart = 0) the marker must still
    // be dropped or every default shifts one column left
    val defaults: Seq[String] = recs.find(_.head.v == "#default")
      .map(_.drop(math.max(dataStart, 1)).map(_.v)).getOrElse(Nil)
    def cell(c: Cell, t: DataType, j: Int): Any = {
      // A quoted empty on a STRING column is the empty string — that
      // keeps [[write]]'s "" distinguishable from null on the round
      // trip. On NON-string columns a quoted empty cannot mean a
      // value, so it takes the column default like a bare cell does —
      // otherwise a quote-everything producer (Python QUOTE_ALL; the
      // Go dialect erases quotedness entirely) would silently turn
      // every defaulted numeric cell into null. Residual ambiguity,
      // documented: a QUOTE_ALL producer's defaulted STRING cells
      // decode as "" rather than the default.
      if (c.v.isEmpty && c.quoted && t == StringType) return ""
      val raw = if (c.v.nonEmpty) c.v else defaults.lift(j).getOrElse("")
      if (raw.isEmpty) null
      else t match {
        case LongType => raw.toLong
        case DoubleType => raw.toDouble
        case BooleanType => raw.toBoolean
        case TimestampType =>
          java.sql.Timestamp.from(java.time.Instant.parse(raw))
        case _ => raw
      }
    }
    val headerIdx = recs.indexOf(header)
    // body rows; a lone `""` record is a data row ONLY when the table
    // is one column wide AND the cell can decode to a value: a STRING
    // column holds the empty string, and any column with a non-empty
    // #default takes that default (cell()'s QUOTE_ALL rule). A width-1
    // non-string column WITHOUT a default would only yield a phantom
    // null row, so there `""` stays a stray separator — as does any
    // lone empty in a wider table
    val width = dataStart + names.length
    val loneIsData = width == 1 && (types.headOption.contains(StringType) ||
      defaults.headOption.exists(_.nonEmpty))
    val body = recs.drop(headerIdx + 1)
      .filterNot(r => r.length == 1 && r.head.v.isEmpty && !loneIsData)
    val rows = body
      .map { r =>
        org.apache.spark.sql.Row.fromSeq(names.indices.map { j =>
          cell(if (dataStart + j < r.length) r(dataStart + j) else Cell("", quoted = false), types(j), j)
        })
      }
    val schema = StructType(names.zip(types).map {
      case (n, t) => StructField(n, t, nullable = true)
    })
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(rows.asJava, schema)
    // result name: the transport `result` column sits just before
    // `table` (cell index dataStart - 2 when the prefix exists — the
    // same index in body rows and in the #default row, whose marker
    // occupies the header's unnamed leading cell); an explicit body
    // value wins, else the #default entry, else `_result`
    val resultName = {
      val rIdx = dataStart - 2
      def at(r: Seq[Cell]): Option[String] =
        if (rIdx >= 0 && rIdx < r.length && r(rIdx).v.nonEmpty) Some(r(rIdx).v) else None
      body.iterator.flatMap(at).nextOption()
        .orElse(recs.find(_.head.v == "#default").flatMap(at))
        .getOrElse("_result")
    }
    (resultName, df)
  }

  /** One parsed field: the text plus whether it was quoted — a quoted
    * empty (`""`) must stay distinguishable from an absent cell (see
    * [[escape]]'s empty-string note).
    */
  private final case class Cell(v: String, quoted: Boolean)

  /** Char-level CSV record reader: quoted fields may contain commas,
    * doubled quotes, and raw CR/LF — exactly what [[escape]] produces.
    */
  private def records(s: String): Seq[Seq[Cell]] = {
    val out = Seq.newBuilder[Seq[Cell]]
    val field = new StringBuilder
    var fields = Seq.newBuilder[Cell]
    var nFields = 0
    var inQ = false
    var quoted = false // current field was quoted (keeps "" as empty-but-present)
    var i = 0
    def endField(): Unit = {
      fields += Cell(field.toString, quoted); nFields += 1
      field.setLength(0); quoted = false
    }
    def endRec(): Unit = {
      endField(); out += fields.result(); fields = Seq.newBuilder[Cell]; nFields = 0
    }
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) {
        if (c == '"') {
          if (i + 1 < s.length && s.charAt(i + 1) == '"') { field.append('"'); i += 1 }
          else inQ = false
        } else field.append(c)
      } else c match {
        case '"' => inQ = true; quoted = true
        case ',' => endField()
        case '\r' => // CRLF: the \n closes the record
        case '\n' => endRec()
        case other => field.append(other)
      }
      i += 1
    }
    if (field.nonEmpty || nFields > 0 || quoted) endRec() // no trailing newline
    out.result()
  }
}
