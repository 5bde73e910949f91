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

  private def escape(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s
}
