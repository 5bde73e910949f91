package graft.service

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Flux annotated-CSV response encoder — the engine's query response
  * format (`/api/v2/query` streams annotated CSV; SURVEY §2B "CSV
  * annotated output"). Emits the `#datatype` / `#group` / `#default`
  * annotation rows, a `result` column (defaulted via `#default`), and a
  * per-group-key `table` index, like the pinned engine does.
  *
  * Formatting a response is inherently a driver-side materialization of
  * the (already limited/aggregated) result — the heavy lifting stayed
  * distributed in the query itself.
  */
object AnnotatedCsv {

  def format(df: DataFrame, groupKey: Seq[String] = Nil, resultName: String = "_result"): String = {
    val schema = df.schema
    val cols = schema.fields.toSeq
    val sb = new StringBuilder

    def dt(t: DataType): String = t match {
      case StringType => "string"
      case LongType | IntegerType | ShortType | ByteType => "long"
      case DoubleType | FloatType | _: DecimalType => "double"
      case BooleanType => "boolean"
      case TimestampType => "dateTime:RFC3339"
      case DateType => "dateTime:RFC3339"
      case _ => "string"
    }

    sb.append("#datatype,string,long")
    cols.foreach(f => sb.append(',').append(dt(f.dataType)))
    sb.append("\r\n")

    sb.append("#group,false,false")
    cols.foreach(f => sb.append(',').append(groupKey.contains(f.name).toString))
    sb.append("\r\n")

    sb.append("#default,").append(resultName).append(",")
    cols.foreach(_ => sb.append(','))
    sb.append("\r\n")

    sb.append(",result,table")
    cols.foreach(f => sb.append(',').append(escape(f.name)))
    sb.append("\r\n")

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
      sb.append(",,").append(table)
      var i = 0
      while (i < cols.length) {
        sb.append(',')
        val v = row.get(i)
        if (v != null) cols(i).dataType match {
          case TimestampType =>
            sb.append(fmt.format(row.getTimestamp(i).toInstant))
          case DateType =>
            sb.append(v.toString).append("T00:00:00Z")
          case StringType => sb.append(escape(v.toString))
          case _ => sb.append(v.toString)
        }
        i += 1
      }
      sb.append("\r\n")
    }
    sb.append("\r\n") // table terminator
    sb.toString
  }

  private def escape(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s
}
