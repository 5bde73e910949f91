package graft.lineprotocol

import graft.model.Point

/** InfluxDB line-protocol parser/serializer.
  *
  * Grammar (public InfluxDB 2.x line-protocol spec, the write format of
  * the engine the reference pins at recipe.yaml:110):
  *
  * {{{
  * measurement[,tagKey=tagVal...] fieldKey=fieldVal[,...] [timestamp]
  * }}}
  *
  * - measurement/tag keys/tag values escape `,` ` ` `=` (and measurement
  *   only `,` and ` `) with a backslash
  * - field values: `1.0` float, `1i` int, `1u` uint, `t/f/true/false/T/F`
  *   bool, `"str"` string with `\"` and `\\` escapes
  * - timestamp: optional int64 ns since epoch; absent → caller supplies
  *   a server-assigned default
  *
  * Pure Scala (no Spark deps) so it is usable from executors in both the
  * batch `Dataset[String].flatMap` path and the streaming source.
  */
object LineProtocol {

  final case class ParseError(line: String, msg: String)
      extends Exception(s"line protocol: $msg in: $line")

  /** Parse one line into one Point per field. Returns Nil for blank /
    * comment lines. Throws ParseError on malformed input (callers on the
    * ingest path use [[parseLenient]]).
    */
  def parseLine(line: String, defaultTimeNs: => Long = System.currentTimeMillis() * 1000000L,
      tsScaleNs: Long = 1L): Seq[Point] = {
    val s = line
    if (s == null) return Nil
    val trimmed = s.trim
    if (trimmed.isEmpty || trimmed.startsWith("#")) return Nil

    var i = 0
    val n = s.length
    // skip leading whitespace
    while (i < n && s.charAt(i) == ' ') i += 1

    // --- measurement: until unescaped ',' or ' '
    val meas = new StringBuilder
    var done = false
    while (i < n && !done) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < n && (s.charAt(i + 1) == ',' || s.charAt(i + 1) == ' ')) {
        meas.append(s.charAt(i + 1)); i += 2
      } else if (c == ',' || c == ' ') done = true
      else { meas.append(c); i += 1 }
    }
    if (meas.isEmpty) throw ParseError(line, "empty measurement")

    // --- tags
    val tags = Map.newBuilder[String, String]
    while (i < n && s.charAt(i) == ',') {
      i += 1
      val k = readEscaped(s, i, line); i = k._2
      if (i >= n || s.charAt(i) != '=') throw ParseError(line, s"tag '${k._1}' missing '='")
      i += 1
      val v = readEscaped(s, i, line); i = v._2
      if (k._1.isEmpty || v._1.isEmpty) throw ParseError(line, "empty tag key or value")
      tags += (k._1 -> v._1)
    }
    if (i >= n || s.charAt(i) != ' ') throw ParseError(line, "missing field set")
    while (i < n && s.charAt(i) == ' ') i += 1

    // --- fields
    var fields = List.empty[(String, FieldValue)]
    var more = true
    while (more) {
      val k = readEscaped(s, i, line); i = k._2
      if (i >= n || s.charAt(i) != '=') throw ParseError(line, s"field '${k._1}' missing '='")
      i += 1
      val (fv, ni) = readFieldValue(s, i, line); i = ni
      fields ::= (k._1 -> fv)
      if (i < n && s.charAt(i) == ',') i += 1 else more = false
    }
    if (fields.isEmpty) throw ParseError(line, "no fields")

    // --- optional timestamp
    var ts = -1L
    var hasTs = false
    if (i < n && s.charAt(i) == ' ') {
      while (i < n && s.charAt(i) == ' ') i += 1
      if (i < n) {
        val t0 = i
        if (s.charAt(i) == '-') i += 1
        while (i < n && s.charAt(i).isDigit) i += 1
        val tstr = s.substring(t0, i)
        if (tstr.isEmpty || (i < n && s.substring(i).trim.nonEmpty))
          throw ParseError(line, "invalid timestamp")
        ts = tstr.toLong
        hasTs = true
      }
    }
    // precision= scaling applies to SUPPLIED timestamps only; lines
    // without one get the server-assigned default, which is already ns.
    val timeNs = if (hasTs) ts * tsScaleNs else defaultTimeNs
    val tagMap = tags.result()

    fields.reverse.map { case (fk, fv) =>
      fv match {
        case FieldValue.F(v) => Point(meas.toString, tagMap, fk, Some(v), None, None, None, None, timeNs)
        case FieldValue.I(v) => Point(meas.toString, tagMap, fk, None, Some(v), None, None, None, timeNs)
        case FieldValue.U(v) => Point(meas.toString, tagMap, fk, None, None, Some(v), None, None, timeNs)
        case FieldValue.S(v) => Point(meas.toString, tagMap, fk, None, None, None, Some(v), None, timeNs)
        case FieldValue.B(v) => Point(meas.toString, tagMap, fk, None, None, None, None, Some(v), timeNs)
      }
    }
  }

  /** Lenient form for the ingest hot path: malformed lines are dropped
    * (InfluxDB's /api/v2/write returns per-batch errors; our streaming
    * path routes them to a rejected-lines metric instead of failing the
    * batch).
    */
  /** ns multiplier for a v2 `precision=` query param value. */
  def precisionScale(p: String): Option[Long] = p match {
    case "ns" => Some(1L)
    case "us" => Some(1000L)
    case "ms" => Some(1000000L)
    case "s"  => Some(1000000000L)
    case _    => None
  }

  def parseLenient(line: String, defaultTimeNs: => Long,
      tsScaleNs: Long = 1L): Seq[Point] =
    try parseLine(line, defaultTimeNs, tsScaleNs)
    catch { case _: ParseError => Nil }

  sealed trait FieldValue
  object FieldValue {
    final case class F(v: Double) extends FieldValue
    final case class I(v: Long) extends FieldValue
    final case class U(v: Long) extends FieldValue
    final case class S(v: String) extends FieldValue
    final case class B(v: Boolean) extends FieldValue
  }

  /** Read a key/tag-value token: until unescaped ',', ' ' or '='. */
  private def readEscaped(s: String, start: Int, line: String): (String, Int) = {
    val sb = new StringBuilder
    var i = start
    val n = s.length
    var done = false
    while (i < n && !done) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < n && (s.charAt(i + 1) == ',' || s.charAt(i + 1) == ' ' || s.charAt(i + 1) == '=')) {
        sb.append(s.charAt(i + 1)); i += 2
      } else if (c == ',' || c == ' ' || c == '=') done = true
      else { sb.append(c); i += 1 }
    }
    (sb.toString, i)
  }

  private def readFieldValue(s: String, start: Int, line: String): (FieldValue, Int) = {
    var i = start
    val n = s.length
    if (i >= n) throw ParseError(line, "missing field value")
    s.charAt(i) match {
      case '"' =>
        i += 1
        val sb = new StringBuilder
        var closed = false
        while (i < n && !closed) {
          val c = s.charAt(i)
          if (c == '\\' && i + 1 < n && (s.charAt(i + 1) == '"' || s.charAt(i + 1) == '\\')) {
            sb.append(s.charAt(i + 1)); i += 2
          } else if (c == '"') { closed = true; i += 1 }
          else { sb.append(c); i += 1 }
        }
        if (!closed) throw ParseError(line, "unterminated string field")
        (FieldValue.S(sb.toString), i)
      case 't' | 'T' | 'f' | 'F' =>
        val t0 = i
        while (i < n && s.charAt(i) != ',' && s.charAt(i) != ' ') i += 1
        s.substring(t0, i).toLowerCase match {
          case "t" | "true"  => (FieldValue.B(true), i)
          case "f" | "false" => (FieldValue.B(false), i)
          case other          => throw ParseError(line, s"invalid boolean '$other'")
        }
      case _ =>
        val t0 = i
        while (i < n && s.charAt(i) != ',' && s.charAt(i) != ' ') i += 1
        val tok = s.substring(t0, i)
        if (tok.isEmpty) throw ParseError(line, "empty field value")
        try {
          if (tok.endsWith("i")) (FieldValue.I(tok.dropRight(1).toLong), i)
          else if (tok.endsWith("u")) (FieldValue.U(java.lang.Long.parseUnsignedLong(tok.dropRight(1))), i)
          else (FieldValue.F(tok.toDouble), i)
        } catch {
          case _: NumberFormatException => throw ParseError(line, s"invalid field value '$tok'")
        }
    }
  }

  /** Serialize a Point back to line protocol (used by the `to()` sink when
    * exporting, and in round-trip property tests).
    *
    * Per the LP spec, backslashes in measurements/tags/keys are literal
    * (only `,` ` ` `=` are escaped) — which means a backslash immediately
    * preceding a special character or at end-of-token is unrepresentable,
    * the same dark corner the reference engine has.
    */
  def serialize(p: Point): String = {
    def escTag(s: String) = s.replace(",", "\\,").replace(" ", "\\ ").replace("=", "\\=")
    def escMeas(s: String) = s.replace(",", "\\,").replace(" ", "\\ ")
    val tags = p.tags.toSeq.sortBy(_._1).map { case (k, v) => s",${escTag(k)}=${escTag(v)}" }.mkString
    val v = (p.valueF, p.valueI, p.valueU, p.valueS, p.valueB) match {
      case (Some(f), _, _, _, _) => serializeDouble(f)
      case (_, Some(x), _, _, _) => s"${x}i"
      case (_, _, Some(u), _, _) => java.lang.Long.toUnsignedString(u) + "u"
      case (_, _, _, Some(str), _) => "\"" + str.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      case (_, _, _, _, Some(b)) => if (b) "true" else "false"
      case _ => throw new IllegalArgumentException("point with no value")
    }
    s"${escMeas(p.measurement)}$tags ${escTag(p.field)}=$v ${p.timeNs}"
  }

  private def serializeDouble(d: Double): String =
    // explicit locale: under a comma-decimal default (e.g. de_DE) the
    // f-interpolator would emit "1,0" — malformed line protocol
    if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15)
      String.format(java.util.Locale.ROOT, "%.1f", Double.box(d))
    else d.toString
}
