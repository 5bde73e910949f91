package graft.influxql

/** Parser for the InfluxQL subset the pinned engine serves over its v1
  * compatibility API (`/query?db=…&q=…`) — the query language Grafana's
  * InfluxQL data source speaks against the reference deployment
  * (reference README's Grafana integration section; the 2.0.9 container
  * exposes v1 compat with DBRP mappings).
  *
  * Covered grammar:
  * {{{
  * SELECT <agg>(field)[, …] | field[, …] | * | <arith over aggs/fields>
  *   FROM measurement[, …] | /regex/ | ( SELECT … )
  *   [WHERE time >= '…' AND time < now() - 7d AND tag = 'v' AND tag =~ /re/ …]
  *   [GROUP BY time(1h[, offset])[, tag, …]] [FILL(none|null|previous|linear|0|…)]
  *   [ORDER BY time DESC] [LIMIT n] [OFFSET n] [SLIMIT n] [SOFFSET n]
  *   [tz('America/Chicago')]
  * SHOW MEASUREMENTS [WITH MEASUREMENT =~ /re/ | = m] [LIMIT n] [OFFSET n]
  * SHOW TAG KEYS [FROM m] | SHOW FIELD KEYS [FROM m]
  * SHOW TAG VALUES [FROM m] WITH KEY = "k" | IN ("k", …) | =~ /re/ | !~ /re/
 *   [WHERE …] [LIMIT n] [OFFSET n]
  * SHOW DATABASES | SHOW RETENTION POLICIES [ON db]
  * SHOW SERIES [FROM m] [WHERE …]
  * SHOW SERIES|MEASUREMENT|TAG KEY|FIELD KEY CARDINALITY [ON db]
  * }}}
  *
  * Arithmetic projections (`SELECT mean(a) + mean(b)`,
  * `(sum(errors) / sum(total)) * 100 AS pct`) follow v1 precedence
  * (mul/div over add/sub, parentheses); a projection mixes either
  * aggregate leaves or raw-field leaves, never both.
  *
  * Hand-rolled recursive descent like [[graft.flux.FluxParser]]; no
  * dependencies. Evaluation lives in [[InfluxQLEval]].
  */
object InfluxQL {

  final case class Dur(amount: Long, unit: String) {
    def seconds: Double = unit match {
      case "ns" => amount / 1e9
      case "u" | "µ" => amount / 1e6
      case "ms" => amount / 1e3
      case "s" => amount.toDouble
      case "m" => amount * 60.0
      case "h" => amount * 3600.0
      case "d" => amount * 86400.0
      case "w" => amount * 604800.0
    }
    def interval: String = s"${seconds.toLong} seconds"
  }

  sealed trait Proj
  final case class AggProj(fn: String, field: String, param: Option[Double],
      alias: Option[String], dur: Option[Dur] = None,
      /** v1 three-arg top/bottom: `top(field, tagKey, N)`. */
      tagKey: Option[String] = None) extends Proj
  final case class FieldProj(field: String, alias: Option[String]) extends Proj
  /** Transformation over an inner projection: `derivative(mean(v), 1s)`,
    * `moving_average(mean(v), 5)`, `difference(…)`, `cumulative_sum(…)`,
    * `non_negative_derivative(…)`.
    */
  final case class TransProj(fn: String, inner: Proj, dur: Option[Dur],
      n: Option[Int], alias: Option[String],
      n2: Option[Int] = None) extends Proj

  /** Arithmetic over projections: `mean(a) + mean(b)`,
    * `(sum(e)/sum(t))*100`. Leaves are aggregates, raw fields, or
    * numeric literals; one expression uses aggregate XOR raw-field
    * leaves (enforced at eval).
    */
  final case class ExprProj(expr: PExpr, alias: Option[String]) extends Proj
  sealed trait PExpr
  final case class PNum(v: Double) extends PExpr
  final case class PAgg(agg: AggProj) extends PExpr
  final case class PField(name: String) extends PExpr
  final case class PBin(op: Char, l: PExpr, r: PExpr) extends PExpr
  /** Scalar math call: `abs(v)`, `round(mean(v))`, `pow(v, 2)`. */
  final case class PFun(fn: String, args: Seq[PExpr]) extends PExpr

  /** Default output name for an arithmetic projection without AS: the
    * leaf function/field names joined by `_` (v1 composes names the
    * same way — `mean(a)+mean(b)` → `mean_mean`).
    */
  def exprName(e: PExpr): String = {
    def leaves(x: PExpr): Seq[String] = x match {
      case PBin(_, l, r) => leaves(l) ++ leaves(r)
      case PAgg(a) => Seq(a.fn)
      case PField(n) => Seq(n)
      case PFun(fn, _) => Seq(fn) // v1 names abs(v) plain "abs"
      case PNum(_) => Nil
    }
    val ns = leaves(e)
    if (ns.isEmpty) "expr" else ns.mkString("_")
  }

  sealed trait Fill
  case object FillNone extends Fill
  case object FillNull extends Fill
  final case class FillValue(v: Double) extends Fill
  case object FillPrevious extends Fill
  case object FillLinear extends Fill

  sealed trait Lit
  final case class LStr(s: String) extends Lit
  final case class LNum(d: Double) extends Lit
  final case class LBool(b: Boolean) extends Lit
  /** Bare integer literal, kept as Long: epoch-ns time literals exceed
    * 2^53 and would lose precision round-tripping through Double.
    */
  final case class LInt(v: Long) extends Lit
  /** now() ± duration (sign 0 = bare now()). */
  final case class LNow(sign: Int, d: Option[Dur]) extends Lit

  sealed trait Cond
  final case class CAnd(l: Cond, r: Cond) extends Cond
  final case class COr(l: Cond, r: Cond) extends Cond
  final case class CCmp(op: String, key: String, value: Lit) extends Cond

  /** FROM clause: one-or-more measurement names, a measurement regex
    * (`FROM /cpu.../`), or a subquery (`FROM ( SELECT ... )` — the v1
    * idiom for e.g. max-of-hourly-mean).
    */
  sealed trait From
  final case class FromMeasurements(names: Seq[String]) extends From
  final case class FromRegex(pattern: String) extends From
  final case class FromSelect(inner: Select) extends From

  sealed trait Stmt
  final case class Select(
      projs: Seq[Proj],
      from: From,
      where: Option[Cond],
      groupTime: Option[Dur],
      groupTags: Seq[String],
      fill: Fill,
      orderDesc: Boolean,
      limit: Option[Int],
      offset: Option[Int],
      slimit: Option[Int] = None,
      soffset: Option[Int] = None,
      /** `GROUP BY time(1h, 30m)` second argument: shifts bucket
        * alignment off the epoch grid (negative allowed).
        */
      groupOffset: Option[Dur] = None,
      /** `tz('America/Chicago')`: buckets align to local wall-clock
        * time in this IANA zone instead of UTC.
        */
      tz: Option[String] = None,
      /** `SELECT … INTO m2 …`: write the result as measurement m2 —
        * only meaningful inside CREATE CONTINUOUS QUERY.
        */
      into: Option[String] = None,
      /** Set by the /query JSON surface only (never the parser): emit
        * the v1 `time` column on GROUP-BY-time-less aggregate rows —
        * the selected point's timestamp for a lone selector, epoch 0
        * otherwise. Subqueries keep false (v1 adds it at the response
        * boundary, not between query levels).
        */
      v1Time: Boolean = false) extends Stmt
  /** `EXPLAIN [ANALYZE] SELECT …` — v1's plan inspection statement.
    * Output is engine-specific by nature (v1 prints its iterator tree;
    * we print the Catalyst plan — formatted physical for EXPLAIN,
    * executed-with-metrics for ANALYZE).
    */
  final case class Explain(sel: Select, analyze: Boolean) extends Stmt
  /** `SHOW MEASUREMENTS [WITH MEASUREMENT =~ /re/ | = name] [LIMIT n]
    * [OFFSET n]` — regex selection is what Grafana's measurement
    * template variables issue. The `=` form is an anchored literal.
    */
  final case class ShowMeasurements(regex: Option[String] = None,
      limit: Option[Int] = None, offset: Option[Int] = None) extends Stmt
  final case class ShowTagKeys(from: Option[String]) extends Stmt
  final case class ShowFieldKeys(from: Option[String]) extends Stmt
  /** Key selector of `SHOW TAG VALUES WITH KEY …`: `= "k"`,
    * `IN ("k1", "k2")`, or `=~ /re/` / `!~ /re/` over the tag-key set.
    */
  sealed trait KeySel
  final case class KeyEq(key: String) extends KeySel
  final case class KeyIn(keys: Seq[String]) extends KeySel
  final case class KeyRegex(pattern: String, negated: Boolean) extends KeySel

  /** `SHOW TAG VALUES [FROM m] WITH KEY <sel> [WHERE …] [LIMIT n]
    * [OFFSET n]` — what Grafana issues to populate template-variable
    * dropdowns (the IN / regex forms drive multi-key variables).
    */
  final case class ShowTagValues(from: Option[String], key: KeySel,
      where: Option[Cond], limit: Option[Int] = None,
      offset: Option[Int] = None) extends Stmt
  case object ShowDatabases extends Stmt
  final case class ShowRetentionPolicies(db: Option[String]) extends Stmt
  /** `SHOW SERIES [FROM m] [WHERE …]`: one row per series key
    * (`measurement,tag=v,…`).
    */
  final case class ShowSeries(from: Option[String],
      where: Option[Cond]) extends Stmt
  /** `DELETE FROM m [WHERE time bounds AND tag = 'v' …]`. */
  final case class DeleteStmt(measurement: String,
      where: Option[Cond]) extends Stmt
  final case class DropMeasurement(name: String) extends Stmt
  /** `CREATE CONTINUOUS QUERY name ON db [RESAMPLE [EVERY 30m]
    * [FOR 2h]] BEGIN SELECT agg(f) INTO m2 FROM m1 GROUP BY time(1h)
    * END` — the v1 downsampling DDL. RESAMPLE EVERY overrides the run
    * cadence (default: the GROUP BY interval); FOR widens the window
    * of past buckets each run recomputes (late-data refinement).
    */
  final case class CreateCq(name: String, db: String, sel: Select,
      resampleEvery: Option[Dur] = None,
      resampleFor: Option[Dur] = None,
      /** This statement's own source text (SHOW CONTINUOUS QUERIES
        * echoes it; a multi-statement batch must not leak its siblings).
        */
      text: String = "") extends Stmt
  case object ShowContinuousQueries extends Stmt
  final case class DropCq(name: String, db: String) extends Stmt
  /** `SHOW SERIES CARDINALITY` / `SHOW MEASUREMENT CARDINALITY` —
    * the v1 ops-dashboard cardinality probes.
    */
  final case class ShowSeriesCardinality(on: Option[String] = None) extends Stmt
  final case class ShowMeasurementCardinality(on: Option[String] = None) extends Stmt
  final case class ShowTagKeyCardinality(on: Option[String] = None) extends Stmt
  final case class ShowFieldKeyCardinality(on: Option[String] = None) extends Stmt

  /** Display name for a FROM clause (v1 JSON `series.name`). */
  def fromName(f: From): String = f match {
    case FromMeasurements(ns) => ns.mkString(",")
    case FromRegex(p) => s"/$p/"
    case FromSelect(inner) => fromName(inner.from)
  }

  final case class ParseException(msg: String, pos: Int)
    extends Exception(s"$msg at offset $pos")

  val Aggregates: Set[String] = Set("count", "sum", "mean", "min", "max",
    "median", "mode", "stddev", "spread", "first", "last", "percentile",
    "distinct", "top", "bottom", "integral", "sample")

  val Transforms: Set[String] = Set("derivative", "non_negative_derivative",
    "difference", "non_negative_difference", "cumulative_sum",
    "moving_average", "elapsed",
    "exponential_moving_average", "double_exponential_moving_average",
    "triple_exponential_moving_average", "relative_strength_index",
    "chande_momentum_oscillator", "kaufmans_adaptive_moving_average",
    "holt_winters", "holt_winters_with_fit")

  /** Transforms whose second argument is a row count N (the technical-
    * analysis family), not a duration. holt_winters additionally takes
    * a third argument: the seasonal pattern length S.
    */
  val NArgTransforms: Set[String] = Set("moving_average",
    "exponential_moving_average", "double_exponential_moving_average",
    "triple_exponential_moving_average", "relative_strength_index",
    "chande_momentum_oscillator", "kaufmans_adaptive_moving_average",
    "holt_winters", "holt_winters_with_fit")

  /** v1 scalar math functions usable inside SELECT expressions. */
  val MathFns: Set[String] = Set("abs", "ceil", "floor", "round", "exp",
    "ln", "log2", "log10", "sqrt", "pow", "sin", "cos", "tan",
    "asin", "acos", "atan", "atan2")

  def parse(src: String): Stmt = new P(src).statement()

  /** Semicolon-separated statement batch — Grafana's /query requests
    * carry one statement per dashboard panel.
    */
  def parseAll(src: String): Seq[Stmt] = new P(src).statements()

  private final class P(src: String) {
    private var i = 0

    def statement(): Stmt = {
      val s = one()
      ws()
      if (peekStr(";")) { expect(";"); ws() }
      if (i < src.length) fail(s"unexpected trailing input '${src.substring(i).take(20)}'")
      s
    }

    def statements(): Seq[Stmt] = {
      val out = Seq.newBuilder[Stmt]
      out += one()
      ws()
      while (peekStr(";")) {
        expect(";"); ws()
        if (i < src.length) { out += one(); ws() }
      }
      if (i < src.length) fail(s"unexpected trailing input '${src.substring(i).take(20)}'")
      out.result()
    }

    private def one(): Stmt = {
      ws()
      val startPos = i
      val stmt = oneDispatch()
      stmt match {
        case c: CreateCq => c.copy(text = src.substring(startPos, i).trim)
        case other => other
      }
    }

    private def oneDispatch(): Stmt = {
      if (peekKw("EXPLAIN")) {
        kw("EXPLAIN")
        val analyze = peekKw("ANALYZE")
        if (analyze) kw("ANALYZE")
        Explain(select(), analyze)
      }
      else if (peekKw("SELECT")) select()
      else if (peekKw("SHOW")) show()
      else if (peekKw("DELETE")) {
        kw("DELETE"); kw("FROM")
        val m = ident(); ws()
        val where = if (peekKw("WHERE")) { kw("WHERE"); Some(orCond()) } else None
        DeleteStmt(m, where)
      }
      else if (peekKw("DROP")) {
        kw("DROP")
        if (peekKw("MEASUREMENT")) { kw("MEASUREMENT"); DropMeasurement(ident()) }
        else if (peekKw("CONTINUOUS")) {
          kw("CONTINUOUS"); kw("QUERY")
          val name = ident(); ws(); kw("ON")
          DropCq(name, ident())
        }
        else fail("expected MEASUREMENT or CONTINUOUS QUERY")
      }
      else if (peekKw("CREATE")) {
        kw("CREATE"); kw("CONTINUOUS"); kw("QUERY")
        val name = ident(); ws(); kw("ON")
        val db = ident(); ws()
        var rEvery: Option[Dur] = None
        var rFor: Option[Dur] = None
        if (peekKw("RESAMPLE")) {
          kw("RESAMPLE"); ws()
          if (peekKw("EVERY")) { kw("EVERY"); ws(); rEvery = Some(duration()); ws() }
          if (peekKw("FOR")) { kw("FOR"); ws(); rFor = Some(duration()); ws() }
          if (rEvery.isEmpty && rFor.isEmpty) fail("RESAMPLE needs EVERY or FOR")
        }
        kw("BEGIN")
        val sel = select(); ws()
        kw("END")
        if (sel.into.isEmpty) fail("continuous query SELECT needs INTO")
        if (sel.groupTime.isEmpty) fail("continuous query needs GROUP BY time()")
        CreateCq(name, db, sel, rEvery, rFor)
      }
      else fail("expected SELECT, SHOW, DELETE, DROP or CREATE")
    }

    private def show(): Stmt = {
      kw("SHOW")
      if (peekKw("MEASUREMENTS")) {
        kw("MEASUREMENTS"); ws()
        val re =
          if (peekKw("WITH")) {
            kw("WITH"); kw("MEASUREMENT"); ws()
            if (peekStr("=~")) { expect("=~"); ws(); Some(regexLit()) }
            else { expect("="); ws()
              Some("^" + java.util.regex.Pattern.quote(ident()) + "$") }
          } else None
        ws()
        val lim = if (peekKw("LIMIT")) { kw("LIMIT"); ws(); Some(number().toInt) } else None
        ws()
        val off = if (peekKw("OFFSET")) { kw("OFFSET"); ws(); Some(number().toInt) } else None
        ShowMeasurements(re, lim, off)
      }
      else if (peekKw("TAG")) {
        kw("TAG")
        if (peekKw("VALUES")) {
          kw("VALUES")
          val m = optFrom(); ws()
          kw("WITH"); kw("KEY"); ws()
          val sel: KeySel =
            if (peekKw("IN")) {
              kw("IN"); ws(); expect("("); ws()
              val ks = scala.collection.mutable.ArrayBuffer(ident())
              ws()
              while (peekStr(",")) { expect(","); ws(); ks += ident(); ws() }
              expect(")")
              KeyIn(ks.toSeq)
            }
            else if (peekStr("=~")) { expect("=~"); ws(); KeyRegex(regexLit(), negated = false) }
            else if (peekStr("!~")) { expect("!~"); ws(); KeyRegex(regexLit(), negated = true) }
            else { expect("="); ws(); KeyEq(ident()) }
          ws()
          val where = if (peekKw("WHERE")) { kw("WHERE"); Some(orCond()) } else None
          ws()
          val limit = if (peekKw("LIMIT")) { kw("LIMIT"); ws(); Some(number().toInt) } else None
          ws()
          val offset = if (peekKw("OFFSET")) { kw("OFFSET"); ws(); Some(number().toInt) } else None
          ShowTagValues(m, sel, where, limit, offset)
        } else if (peekKw("KEYS")) { kw("KEYS"); ShowTagKeys(optFrom()) }
        else { kw("KEY"); kw("CARDINALITY"); ShowTagKeyCardinality(optOn()) }
      }
      else if (peekKw("FIELD")) {
        kw("FIELD")
        if (peekKw("KEYS")) { kw("KEYS"); ShowFieldKeys(optFrom()) }
        else { kw("KEY"); kw("CARDINALITY"); ShowFieldKeyCardinality(optOn()) }
      }
      else if (peekKw("DATABASES")) { kw("DATABASES"); ShowDatabases }
      else if (peekKw("RETENTION")) {
        kw("RETENTION"); kw("POLICIES")
        ShowRetentionPolicies(
          if (peekKw("ON")) { kw("ON"); Some(ident()) } else None)
      }
      else if (peekKw("SERIES")) {
        kw("SERIES")
        if (peekKw("CARDINALITY")) { kw("CARDINALITY"); ShowSeriesCardinality(optOn()) }
        else {
          val m = optFrom(); ws()
          val where = if (peekKw("WHERE")) { kw("WHERE"); Some(orCond()) } else None
          ShowSeries(m, where)
        }
      }
      else if (peekKw("MEASUREMENT")) {
        kw("MEASUREMENT"); kw("CARDINALITY"); ShowMeasurementCardinality(optOn())
      }
      else if (peekKw("CONTINUOUS")) {
        kw("CONTINUOUS"); kw("QUERIES"); ShowContinuousQueries
      }
      else fail("expected MEASUREMENTS, TAG KEYS/VALUES, FIELD KEYS, " +
        "DATABASES, RETENTION POLICIES or SERIES")
    }

    private def optFrom(): Option[String] =
      if (peekKw("FROM")) { kw("FROM"); Some(ident()) } else None

    private def optOn(): Option[String] =
      if (peekKw("ON")) { kw("ON"); Some(ident()) } else None

    private def select(): Select = {
      kw("SELECT")
      val projs = Seq.newBuilder[Proj]
      projs += proj()
      ws()
      while (peekStr(",")) { expect(","); ws(); projs += proj(); ws() }
      val into = if (peekKw("INTO")) { kw("INTO"); val t = ident(); ws(); Some(t) } else None
      kw("FROM")
      val from = fromClause(); ws()
      val where = if (peekKw("WHERE")) { kw("WHERE"); Some(orCond()) } else None
      var groupTime: Option[Dur] = None
      var groupOffset: Option[Dur] = None
      var groupTags = Seq.empty[String]
      if (peekKw("GROUP")) {
        kw("GROUP"); kw("BY")
        var more = true
        while (more) {
          ws()
          if (peekKw("time")) {
            kw("time"); expect("("); ws(); groupTime = Some(duration()); ws()
            if (peekStr(",")) { // time(1h, 30m): bucket-alignment offset
              expect(","); ws()
              val neg = peekStr("-")
              if (neg) { expect("-"); ws() }
              val d = duration()
              groupOffset = Some(if (neg) d.copy(amount = -d.amount) else d)
              ws()
            }
            expect(")")
          } else if (peekStr("*")) { expect("*"); groupTags :+= "*" }
          else groupTags :+= ident()
          ws()
          if (peekStr(",")) expect(",") else more = false
        }
      }
      ws()
      val fill: Fill =
        if (peekKw("FILL")) {
          kw("FILL"); expect("("); ws()
          val f =
            if (peekKw("none")) { kw("none"); FillNone }
            else if (peekKw("null")) { kw("null"); FillNull }
            else if (peekKw("previous")) { kw("previous"); FillPrevious }
            else if (peekKw("linear")) { kw("linear"); FillLinear }
            else FillValue(number())
          ws(); expect(")")
          f
        } else if (groupTime.isDefined) FillNull // InfluxQL's GROUP BY time() default
        else FillNone
      ws()
      var desc = false
      if (peekKw("ORDER")) {
        kw("ORDER"); kw("BY"); kw("time"); ws()
        if (peekKw("DESC")) { kw("DESC"); desc = true }
        else if (peekKw("ASC")) kw("ASC")
      }
      ws()
      val limit = if (peekKw("LIMIT")) { kw("LIMIT"); ws(); Some(number().toInt) } else None
      ws()
      val offset = if (peekKw("OFFSET")) { kw("OFFSET"); ws(); Some(number().toInt) } else None
      ws()
      val slimit = if (peekKw("SLIMIT")) { kw("SLIMIT"); ws(); Some(number().toInt) } else None
      ws()
      val soffset = if (peekKw("SOFFSET")) { kw("SOFFSET"); ws(); Some(number().toInt) } else None
      ws()
      val tz =
        if (peekKw("tz")) {
          kw("tz"); expect("("); ws()
          val z = stringLit(); ws(); expect(")")
          Some(z)
        } else None
      Select(projs.result(), from, where, groupTime, groupTags, fill, desc, limit, offset,
        slimit, soffset, groupOffset, tz, into)
    }

    private def fromClause(): From = {
      ws()
      if (peekStr("(")) {
        expect("("); ws()
        val inner = select(); ws()
        expect(")")
        FromSelect(inner)
      } else if (peekStr("/")) FromRegex(regexLit())
      else {
        var names = Seq(ident()); ws()
        while (peekStr(",")) { expect(","); ws(); names :+= ident(); ws() }
        FromMeasurements(names)
      }
    }

    private def proj(): Proj = {
      ws()
      if (peekStr("*")) { expect("*"); ws(); return FieldProj("*", None) }
      // `SELECT /re/`: regex field selection — stored slash-delimited
      // (field names cannot start with '/' in line protocol)
      if (peekStr("/")) { val re = regexLit(); ws(); return FieldProj(s"/$re/", None) }
      // transforms are top-level-only (no arithmetic around them, as in
      // v1): peek the head identifier, fall back to expression parsing
      def exprToProj(): Proj = addExpr() match {
        case PAgg(a) => a
        case PField(nm) => FieldProj(nm, None)
        case e => ExprProj(e, None)
      }
      val startsIdent =
        peekStr("\"") || (i < src.length && (src(i).isLetter || src(i) == '_'))
      val p: Proj =
        if (!startsIdent) exprToProj() // '(' or numeric-literal head
        else {
          val save = i
          val head = ident(); ws()
          if (peekStr("(") && Transforms.contains(head.toLowerCase)) {
            expect("("); ws()
            val inner = proj(); ws()
            var dur: Option[Dur] = None
            var n: Option[Int] = None
            var n2: Option[Int] = None
            if (peekStr(",")) {
              expect(","); ws()
              if (NArgTransforms.contains(head.toLowerCase)) {
                n = Some(number().toInt); ws()
                if (peekStr(",")) { expect(","); ws(); n2 = Some(number().toInt) }
              } else dur = Some(duration())
            }
            ws(); expect(")")
            TransProj(head.toLowerCase, inner, dur, n, None, n2)
          } else { i = save; exprToProj() }
        }
      ws()
      if (peekKw("AS")) {
        kw("AS")
        val a = ident()
        p match {
          case ap: AggProj => ap.copy(alias = Some(a))
          case fp: FieldProj => fp.copy(alias = Some(a))
          case tp: TransProj => tp.copy(alias = Some(a))
          case ep: ExprProj => ep.copy(alias = Some(a))
        }
      } else p
    }

    /** `+`/`-` over [[mulExpr]] — lowest precedence. */
    private def addExpr(): PExpr = {
      var l = mulExpr(); ws()
      while (peekStr("+") || peekStr("-")) {
        val op = src(i); i += 1; ws()
        l = PBin(op, l, mulExpr()); ws()
      }
      l
    }
    private def mulExpr(): PExpr = {
      var l = factor(); ws()
      while (peekStr("*") || peekStr("/")) {
        val op = src(i); i += 1; ws()
        l = PBin(op, l, factor()); ws()
      }
      l
    }
    private def factor(): PExpr = {
      ws()
      if (peekStr("(")) { expect("("); val e = addExpr(); ws(); expect(")"); e }
      else if (peekStr("-") || (i < src.length && src(i).isDigit)) PNum(number())
      else {
        val name = ident(); ws()
        if (peekStr("(") && MathFns.contains(name.toLowerCase)) {
          expect("("); ws()
          val args = Seq.newBuilder[PExpr]
          args += addExpr(); ws()
          while (peekStr(",")) { expect(","); ws(); args += addExpr(); ws() }
          expect(")")
          PFun(name.toLowerCase, args.result())
        } else if (peekStr("(") && Aggregates.contains(name.toLowerCase)) {
          expect("("); ws()
          // count(distinct(field)) — the v1 cardinality idiom — folds to
          // the synthetic aggregate name "count_distinct"
          val save2 = i
          val field =
            if (peekStr("*") || peekStr("/")) "*" // probe only; reparsed below
            else { val x = ident(); ws(); x }
          if (name.toLowerCase == "count" && field.toLowerCase == "distinct"
              && peekStr("(")) {
            expect("("); ws()
            val innerField = ident(); ws()
            expect(")"); ws(); expect(")")
            PAgg(AggProj("count_distinct", innerField, None, None))
          } else {
            i = save2
            // agg-star / agg-regex: `mean(*)` and `mean(/re/)` apply
            // the call to every (matching) data field
            val f =
              if (peekStr("*")) { expect("*"); ws(); "*" }
              else if (peekStr("/")) { val re = regexLit(); ws(); s"/$re/" }
              else { val x = ident(); ws(); x }
            // after the comma: an identifier is a tag key (three-arg
            // top/bottom); a bare number is a parameter
            // (percentile/top/bottom/sample); a number followed by a
            // unit letter is a duration (integral's unit)
            var param: Option[Double] = None
            var dur: Option[Dur] = None
            var tagKey: Option[String] = None
            if (peekStr(",")) {
              expect(","); ws()
              if (peekStr("\"") || (i < src.length && (src(i).isLetter || src(i) == '_'))) {
                tagKey = Some(ident()); ws()
                expect(","); ws()
                param = Some(number())
              } else {
                val save3 = i
                val num = number()
                if (i < src.length && src(i).isLetter) { i = save3; dur = Some(duration()) }
                else param = Some(num)
              }
            }
            ws(); expect(")")
            PAgg(AggProj(name.toLowerCase, f, param, None, dur, tagKey))
          }
        } else if (peekStr("(")) {
          // ident directly followed by '(' that is no known math fn or
          // aggregate: name the offending spelling instead of failing
          // later with a positional "expected FROM" (fuzz-found; the
          // error-UX bar the Flux surface already meets)
          if (Transforms.contains(name.toLowerCase))
            fail(s"transform ${name.toLowerCase}() cannot appear inside an arithmetic expression")
          else fail(s"unknown function '${name.toLowerCase}'")
        } else PField(name)
      }
    }

    private def orCond(): Cond = {
      var l = andCond(); ws()
      while (peekKw("OR")) { kw("OR"); l = COr(l, andCond()); ws() }
      l
    }
    private def andCond(): Cond = {
      var l = cmp(); ws()
      while (peekKw("AND")) { kw("AND"); l = CAnd(l, cmp()); ws() }
      l
    }
    private def cmp(): Cond = {
      ws()
      if (peekStr("(")) { expect("("); val c = orCond(); ws(); expect(")"); return c }
      val key = ident(); ws()
      val op = Seq("=~", "!~", "!=", "<>", "<=", ">=", "=", "<", ">").find(peekStr)
        .getOrElse(fail("expected comparison operator"))
      expect(op); ws()
      val v: Lit =
        if (peekStr("'")) LStr(stringLit())
        else if (peekStr("/")) LStr(regexLit()) // tag =~ /re/ (v1 regex match)
        else if (peekKw("TRUE")) { kw("TRUE"); LBool(true) }
        else if (peekKw("FALSE")) { kw("FALSE"); LBool(false) }
        else if (peekKw("now")) {
          kw("now"); expect("("); ws(); expect(")"); ws()
          if (peekStr("-")) { expect("-"); ws(); LNow(-1, Some(duration())) }
          else if (peekStr("+")) { expect("+"); ws(); LNow(1, Some(duration())) }
          else LNow(0, None)
        }
        else {
          val lit0 = numberLit()
          lit0 match {
            // Grafana sends absolute panel bounds as unit-suffixed
            // integers (`time >= 1705276800000ms and time <=
            // 1705277040000ms`): an integral literal directly followed
            // by a duration unit is epoch time in that unit → ns.
            // Only the `time` key takes duration literals — v1 rejects
            // them in field comparisons (`value > 10m` is an error,
            // not 600e9).
            case LInt(n) if i < src.length && (src(i).isLetter || src(i) == 'µ') =>
              if (!key.equalsIgnoreCase("time"))
                fail(s"duration literal in comparison on '$key' (durations apply to time only)")
              val us = i
              while (i < src.length && (src(i).isLetter || src(i) == 'µ')) i += 1
              val unitNs = src.substring(us, i) match {
                case "ns" => 1L
                case "u" | "µ" => 1000L
                case "ms" => 1000000L
                case "s" => 1000000000L
                case "m" => 60L * 1000000000L
                case "h" => 3600L * 1000000000L
                case "d" => 86400L * 1000000000L
                case "w" => 7L * 86400L * 1000000000L
                case other => fail(s"unknown duration unit '$other'")
              }
              LInt(n * unitNs)
            case l => l
          }
        }
      CCmp(if (op == "<>") "!=" else op, key, v)
    }

    private def duration(): Dur = {
      val start = i
      while (i < src.length && src(i).isDigit) i += 1
      if (i == start) fail("expected duration")
      val n = src.substring(start, i).toLong
      val us = i
      while (i < src.length && (src(i).isLetter || src(i) == 'µ')) i += 1
      val unit = src.substring(us, i)
      if (!Seq("ns", "u", "µ", "ms", "s", "m", "h", "d", "w").contains(unit))
        fail(s"unknown duration unit '$unit'")
      Dur(n, unit)
    }

    /** Scan + validate a numeric literal: `-?\d+(\.\d+)?([eE][+-]?\d+)?`.
      * Greedy over digit/dot characters then validated, so malformed
      * input like `1.2.3` is a [[ParseException]] here rather than a
      * NumberFormatException from deep inside evaluation; exponent forms
      * (`1e9`, `2.5E-3`) are accepted. An `e` NOT followed by a digit is
      * left unconsumed (it starts the next token).
      */
    private def numericText(): String = {
      val start = i
      if (peekStr("-")) i += 1
      while (i < src.length && (src(i).isDigit || src(i) == '.')) i += 1
      if (i < src.length && (src(i) == 'e' || src(i) == 'E')) {
        val mark = i
        i += 1
        if (i < src.length && (src(i) == '+' || src(i) == '-')) i += 1
        if (i < src.length && src(i).isDigit) {
          while (i < src.length && src(i).isDigit) i += 1
        } else i = mark
      }
      if (i == start) fail("expected number")
      val txt = src.substring(start, i)
      if (!txt.matches("-?\\d+(\\.\\d+)?([eE][+-]?\\d+)?"))
        fail(s"malformed number '$txt'")
      txt
    }

    /** Numeric literal in a comparison: integral text stays Long
      * ([[LInt]]) so epoch-ns time bounds keep full precision; text too
      * wide for Long degrades to Double rather than erroring.
      */
    private def numberLit(): Lit = {
      val txt = numericText()
      if (txt.exists(c => c == '.' || c == 'e' || c == 'E')) LNum(txt.toDouble)
      else try LInt(txt.toLong)
      catch { case _: NumberFormatException => LNum(txt.toDouble) }
    }

    private def number(): Double = numericText().toDouble

    /** `/…/` regex literal; `\/` escapes the delimiter. */
    private def regexLit(): String = {
      expect("/")
      val sb = new StringBuilder
      while (i < src.length && src(i) != '/') {
        if (src(i) == '\\' && i + 1 < src.length && src(i + 1) == '/') {
          sb.append('/'); i += 2
        } else { sb.append(src(i)); i += 1 }
      }
      expect("/")
      sb.toString
    }

    private def stringLit(): String = {
      expect("'")
      val sb = new StringBuilder
      while (i < src.length && src(i) != '\'') {
        if (src(i) == '\\' && i + 1 < src.length) { sb.append(src(i + 1)); i += 2 }
        else { sb.append(src(i)); i += 1 }
      }
      expect("'")
      sb.toString
    }

    /** Bare or double-quoted identifier. */
    private def ident(): String = {
      ws()
      val name =
        if (peekStr("\"")) {
          expect("\"")
          val sb = new StringBuilder
          while (i < src.length && src(i) != '"') { sb.append(src(i)); i += 1 }
          expect("\"")
          sb.toString
        } else {
          val start = i
          while (i < src.length && (src(i).isLetterOrDigit || src(i) == '_')) i += 1
          if (i == start) fail("expected identifier")
          src.substring(start, i)
        }
      // v1 type qualifiers (`"usage"::field`, `"host"::tag`,
      // `value::float`) — Grafana's editor emits them for
      // disambiguation; our canonical schema already knows each
      // column's kind, so they validate and drop
      if (peekStr("::")) {
        expect("::")
        val start = i
        while (i < src.length && src(i).isLetter) i += 1
        val t = src.substring(start, i)
        if (!Seq("field", "tag", "float", "integer", "unsigned", "string", "boolean")
          .contains(t.toLowerCase))
          fail(s"unknown type qualifier '::$t'")
      }
      name
    }

    private def ws(): Unit = while (i < src.length && src(i).isWhitespace) i += 1
    private def peekStr(s: String): Boolean = src.regionMatches(i, s, 0, s.length)
    private def peekKw(w: String): Boolean =
      src.regionMatches(true, i, w, 0, w.length) &&
        (i + w.length >= src.length ||
          !(src(i + w.length).isLetterOrDigit || src(i + w.length) == '_'))
    private def kw(w: String): Unit =
      if (peekKw(w)) { i += w.length; ws() } else fail(s"expected $w")
    private def expect(s: String): Unit =
      if (peekStr(s)) i += s.length else fail(s"expected '$s'")
    private def fail(msg: String): Nothing = throw ParseException(msg, i)
  }
}
