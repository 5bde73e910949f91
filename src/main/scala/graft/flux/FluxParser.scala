package graft.flux

/** Parser for the Flux pipeline subset the reference's users actually
  * write against the pinned engine (reference README shows Flux in use;
  * the DSL is the execution contract — this is the text front-end):
  *
  * {{{
  * from(bucket: "telemetry")
  *   |> range(start: 2024-01-08T00:00:00Z, stop: 2024-01-15T00:00:00Z)
  *   |> filter(fn: (r) => r._measurement == "cpu" and r.host == "h1")
  *   |> aggregateWindow(every: 1h, fn: mean)
  *   |> keep(columns: ["_time", "_value"])
  * }}}
  *
  * Produces a verb-call AST; evaluation to DataFrames lives in
  * [[FluxEval]]. Hand-rolled recursive descent, no dependencies.
  */
object FluxParser {

  sealed trait Value
  final case class VStr(s: String) extends Value
  final case class VNum(d: Double) extends Value
  final case class VBool(b: Boolean) extends Value
  final case class VDur(amount: Long, unit: String) extends Value // unit: s m h d w
  final case class VTime(iso: String) extends Value
  final case class VArr(items: Seq[Value]) extends Value
  final case class VRec(fields: Seq[(String, Value)]) extends Value
  final case class VIdent(name: String) extends Value // bare fn name like `mean`
  final case class VLambda(param: String, body: Expr) extends Value
  /** map(fn: (r) => ({ r with col: expr, … })) — Flux record extension. */
  final case class VMapLambda(param: String, fields: Seq[(String, Expr)]) extends Value
  /** reduce(fn: (r, accumulator) => ({ field: expr, … }), identity: {…}). */
  final case class VReduceLambda(rowParam: String, accParam: String,
      fields: Seq[(String, Expr)]) extends Value
  /** Two-table predicate lambda — the join package's `on: (l, r) =>
    * l.k == r.k` form. In the body, [[ColRef]] binds the FIRST (left)
    * param's members and [[AccRef]] the SECOND (right) param's, reusing
    * the reduce machinery's two-scope expression plumbing.
    */
  final case class VLambda2(leftParam: String, rightParam: String,
      body: Expr) extends Value

  sealed trait Expr
  final case class ColRef(name: String) extends Expr
  /** `accumulator.<field>` inside a reduce lambda. */
  final case class AccRef(name: String) extends Expr
  /** A named-function parameter inside its body (`f = (x) => x * 2.0`).
    * Exists only DURING parsing: call sites inline the body with every
    * ParamRef substituted by its argument expression, so a fully parsed
    * program contains none — the evaluator never sees one.
    */
  final case class ParamRef(name: String) extends Expr
  final case class Lit(v: Value) extends Expr
  final case class Cmp(op: String, lhs: Expr, rhs: Expr) extends Expr // == != > < >= <= =~ !~
  final case class And(l: Expr, r: Expr) extends Expr
  final case class Or(l: Expr, r: Expr) extends Expr
  final case class Not(e: Expr) extends Expr
  /** `exists r.col` — true when the column is non-null (Flux's member
    * existence test; Grafana panels use it to drop empty pivot cells).
    */
  final case class Exists(e: Expr) extends Expr
  /** `if <pred> then <a> else <b>` — Flux's conditional expression
    * (map() bodies use it for piecewise rewrites). Row-predicate only.
    */
  final case class Cond(pred: Expr, a: Expr, b: Expr) extends Expr
  final case class Regex(pattern: String) extends Expr
  final case class Arith(op: String, l: Expr, r: Expr) extends Expr // + - * / %
  /** A stdlib scalar call inside a lambda body — `math.sqrt(x: r._value)`,
    * `strings.toUpper(v: r.host)`, `date.hour(t: r._time)`, or a bare
    * type conversion `int(v: r._value)`. Arguments are named, like every
    * Flux call; each value is a full expression in the lambda's scope.
    * The EVALUATOR owns the dispatch table (unknown names must fail at
    * eval with the query surface's error, not at parse) — the parser
    * only shapes the node.
    */
  final case class FnCall(name: String, args: Seq[(String, Expr)]) extends Expr

  final case class Call(verb: String, args: Map[String, Value])
  /** A verb chain. The head is either a call (`from(...)`) or, in a
    * multi-statement program, `Call("__ref", name)` referencing an
    * earlier `name = from(...) |> …` assignment.
    */
  final case class Pipeline(calls: Seq[Call])
  /** `name = <pipeline>` statements followed by one result pipeline —
    * the Flux program shape `join`/`union` need for their inputs.
    */
  /** A top-level statement, in SCRIPT ORDER — order is semantics: an
    * assignment is visible only to statements after it (the reference
    * engine rejects a forward reference with "undefined identifier"),
    * so evaluation must thread the environment through the statement
    * sequence rather than hoist all assignments first.
    */
  sealed trait Stmt
  final case class SAssign(name: String, pipe: Pipeline) extends Stmt
  final case class SResult(pipe: Pipeline) extends Stmt

  final case class Program(
      /** Top-level statements in script order: table assignments and
        * RESULT pipelines. The reference engine's response is a
        * result-set map: one annotated-CSV section per `yield` — a
        * script with two standalone pipelines (each usually ending in
        * `yield(name:)`) produces two results.
        */
      stmts: Seq[Stmt],
      /** `option <name> = <value>` headers, in order — `option task =
        * {name: "…", every: 1h}` is how a scheduled task carries its
        * run cadence inside the script body; evaluation ignores them.
        */
      options: Seq[(String, Value)] = Nil) {
    def assigns: Seq[(String, Pipeline)] =
      stmts.collect { case SAssign(n, p) => (n, p) }
    /** The result pipelines, in script order. */
    def mains: Seq[Pipeline] = stmts.collect { case SResult(p) => p }
    /** The single-result accessor every pre-multi-yield surface uses. */
    def main: Pipeline = mains.head
  }

  final case class ParseException(msg: String, pos: Int) extends Exception(s"$msg at offset $pos")

  def parse(src: String): Pipeline = {
    val prog = parseProgram(src)
    if (prog.assigns.nonEmpty || prog.mains.sizeIs > 1)
      throw ParseException("single-pipeline parse of a multi-statement program", 0)
    prog.main
  }

  def parseProgram(src: String): Program = new P(src).program()

  /** Exact ns width of the fixed-size duration units (calendar units
    * `mo`/`y` deliberately absent — they have no fixed width).
    */
  private val fixedNs: Map[String, Long] = Map(
    "ns" -> 1L, "us" -> 1000L, "ms" -> 1000000L, "s" -> 1000000000L,
    "m" -> 60L * 1000000000L, "h" -> 3600L * 1000000000L,
    "d" -> 86400L * 1000000000L, "w" -> 7L * 86400L * 1000000000L)

  private final class P(src: String) {
    private var i = 0

    /** Named functions defined so far (`f = (x) => expr`) — consulted
      * by [[primary]] to inline calls; definitions parse before the
      * pipelines that use them, so plain sequential collection works.
      */
    private var funcs = Map.empty[String, (Seq[String], Expr)]
    /** Parameter names in scope while parsing a function BODY (empty
      * elsewhere) — body identifiers resolve against this set.
      */
    private var funcParams = Set.empty[String]

    /** `(x, y) => <expr>` after the `=` of a named definition. The body
      * is one expression over the parameters (conditionals included —
      * [[arithPrimary]] handles `if/then/else`).
      */
    private def funcDef(): (Seq[String], Expr) = {
      expect("("); ws()
      val params = Seq.newBuilder[String]
      if (!peekStr(")")) {
        params += ident(); ws()
        while (peekStr(",")) { expect(","); ws(); params += ident(); ws() }
      }
      expect(")"); ws(); expect("=>"); ws()
      val ps = params.result()
      val saved = funcParams
      funcParams = ps.toSet
      val body = addSub(null)
      funcParams = saved
      (ps, body)
    }

    /** Inline a function body at a call site: every [[ParamRef]] is
      * replaced by its (already parsed) argument expression.
      */
    private def subst(e: Expr, bind: Map[String, Expr]): Expr = e match {
      case ParamRef(n) => bind.getOrElse(n, fail(s"unbound function parameter '$n'"))
      case Arith(op, l, r) => Arith(op, subst(l, bind), subst(r, bind))
      case Cmp(op, l, r) => Cmp(op, subst(l, bind), subst(r, bind))
      case And(l, r) => And(subst(l, bind), subst(r, bind))
      case Or(l, r) => Or(subst(l, bind), subst(r, bind))
      case Not(x) => Not(subst(x, bind))
      case Exists(x) => Exists(subst(x, bind))
      case Cond(c, a, b) => Cond(subst(c, bind), subst(a, bind), subst(b, bind))
      case FnCall(n, args) => FnCall(n, args.map { case (k, e) => k -> subst(e, bind) })
      case other => other // ColRef / AccRef / Lit / Regex: no params inside
    }

    def program(): Program = {
      ws()
      // `import "influxdata/influxdb/schema"` headers (Grafana's Flux
      // template queries start with one): recorded nowhere — the
      // schema.* verbs resolve by their dotted name. `option` headers
      // (task scripts lead with `option task = {…}`) are captured for
      // the scheduler; both may interleave.
      val options = Seq.newBuilder[(String, Value)]
      var header = true
      while (header) {
        if (peekStr("import ") || peekStr("import\"")) {
          expect("import"); ws(); stringLit(); ws()
        } else if (peekStr("option ")) {
          expect("option"); ws()
          val name = ident(); ws()
          expect("="); ws()
          options += name -> value(); ws()
        } else header = false
      }
      val stmts = Seq.newBuilder[Stmt]
      var nMains = 0
      // statements to end of input, IN ORDER: assignments, function
      // definitions, and RESULT pipelines — one result per standalone
      // pipeline, the multi-`yield` program shape (pre-r17 this stopped
      // at the first result and rejected the rest as trailing input)
      while (i < src.length) {
        val save = i
        val name = ident(); ws()
        if (peekStr("=") && !peekStr("==") && !peekStr("=~")) {
          expect("="); ws()
          // `f = (x) => <expr>` is a named function definition — the
          // stdlib's user-extension idiom; a pipeline assignment's RHS
          // always starts with an identifier, so "(" disambiguates
          if (peekStr("(")) { funcs += name -> funcDef(); ws() }
          else { stmts += SAssign(name, pipeline()); ws() }
        } else {
          i = save
          stmts += SResult(pipeline())
          nMains += 1
          ws()
        }
      }
      if (nMains == 0) fail("program has no result pipeline")
      Program(stmts.result(), options.result())
    }

    /** A verb chain; the head may be a bare identifier referencing an
      * earlier assignment (emitted as a `__ref` marker call).
      */
    private def pipeline(): Pipeline = {
      val calls = Seq.newBuilder[Call]
      // dotted package heads: `schema.tagValues(...)`
      var headName = ident(); ws()
      if (peekStr(".")) { expect("."); headName = s"$headName.${ident()}"; ws() }
      if (peekStr("(")) calls += callAfterName(headName)
      else calls += Call("__ref", Map("name" -> VStr(headName)))
      ws()
      while (peekStr("|>")) { expect("|>"); ws(); calls += call(); ws() }
      Pipeline(calls.result())
    }

    private def call(): Call = {
      // dotted package verbs mid-pipe: `|> monitor.check(…)`,
      // `|> join.left(…)` — same spelling the pipeline head accepts
      var name = ident()
      if (peekStr(".")) { expect("."); name = s"$name.${ident()}" }
      ws()
      callAfterName(name)
    }

    private def callAfterName(name: String): Call = {
      expect("(")
      val args = Map.newBuilder[String, Value]
      ws()
      if (!peekStr(")")) {
        args += arg()
        ws()
        while (peekStr(",")) { expect(","); ws(); args += arg(); ws() }
      }
      expect(")")
      Call(name, args.result())
    }

    private def arg(): (String, Value) = {
      val k = ident(); ws(); expect(":"); ws()
      (k, value())
    }

    private def value(): Value = {
      if (peekStr("\"")) VStr(stringLit())
      else if (peekStr("[")) { expect("["); ws()
        val items = Seq.newBuilder[Value]
        if (!peekStr("]")) {
          items += value(); ws()
          while (peekStr(",")) { expect(","); ws(); items += value(); ws() }
        }
        expect("]"); VArr(items.result())
      }
      else if (peekStr("{")) { expect("{"); ws()
        val fields = Seq.newBuilder[(String, Value)]
        if (!peekStr("}")) {
          fields += recField(); ws()
          while (peekStr(",")) { expect(","); ws(); fields += recField(); ws() }
        }
        expect("}"); VRec(fields.result())
      }
      else if (peekStr("(")) lambda()
      else if (peekStr("true")) { expect("true"); VBool(true) }
      else if (peekStr("false")) { expect("false"); VBool(false) }
      else if (i < src.length && (src(i).isDigit || src(i) == '-')) numOrDurOrTime()
      else {
        val id = ident()
        // `timezone.location(name: "America/Chicago")` — the stdlib
        // call Flux passes as `location:`; reduced to its zone string
        if (id == "timezone" && peekStr(".")) {
          expect("."); ws()
          if (ident() != "location") fail("expected timezone.location(…)")
          ws(); expect("("); ws()
          if (ident() != "name") fail("expected timezone.location(name: …)")
          ws(); expect(":"); ws()
          val zone = stringLit(); ws(); expect(")")
          VStr(zone)
        } else if ((id == "linearBins" || id == "logarithmicBins") && peekStr("(")) {
          // stdlib bin generators, reduced to their literal arrays at
          // parse time (Flux evaluates them eagerly too): linearBins =
          // start, start+width, …, count edges; logarithmicBins =
          // start·factor^i. `infinity: true` appends +Inf as the
          // catch-all upper edge, exactly like the stdlib.
          expect("("); ws()
          val args = scala.collection.mutable.Map.empty[String, Value]
          if (!peekStr(")")) {
            def arg(): Unit = { val k = ident(); ws(); expect(":"); ws(); args(k) = value(); ws() }
            arg(); while (peekStr(",")) { expect(","); ws(); arg() }
          }
          expect(")")
          def numArg(k: String): Double = args.get(k) match {
            case Some(VNum(d)) => d
            case other => fail(s"$id needs numeric $k:, got $other")
          }
          val count = numArg("count").toInt
          val start = numArg("start")
          val base = (0 until count).map { i =>
            if (id == "linearBins") start + numArg("width") * i
            else start * math.pow(numArg("factor"), i)
          }
          val inf = args.get("infinity") match {
            case Some(VBool(false)) => Nil
            case _ => Seq(Double.PositiveInfinity) // stdlib default: true
          }
          VArr((base ++ inf).map(VNum))
        } else VIdent(id)
      }
    }

    private def recField(): (String, Value) = {
      val k = ident(); ws(); expect(":"); ws(); (k, value())
    }

    private def lambda(): Value = {
      expect("("); ws()
      val param = ident(); ws()
      if (peekStr(",")) { // (r, accumulator) => ({ field: expr, … })
        expect(","); ws()
        val accParam = ident(); ws()
        expect(")"); ws(); expect("=>"); ws()
        // two-param PREDICATE body — the join package's
        // `on: (l, r) => l.k == r.k and …` form; a reduce body always
        // opens with `({`, so a bare (or parenthesized-non-record)
        // expression disambiguates to VLambda2
        if (!peekStr("(")) return VLambda2(param, accParam, orExpr(param, accParam))
        expect("("); ws()
        if (!peekStr("{")) {
          val body = orExpr(param, accParam); ws(); expect(")")
          return VLambda2(param, accParam, body)
        }
        expect("{"); ws()
        val fields = Seq.newBuilder[(String, Expr)]
        fields += reduceField(param, accParam); ws()
        while (peekStr(",")) { expect(","); ws(); fields += reduceField(param, accParam); ws() }
        expect("}"); ws(); expect(")")
        return VReduceLambda(param, accParam, fields.result())
      }
      expect(")"); ws(); expect("=>"); ws()
      // record-with form: ({ r with col: expr, ... })
      val save = i
      if (peekStr("(")) {
        expect("("); ws()
        if (peekStr("{")) {
          expect("{"); ws(); expectWord(param); ws(); expectWord("with"); ws()
          val fields = Seq.newBuilder[(String, Expr)]
          fields += withField(param); ws()
          while (peekStr(",")) { expect(","); ws(); fields += withField(param); ws() }
          expect("}"); ws(); expect(")")
          return VMapLambda(param, fields.result())
        }
        i = save // plain parenthesized predicate
      }
      VLambda(param, orExpr(param))
    }

    // record fields take the FULL expression grammar: arithmetic,
    // conditionals, stdlib calls, and bare predicates
    // (`hot: r._value > 50.0`) are all legal Flux record values
    private def withField(p: String): (String, Expr) = {
      val k = identDots(); ws(); expect(":"); ws()
      (k, orExpr(p))
    }

    private def reduceField(p: String, acc: String): (String, Expr) = {
      val k = identDots(); ws(); expect(":"); ws()
      (k, orExpr(p, acc))
    }

    // arithmetic for map()/reduce(): + - over * / %
    private def addSub(p: String, acc: String = null): Expr = {
      var l = mulDiv(p, acc); ws()
      while (i < src.length && (src(i) == '+' || (src(i) == '-' && !peekStr("->")))) {
        val op = src(i).toString; i += 1; ws(); l = Arith(op, l, mulDiv(p, acc)); ws()
      }
      l
    }
    private def mulDiv(p: String, acc: String = null): Expr = {
      var l = arithPrimary(p, acc); ws()
      while (i < src.length && (src(i) == '*' || src(i) == '/' || src(i) == '%')) {
        val op = src(i).toString; i += 1; ws(); l = Arith(op, l, arithPrimary(p, acc)); ws()
      }
      l
    }
    private def arithPrimary(p: String, acc: String = null): Expr = {
      if (peekWord("if")) {
        expectWord("if"); ws()
        val c = orExpr(p, acc); ws()
        expectWord("then"); ws()
        val a = addSub(p, acc); ws()
        expectWord("else"); ws()
        // addSub parses another arithPrimary first, so `else if …`
        // chains nest naturally
        val b = addSub(p, acc); ws()
        Cond(c, a, b)
      }
      // parens parse the FULL expression grammar (orExpr subsumes
      // arithmetic): `(x + y) * 2`, `(r.a or r.b) and r.c`, and
      // `(r._value > 1) == r.flag` all flow through this one branch
      else if (peekStr("(")) { expect("("); ws(); val e = orExpr(p, acc); ws(); expect(")"); e }
      else primary(p, acc)
    }

    // `acc` threads through the whole predicate chain so a conditional
    // inside a reduce() body can reference the accumulator record
    // (`if accumulator.count > 0 then …`)
    private def orExpr(p: String, acc: String = null): Expr = {
      var l = andExpr(p, acc); ws()
      while (peekWord("or")) { expectWord("or"); ws(); l = Or(l, andExpr(p, acc)); ws() }
      l
    }
    private def andExpr(p: String, acc: String = null): Expr = {
      var l = cmpExpr(p, acc); ws()
      while (peekWord("and")) { expectWord("and"); ws(); l = And(l, cmpExpr(p, acc)); ws() }
      l
    }
    private def cmpExpr(p: String, acc: String = null): Expr = {
      if (peekWord("not")) { expectWord("not"); ws(); return Not(cmpExpr(p, acc)) }
      if (peekWord("exists")) { expectWord("exists"); ws(); return Exists(primary(p, acc)) }
      // comparison operands are full arithmetic expressions (addSub),
      // so `r._value * 2.0 > 100.0 - r.base` parses; parenthesized
      // groups (boolean or arithmetic) flow through arithPrimary's
      // unified paren branch
      val lhs = addSub(p, acc); ws()
      val op = Seq("==", "!=", ">=", "<=", "=~", "!~", ">", "<").find(peekStr)
      op match {
        case Some(o) => expect(o); ws(); Cmp(o, lhs, addSub(p, acc))
        case None => lhs
      }
    }
    private def primary(p: String, acc: String = null): Expr = {
      // array literal in EXPRESSION context — the `set:` argument of
      // `contains(value:, set: ["a", "b"])` (Grafana's multi-select
      // template idiom); elements are literals via value()
      if (peekStr("[")) Lit(value())
      else if (peekStr("\"")) Lit(VStr(stringLit()))
      else if (peekStr("/")) { // /regex/
        expect("/")
        val sb = new StringBuilder
        while (i < src.length && src(i) != '/') { sb.append(src(i)); i += 1 }
        expect("/")
        Regex(sb.toString)
      }
      else if (i < src.length && (src(i).isDigit || src(i) == '-')) Lit(numOrDurOrTime())
      else if (peekWord("true")) { expectWord("true"); Lit(VBool(true)) }
      else if (peekWord("false")) { expectWord("false"); Lit(VBool(false)) }
      else {
        val name = ident()
        if (name == p) { expect("."); ColRef(identDots()) }
        else if (acc != null && name == acc) { expect("."); AccRef(identDots()) }
        else if (funcParams.contains(name)) ParamRef(name)
        else if (funcs.contains(name) && { ws(); peekStr("(") }) {
          // named-function call `f(x: r._value)`: parse the named
          // arguments (full expressions in the CALLER's scope) and
          // inline the body with parameters substituted
          val (params, body) = funcs(name)
          expect("("); ws()
          val binds = Map.newBuilder[String, Expr]
          def one(): Unit = {
            val k = ident(); ws(); expect(":"); ws(); binds += k -> orExpr(p, acc); ws()
          }
          if (!peekStr(")")) { one(); while (peekStr(",")) { expect(","); ws(); one() } }
          expect(")")
          val bound = binds.result()
          val missing = params.filterNot(bound.contains)
          if (missing.nonEmpty)
            fail(s"call to '$name' is missing argument(s): ${missing.mkString(", ")}")
          subst(body, bound)
        }
        else {
          // stdlib scalar call: a dotted package path (`math.sqrt`,
          // `strings.toUpper`, `date.hour`) or a bare conversion
          // (`int(v:)`, `float(v:)`, …). Parsed into [[FnCall]] with
          // full-expression named args; the evaluator owns the name →
          // Spark-function dispatch (and the unsupported-name error).
          var full = name
          while (peekStr(".")) { expect("."); full = s"$full.${ident()}" }
          ws()
          if (peekStr("(")) {
            expect("("); ws()
            val fargs = Seq.newBuilder[(String, Expr)]
            // full-grammar args: `string(v: r._value > 50.0)` passes a
            // predicate, `math.pow(x: r._value / 10.0, y: 2.0)` arithmetic
            def one(): Unit = {
              val k = ident(); ws(); expect(":"); ws(); fargs += k -> orExpr(p, acc); ws()
            }
            if (!peekStr(")")) { one(); while (peekStr(",")) { expect(","); ws(); one() } }
            expect(")")
            FnCall(full, fargs.result())
          } else fail(s"unknown identifier '$name' (expected $p.<column>, a literal, or a call)")
        }
      }
    }

    private def numOrDurOrTime(): Value = {
      val start = i
      if (peekStr("-")) i += 1
      while (i < src.length && src(i).isDigit) i += 1
      // RFC3339 timestamp?
      if (i < src.length && src(i) == '-' && i - start == 4) {
        while (i < src.length && (src(i).isLetterOrDigit || "-:.+".contains(src(i)))) i += 1
        return VTime(src.substring(start, i))
      }
      if (i < src.length && src(i) == '.') {
        i += 1
        while (i < src.length && src(i).isDigit) i += 1
        return VNum(src.substring(start, i).toDouble)
      }
      // duration suffix?
      val unitStart = i
      while (i < src.length && src(i).isLetter) i += 1
      val unit = src.substring(unitStart, i)
      if (unit.nonEmpty) {
        if (!Seq("ns", "us", "ms", "s", "m", "h", "d", "w", "mo", "y").contains(unit))
          fail(s"unknown duration unit '$unit'")
        val amount = src.substring(start, unitStart).toLong
        // compound fixed-width durations (`1h30m`, `1m30s`): more
        // digit+unit components follow directly; the sum normalizes to
        // a VDur in ns (exact — every fixed unit is a whole ns count).
        // The literal's sign applies to the WHOLE duration (-1h30m =
        // -(1h30m)), like Flux. Calendar units (mo/y) have no fixed
        // width and cannot appear in a compound.
        if (i < src.length && src(i).isDigit) {
          if (!fixedNs.contains(unit))
            fail(s"calendar unit '$unit' cannot start a compound duration")
          val neg = amount < 0
          var totalNs = amount * fixedNs(unit)
          while (i < src.length && src(i).isDigit) {
            val ds = i
            while (i < src.length && src(i).isDigit) i += 1
            val us = i
            while (i < src.length && src(i).isLetter) i += 1
            val u2 = src.substring(us, i)
            val n2 = src.substring(ds, us).toLong
            if (!fixedNs.contains(u2))
              fail(s"unknown or calendar unit '$u2' in compound duration")
            totalNs += (if (neg) -n2 else n2) * fixedNs(u2)
          }
          VDur(totalNs, "ns")
        } else VDur(amount, unit)
      } else VNum(src.substring(start, i).toDouble)
    }

    private def stringLit(): String = {
      expect("\"")
      val sb = new StringBuilder
      while (i < src.length && src(i) != '"') {
        if (src(i) == '\\' && i + 1 < src.length) { sb.append(src(i + 1)); i += 2 }
        else { sb.append(src(i)); i += 1 }
      }
      expect("\"")
      sb.toString
    }

    private def ident(): String = {
      val start = i
      while (i < src.length && (src(i).isLetterOrDigit || src(i) == '_')) i += 1
      if (i == start) fail("expected identifier")
      src.substring(start, i)
    }
    private def identDots(): String = {
      val start = i
      while (i < src.length && (src(i).isLetterOrDigit || src(i) == '_' || src(i) == '.')) i += 1
      if (i == start) fail("expected identifier")
      src.substring(start, i)
    }

    private def ws(): Unit = {
      var go = true
      while (go) {
        while (i < src.length && src(i).isWhitespace) i += 1
        if (peekStr("//")) { while (i < src.length && src(i) != '\n') i += 1 }
        else go = false
      }
    }
    private def peekStr(s: String): Boolean = src.regionMatches(i, s, 0, s.length)
    private def peekWord(w: String): Boolean =
      peekStr(w) && (i + w.length >= src.length || !(src(i + w.length).isLetterOrDigit || src(i + w.length) == '_'))
    private def expect(s: String): Unit =
      if (peekStr(s)) i += s.length else fail(s"expected '$s'")
    private def expectWord(w: String): Unit =
      if (peekWord(w)) i += w.length else fail(s"expected '$w'")
    private def fail(msg: String): Nothing = throw ParseException(msg, i)
  }
}
