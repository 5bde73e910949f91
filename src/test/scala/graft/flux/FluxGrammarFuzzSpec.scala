package graft.flux

import graft.SparkSpec
import graft.dsl.FluxFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Property fuzz of the unified Flux text expression grammar (VERDICT
  * r14 #6): random expression trees over the implemented stdlib are
  * rendered to Flux text with MINIMAL parentheses (so precedence and
  * associativity resolution is what's under test), evaluated through
  * text → parse → Catalyst translation, and compared bit-for-bit
  * against the same tree built directly as a Spark Column. Since both
  * sides execute in Spark, any mismatch is a parser/translator defect,
  * never an engine-semantics difference.
  *
  * Coverage per tree: arithmetic precedence (+ - * / %), left-
  * associativity (FP addition is not associative, so a wrongly
  * re-associated parse fails the bit compare), comparisons over
  * arithmetic operands, and/or/not chains, if/then/else, nested
  * stdlib calls (the r14 grammar-unification surface), and the
  * division-vs-regex disambiguation (every `/` in a rendered tree).
  * Trees are batched ~50 per map() call so 1k+ trees cost ~30 Spark
  * jobs, and multi-field `with` records get exercised for free.
  */
class FluxGrammarFuzzSpec extends SparkSpec {
  import spark.implicits._
  import org.scalacheck.Gen
  import org.scalacheck.rng.Seed

  private val params = Gen.Parameters.default
  private var seed = Seed(42L)
  private def next[A](g: Gen[A]): A = {
    val v = g.pureApply(params, seed); seed = seed.next; v
  }

  // ---- dual-representation trees: Flux text + direct Spark Column

  private sealed trait NE { def lvl: Int } // numeric-valued
  private case class NLit(v: Double) extends NE { val lvl = 5 }
  private case object NRef extends NE { val lvl = 5 }
  private case class NBin(op: String, l: NE, r: NE) extends NE {
    val lvl = if (op == "+" || op == "-") 3 else 4
  }
  private case class NCall1(name: String, x: NE) extends NE { val lvl = 5 }
  private case class NCall2(name: String, k1: String, a: NE, k2: String, b: NE)
    extends NE { val lvl = 5 }
  private case class NCond(c: BE, a: NE, b: NE) extends NE { val lvl = 0 }

  private sealed trait BE { def lvl: Int } // boolean-valued
  private case class BCmp(op: String, l: NE, r: NE) extends BE { val lvl = 2 }
  private case class BAnd(l: BE, r: BE) extends BE { val lvl = 1 }
  private case class BOr(l: BE, r: BE) extends BE { val lvl = 0 }
  private case class BNot(b: BE) extends BE { val lvl = 2 }

  // minimal parens: wrap a child whose level is weaker than the
  // context, or an equal-level RIGHT operand (the parser is
  // left-associative, and FP arithmetic is order-sensitive)
  private def rn(e: NE, ctx: Int, right: Boolean): String = {
    val s = e match {
      case NLit(v) => v.toString
      case NRef => "r._value"
      case NBin(op, l, r) =>
        s"${rn(l, e.lvl, right = false)} $op ${rn(r, e.lvl, right = true)}"
      case NCall1(n, x) => s"$n(x: ${rn(x, 0, right = false)})"
      case NCall2(n, k1, a, k2, b) =>
        s"$n($k1: ${rn(a, 0, right = false)}, $k2: ${rn(b, 0, right = false)})"
      case NCond(c, a, b) =>
        s"if ${rb(c, 0)} then ${rn(a, 3, right = false)} else ${rn(b, 3, right = false)}"
    }
    if (e.lvl < ctx || (right && e.lvl == ctx)) s"($s)" else s
  }
  private def rb(e: BE, ctx: Int): String = {
    val s = e match {
      case BCmp(op, l, r) => s"${rn(l, 3, right = false)} $op ${rn(r, 3, right = false)}"
      case BAnd(l, r) => s"${rb(l, 1)} and ${rb(r, 1)}"
      case BOr(l, r) => s"${rb(l, 0)} or ${rb(r, 0)}"
      case BNot(b) => s"not ${rb(b, 2)}"
    }
    if (e.lvl < ctx) s"($s)" else s
  }

  // the Catalyst column FluxEval must arrive at (its documented
  // translation per stdlib name)
  private def cn(e: NE): Column = e match {
    case NLit(v) => lit(v)
    case NRef => col("value")
    case NBin("+", l, r) => cn(l) + cn(r)
    case NBin("-", l, r) => cn(l) - cn(r)
    case NBin("*", l, r) => cn(l) * cn(r)
    case NBin("/", l, r) => cn(l) / cn(r)
    case NBin("%", l, r) => cn(l) % cn(r)
    case NBin(o, _, _) => sys.error(o)
    case NCall1("math.abs", x) => abs(cn(x))
    case NCall1("math.sqrt", x) => sqrt(cn(x))
    case NCall1("math.cbrt", x) => cbrt(cn(x))
    case NCall1("math.floor", x) => floor(cn(x)).cast("double")
    case NCall1("math.ceil", x) => ceil(cn(x)).cast("double")
    case NCall1("math.round", x) => round(cn(x)).cast("double")
    case NCall1("math.trunc", x) =>
      val c = cn(x); when(c >= 0, floor(c)).otherwise(ceil(c)).cast("double")
    case NCall1("math.tanh", x) => tanh(cn(x))
    case NCall1(n, _) => sys.error(n)
    case NCall2("math.pow", _, a, _, b) => pow(cn(a), cn(b))
    case NCall2("math.mMax", _, a, _, b) => greatest(cn(a), cn(b))
    case NCall2("math.mMin", _, a, _, b) => least(cn(a), cn(b))
    case NCall2("math.hypot", _, a, _, b) => hypot(cn(a), cn(b))
    case NCall2("math.atan2", _, a, _, b) => atan2(cn(a), cn(b))
    case NCall2("math.mod", _, a, _, b) => cn(a) % cn(b)
    case NCall2(n, _, _, _, _) => sys.error(n)
    case NCond(c, a, b) => when(cb(c), cn(a)).otherwise(cn(b))
  }
  private def cb(e: BE): Column = e match {
    case BCmp("==", l, r) => cn(l) === cn(r)
    case BCmp("!=", l, r) => cn(l) =!= cn(r)
    case BCmp(">", l, r) => cn(l) > cn(r)
    case BCmp("<", l, r) => cn(l) < cn(r)
    case BCmp(">=", l, r) => cn(l) >= cn(r)
    case BCmp("<=", l, r) => cn(l) <= cn(r)
    case BCmp(o, _, _) => sys.error(o)
    case BAnd(l, r) => cb(l) && cb(r)
    case BOr(l, r) => cb(l) || cb(r)
    case BNot(b) => !cb(b)
  }

  // ---- generators (size-bounded; leaves get likelier with depth)

  private val lits = Seq(0.5, 1.5, 2.0, 2.5, 3.0, 4.5, 10.0)
  private val call1s = Seq("math.abs", "math.sqrt", "math.cbrt", "math.floor",
    "math.ceil", "math.round", "math.trunc", "math.tanh")
  private val call2s = Seq(
    ("math.pow", "x", "y"), ("math.mMax", "x", "y"), ("math.mMin", "x", "y"),
    ("math.hypot", "p", "q"), ("math.atan2", "y", "x"), ("math.mod", "x", "y"))
  private val arith = Seq("+", "-", "*", "/", "%")
  private val cmps = Seq("==", "!=", ">", "<", ">=", "<=")

  private def genN(depth: Int): NE =
    if (depth == 0 || next(Gen.chooseNum(0, 3)) == 0)
      if (next(Gen.chooseNum(0, 1)) == 0) NRef
      else NLit(lits(next(Gen.chooseNum(0, lits.size - 1))))
    else next(Gen.chooseNum(0, 9)) match {
      case n if n <= 4 => // arithmetic dominates, like real queries
        val op = arith(next(Gen.chooseNum(0, 4)))
        val r0 = genN(depth - 1)
        // ANSI mode throws on a zero divisor: guard / and % with a
        // structurally-positive denominator (abs(sub) + 0.5), which is
        // itself part of the tree rendered on both sides
        val r =
          if (op == "/" || op == "%")
            NBin("+", NCall1("math.abs", r0), NLit(0.5))
          else r0
        NBin(op, genN(depth - 1), r)
      case 5 | 6 =>
        NCall1(call1s(next(Gen.chooseNum(0, call1s.size - 1))), genN(depth - 1))
      case 7 | 8 =>
        val (n, k1, k2) = call2s(next(Gen.chooseNum(0, call2s.size - 1)))
        val b0 = genN(depth - 1)
        val b = if (n == "math.mod") // remainder: same zero-divisor guard
          NBin("+", NCall1("math.abs", b0), NLit(0.5)) else b0
        NCall2(n, k1, genN(depth - 1), k2, b)
      case _ => NCond(genB(depth - 1), genN(depth - 1), genN(depth - 1))
    }

  private def genB(depth: Int): BE =
    if (depth == 0 || next(Gen.chooseNum(0, 2)) == 0)
      BCmp(cmps(next(Gen.chooseNum(0, 5))), genN(math.max(depth - 1, 1)),
        genN(math.max(depth - 1, 1)))
    else next(Gen.chooseNum(0, 3)) match {
      case 0 => BAnd(genB(depth - 1), genB(depth - 1))
      case 1 => BOr(genB(depth - 1), genB(depth - 1))
      case 2 => BNot(genB(depth - 1))
      case _ => BCmp(cmps(next(Gen.chooseNum(0, 5))), genN(depth - 1), genN(depth - 1))
    }

  // ---- fixture

  private def baseDf = Seq(
    ("cpu", java.sql.Timestamp.valueOf("2024-01-08 01:10:30"), 4.0),
    ("cpu", java.sql.Timestamp.valueOf("2024-01-08 07:20:00"), 9.0),
    ("cpu", java.sql.Timestamp.valueOf("2024-01-08 13:15:45"), 16.0),
    ("mem", java.sql.Timestamp.valueOf("2024-01-09 00:05:00"), 25.5),
    ("cpu", java.sql.Timestamp.valueOf("2024-01-09 18:10:00"), -2.5))
    .toDF("measurement", "ts", "value")

  private def source = FluxEval.Source(
    resolve = _ => FluxFrame(baseDf, Seq("measurement"), "ts", "value"),
    rename = Map("_time" -> "ts", "_value" -> "value",
      "_measurement" -> "measurement"))

  private def bits(a: Any): Any = a match {
    case d: java.lang.Double => java.lang.Double.doubleToLongBits(d)
    case x => x
  }

  test("1000 random numeric/boolean trees: text parse-eval ≡ direct Column (batched map)") {
    var trees = 0
    (0 until 20).foreach { batch =>
      val fields = (0 until 50).map { i =>
        // mix: 70% numeric, 30% boolean map fields
        if (next(Gen.chooseNum(0, 9)) < 7) {
          val t = genN(4); (s"o$i", rn(t, 0, right = false), cn(t))
        } else {
          val t = genB(3); (s"o$i", rb(t, 0), cb(t))
        }
      }
      trees += fields.size
      val body = fields.map { case (n, txt, _) => s"$n: $txt" }.mkString(", ")
      val got = FluxEval.run(
        s"""from(bucket: "b") |> map(fn: (r) => ({ r with $body }))""", source)
        .select(col("_value") +: fields.map { case (n, _, _) => col(n) }: _*)
        .orderBy("_value").collect()
        .map(_.toSeq.map(bits))
      val want = baseDf
        .select(col("value") +: fields.map { case (n, _, c) => c.as(n) }: _*)
        .orderBy("value").collect()
        .map(_.toSeq.map(bits))
      assert(got.toSeq == want.toSeq, s"batch $batch diverged; fields:\n" +
        fields.map(f => s"  ${f._1}: ${f._2}").mkString("\n"))
    }
    assert(trees == 1000)
  }

  test("60 random boolean trees drive filter() identically to the direct predicate") {
    (0 until 60).foreach { i =>
      val t = genB(4)
      val txt = rb(t, 0)
      val got = FluxEval.run(
        s"""from(bucket: "b") |> filter(fn: (r) => $txt)""", source)
        .select("_value").orderBy("_value").collect().map(_.getDouble(0)).toSeq
      val want = baseDf.filter(cb(t))
        .select("value").orderBy("value").collect().map(_.getDouble(0)).toSeq
      assert(got == want, s"filter tree $i diverged: $txt")
    }
  }

  test("unknown stdlib names and wrong arg spellings fail loudly, never silently") {
    // fixed pins
    val e1 = intercept[FluxEval.EvalException](FluxEval.run(
      """from(bucket: "b") |> map(fn: (r) => ({ r with o: math.nope(x: r._value) }))""",
      source).collect())
    assert(e1.getMessage.contains("math.nope"))
    val e2 = intercept[FluxEval.EvalException](FluxEval.run(
      """from(bucket: "b") |> map(fn: (r) => ({ r with o: math.pow(a: r._value, y: 2.0) }))""",
      source).collect())
    assert(e2.getMessage.contains("x"))
    // randomized: corrupt a valid call's name or an arg key; the error
    // must carry the offending spelling
    (0 until 40).foreach { _ =>
      val (n, k1, k2) = call2s(next(Gen.chooseNum(0, call2s.size - 1)))
      val corruptName = next(Gen.chooseNum(0, 1)) == 0
      val (name, a1) = if (corruptName) (n + "x", k1) else (n, k1 + "z")
      val q = s"""from(bucket: "b") |> map(fn: (r) => ({ r with o: $name($a1: r._value, $k2: 2.0) }))"""
      val ex = intercept[FluxEval.EvalException](
        FluxEval.run(q, source).collect())
      if (corruptName) assert(ex.getMessage.contains(name))
      else assert(ex.getMessage.contains(k1),
        s"missing-arg error should name the expected key '$k1': ${ex.getMessage}")
    }
  }
}
