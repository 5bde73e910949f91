package graft.influxql

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Property fuzz of the InfluxQL SELECT expression surface — the
  * v1-side twin of graft.flux.FluxGrammarFuzzSpec: random expression
  * trees rendered with MINIMAL parentheses, evaluated via text →
  * InfluxQL parse → Catalyst, bit-compared against the same tree built
  * directly as a Spark Column. Both sides execute in Spark, so a
  * mismatch is a parser/translator defect. Covers raw-mode trees
  * (row-wise field refs, scalar math functions, + - * / precedence and
  * left-associativity) and aggregate-mode trees (arithmetic OVER
  * sum/mean/min/max/count/spread), plus loud-error pins for unknown
  * functions and illegal raw/aggregate mixing.
  */
class InfluxQLGrammarFuzzSpec extends SparkSpec {
  import spark.implicits._
  import org.scalacheck.Gen
  import org.scalacheck.rng.Seed

  private val params = Gen.Parameters.default
  private var seed = Seed(99L)
  private def next[A](g: Gen[A]): A = {
    val v = g.pureApply(params, seed); seed = seed.next; v
  }

  // ---- dual-representation numeric trees

  private sealed trait NE { def lvl: Int }
  private case class NLit(v: Double) extends NE { val lvl = 5 }
  private case object NRef extends NE { val lvl = 5 } // raw `value`
  private case class NAgg(fn: String) extends NE { val lvl = 5 } // agg mode
  private case class NBin(op: Char, l: NE, r: NE) extends NE {
    val lvl = if (op == '+' || op == '-') 3 else 4
  }
  private case class NFun(name: String, args: Seq[NE]) extends NE { val lvl = 5 }

  private def rn(e: NE, ctx: Int, right: Boolean): String = {
    val s = e match {
      case NLit(v) => v.toString
      case NRef => "value"
      case NAgg(fn) => s"$fn(value)"
      case NBin(op, l, r) =>
        s"${rn(l, e.lvl, right = false)} $op ${rn(r, e.lvl, right = true)}"
      case NFun(n, args) =>
        args.map(rn(_, 0, right = false)).mkString(s"$n(", ", ", ")")
    }
    if (e.lvl < ctx || (right && e.lvl == ctx)) s"($s)" else s
  }

  private def cn(e: NE): Column = e match {
    case NLit(v) => lit(v)
    case NRef => col("value")
    case NAgg("sum") => sum(col("value"))
    case NAgg("mean") => avg(col("value"))
    case NAgg("min") => min(col("value"))
    case NAgg("max") => max(col("value"))
    case NAgg("count") => count(col("value"))
    case NAgg("spread") => max(col("value")) - min(col("value"))
    case NAgg(o) => sys.error(o)
    case NBin('+', l, r) => cn(l) + cn(r)
    case NBin('-', l, r) => cn(l) - cn(r)
    case NBin('*', l, r) => cn(l) * cn(r)
    case NBin('/', l, r) => cn(l) / cn(r)
    case NBin(o, _, _) => sys.error(o.toString)
    case NFun("abs", Seq(x)) => abs(cn(x))
    case NFun("ceil", Seq(x)) => ceil(cn(x)).cast("double")
    case NFun("floor", Seq(x)) => floor(cn(x)).cast("double")
    case NFun("round", Seq(x)) => round(cn(x))
    case NFun("sqrt", Seq(x)) => sqrt(cn(x))
    case NFun("sin", Seq(x)) => sin(cn(x))
    case NFun("cos", Seq(x)) => cos(cn(x))
    case NFun("atan", Seq(x)) => atan(cn(x))
    case NFun("pow", Seq(a, b)) => pow(cn(a), cn(b))
    case NFun("atan2", Seq(a, b)) => atan2(cn(a), cn(b))
    case NFun(n, _) => sys.error(n)
  }

  private val lits = Seq(0.5, 1.5, 2.0, 2.5, 3.0, 4.5, 10.0)
  private val fun1 = Seq("abs", "ceil", "floor", "round", "sqrt", "sin", "cos", "atan")
  private val fun2 = Seq("pow", "atan2")
  private val aggs = Seq("sum", "mean", "min", "max", "count", "spread")

  private def genN(depth: Int, aggMode: Boolean): NE =
    if (depth == 0 || next(Gen.chooseNum(0, 3)) == 0)
      next(Gen.chooseNum(0, 2)) match {
        case 0 => NLit(lits(next(Gen.chooseNum(0, lits.size - 1))))
        case _ if aggMode => NAgg(aggs(next(Gen.chooseNum(0, aggs.size - 1))))
        case _ => NRef
      }
    else next(Gen.chooseNum(0, 8)) match {
      case n if n <= 4 =>
        val op = "+-*/".charAt(next(Gen.chooseNum(0, 3)))
        val r0 = genN(depth - 1, aggMode)
        // ANSI throws on zero divisors: structurally-positive denominator
        val r = if (op == '/') NBin('+', NFun("abs", Seq(r0)), NLit(0.5)) else r0
        NBin(op, genN(depth - 1, aggMode), r)
      case 5 | 6 | 7 =>
        NFun(fun1(next(Gen.chooseNum(0, fun1.size - 1))), Seq(genN(depth - 1, aggMode)))
      case _ =>
        NFun(fun2(next(Gen.chooseNum(0, fun2.size - 1))),
          Seq(genN(depth - 1, aggMode), genN(depth - 1, aggMode)))
    }

  // ---- fixture: a tiny measurement with a double field

  private def baseDf = Seq(
    (java.sql.Timestamp.valueOf("2024-01-08 00:00:01"), 4.0),
    (java.sql.Timestamp.valueOf("2024-01-08 00:00:02"), 9.0),
    (java.sql.Timestamp.valueOf("2024-01-08 00:00:03"), 16.0),
    (java.sql.Timestamp.valueOf("2024-01-08 00:00:04"), 25.5),
    (java.sql.Timestamp.valueOf("2024-01-08 00:00:05"), -2.5))
    .toDF("time", "value")

  private def source = InfluxQLEval.Source(resolve = _ => baseDf)

  private def bits(a: Any): Any = a match {
    case d: java.lang.Double => java.lang.Double.doubleToLongBits(d)
    case x => x
  }

  private def collectBits(df: org.apache.spark.sql.DataFrame,
      cols: Seq[String]): Seq[Seq[Any]] =
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(bits)).toSeq.sortBy(_.mkString("|"))

  test("600 random raw-mode expression trees: text parse-eval ≡ direct Column") {
    (0 until 12).foreach { batch =>
      val fields = (0 until 50).map { i =>
        val t = genN(4, aggMode = false)
        (s"o$i", rn(t, 0, right = false), cn(t))
      }
      val sel = fields.map { case (n, txt, _) => s"$txt AS $n" }.mkString(", ")
      val got = InfluxQLEval.run(s"SELECT $sel FROM m", source)
      val names = fields.map(_._1)
      val want = baseDf.select(fields.map { case (n, _, c) => c.as(n) }: _*)
      assert(collectBits(got, names) == collectBits(want, names),
        s"batch $batch diverged; fields:\n" +
          fields.map(f => s"  ${f._1}: ${f._2}").mkString("\n"))
    }
  }

  test("400 random aggregate-mode expression trees: arithmetic over aggregates matches") {
    (0 until 8).foreach { batch =>
      val fields = (0 until 50).map { i =>
        val t0 = genN(3, aggMode = true)
        // every projection must carry at least one aggregate, or the
        // statement would classify as mixed raw/aggregate and be
        // rejected (that rejection is pinned in the loud-error test)
        def hasAgg(e: NE): Boolean = e match {
          case NAgg(_) => true
          case NBin(_, l, r) => hasAgg(l) || hasAgg(r)
          case NFun(_, args) => args.exists(hasAgg)
          case _ => false
        }
        val t = if (hasAgg(t0)) t0
          else NBin('+', t0, NAgg(aggs(next(Gen.chooseNum(0, aggs.size - 1)))))
        (s"o$i", rn(t, 0, right = false), cn(t))
      }
      val sel = fields.map { case (n, txt, _) => s"$txt AS $n" }.mkString(", ")
      val got = InfluxQLEval.run(s"SELECT $sel FROM m", source)
      val names = fields.map(_._1)
      val want = baseDf.agg(fields.head._3.as(names.head),
        fields.tail.map { case (n, _, c) => c.as(n) }: _*)
      assert(collectBits(got, names) == collectBits(want, names),
        s"agg batch $batch diverged; fields:\n" +
          fields.map(f => s"  ${f._1}: ${f._2}").mkString("\n"))
    }
  }

  test("unknown functions and raw/aggregate mixing fail loudly") {
    val e1 = intercept[Exception](
      InfluxQLEval.run("SELECT nope(value) + 1.0 AS o FROM m", source).collect())
    assert(e1.getMessage.contains("nope"), e1.getMessage)
    // a raw field inside an aggregate expression has no row context —
    // rejected at PARSE time (statement classification), still loud
    val e2 = intercept[Exception](
      InfluxQLEval.run("SELECT sum(value) + value AS o FROM m", source).collect())
    assert(e2.getMessage.toLowerCase.contains("aggregate")
      || e2.getMessage.contains("value"), e2.getMessage)
    // randomized corruption: valid tree, corrupted function name —
    // loud at whichever layer catches it (parser or evaluator), and
    // the error must carry the offending spelling
    (0 until 20).foreach { _ =>
      val n = fun1(next(Gen.chooseNum(0, fun1.size - 1))) + "x"
      val ex = intercept[Exception](
        InfluxQLEval.run(s"SELECT $n(value) AS o FROM m", source).collect())
      assert(ex.getMessage.contains(n), ex.getMessage)
    }
  }
}
