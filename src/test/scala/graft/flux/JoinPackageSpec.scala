package graft.flux

import graft.SparkSpec
import graft.dsl.FluxFrame
import org.apache.spark.sql.functions._

/** The join package's method variants (`join.inner/left/right/full/
  * time`) through the text surface, plus the two-param on-lambda parse
  * and the monitor package's level classifier — hand frames with known
  * matches on every side.
  */
class JoinPackageSpec extends SparkSpec {
  import spark.implicits._
  import FluxParser._

  private def src(frames: Map[String, FluxFrame]): FluxEval.Source =
    FluxEval.Source(resolve = b => frames(b))

  private lazy val left = FluxFrame(
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("_time", "k", "lv"),
    Nil, "_time", "lv")
  private lazy val right = FluxFrame(
    Seq((1L, "b", 200.0), (2L, "c", 300.0), (3L, "d", 400.0))
      .toDF("_time", "k", "rv"),
    Nil, "_time", "rv")

  private def run(q: String): org.apache.spark.sql.DataFrame =
    FluxEval.run(q, src(Map("l" -> left, "r" -> right)))

  test("on-lambda parses to VLambda2 with left/right member scopes") {
    val p = FluxParser.parse(
      """join.left(left: a, right: b, on: (l, r) => l.k == r.k and l.t == r.t)""")
    val VLambda2(lp, rp, body) = p.calls.head.args("on"): @unchecked
    assert(lp == "l" && rp == "r")
    assert(body == And(
      Cmp("==", ColRef("k"), AccRef("k")),
      Cmp("==", ColRef("t"), AccRef("t"))))
  }

  test("join.inner keeps only matching keys") {
    val out = run("""a = from(bucket: "l")
      |b = from(bucket: "r")
      |join.inner(left: a, right: b, on: (l, r) => l.k == r.k)""".stripMargin)
    assert(out.select("k").as[String].collect().sorted.toSeq == Seq("b", "c"))
  }

  test("join.left keeps unmatched left rows with null right columns") {
    val out = run("""a = from(bucket: "l")
      |b = from(bucket: "r")
      |join.left(left: a, right: b, on: (l, r) => l.k == r.k)""".stripMargin)
    assert(out.count() == 3)
    assert(out.filter(col("rv").isNull).select("k").as[String].collect().toSeq == Seq("a"))
  }

  test("join.right and join.full mirror the unmatched-side rules") {
    val r = run("""a = from(bucket: "l")
      |b = from(bucket: "r")
      |join.right(left: a, right: b, on: (l, r) => l.k == r.k)""".stripMargin)
    assert(r.count() == 3)
    assert(r.filter(col("lv").isNull).select("k").as[String].collect().toSeq == Seq("d"))
    val f = run("""a = from(bucket: "l")
      |b = from(bucket: "r")
      |join.full(left: a, right: b, on: (l, r) => l.k == r.k)""".stripMargin)
    assert(f.count() == 4)
  }

  test("join.time adds the time column to the key set") {
    val out = run("""a = from(bucket: "l")
      |b = from(bucket: "r")
      |join.time(left: a, right: b, on: (l, r) => l.k == r.k)""".stripMargin)
    // (b,1) vs (b,2) and (c,3) vs (c,2): no (k, _time) pair matches
    assert(out.count() == 0)
  }

  test("mid-pipe join.left uses the piped frame as the left side") {
    val out = run("""b = from(bucket: "r")
      |from(bucket: "l") |> join.left(right: b, on: (l, r) => l.k == r.k)""".stripMargin)
    assert(out.count() == 3)
  }

  test("unequal key names align right onto left") {
    val renamed = FluxFrame(right.df.withColumnRenamed("k", "k2"), Nil, "_time", "rv")
    val out = FluxEval.run("""a = from(bucket: "l")
      |b = from(bucket: "r2")
      |join.inner(left: a, right: b, on: (l, r) => l.k == r.k2)""".stripMargin,
      src(Map("l" -> left, "r2" -> renamed)))
    assert(out.select("k").as[String].collect().sorted.toSeq == Seq("b", "c"))
  }

  test("monitor.check classifies levels in crit-warn-info-ok order") {
    val f = FluxFrame(Seq((1L, 95.0), (2L, 80.0), (3L, 60.0), (4L, 10.0))
      .toDF("_time", "_value"), Nil, "_time", "_value")
    val out = FluxEval.run(
      """from(bucket: "m")
        ||> monitor.check(crit: (r) => r._value > 90.0, warn: (r) => r._value > 75.0, info: (r) => r._value > 50.0, data: {_check_name: "c1"})""".stripMargin,
      src(Map("m" -> f)))
    assert(out.orderBy("_time").select("_level").as[String].collect().toSeq ==
      Seq("crit", "warn", "info", "ok"))
    assert(out.select("_measurement").distinct().as[String].collect().toSeq ==
      Seq("statuses"))
    // explicit non-matching ok predicate → "unknown", like the stdlib
    val unk = FluxEval.run(
      """from(bucket: "m")
        ||> monitor.check(crit: (r) => r._value > 90.0, ok: (r) => r._value > 50.0, data: {_check_name: "c1"})""".stripMargin,
      src(Map("m" -> f)))
    assert(unk.orderBy("_time").select("_level").as[String].collect().toSeq ==
      Seq("crit", "ok", "ok", "unknown"))
  }
}
