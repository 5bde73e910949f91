package graft.flux

import graft.SparkSpec
import graft.dsl.FluxFrame
import org.apache.spark.sql.functions._

/** Metamorphic properties over randomized Flux PIPELINES — the
  * verb-chain complement to the expression fuzz: instead of mirroring
  * the translation, these assert invariants any correct engine must
  * satisfy for EVERY parameterization, so they catch verb-plumbing
  * bugs (lost rows, double counting, window boundary drift, group-key
  * leaks) without coupling to the implementation. Values are integers
  * so every sum is exact — no FP-order tolerance anywhere.
  *
  *  P1 filter partition:   sum(p) + sum(!p) = sum()           (40 random predicates)
  *  P2 window partition:   Σ window sums = series total       (40 random widths AND offsets)
  *  P3 count preservation: map/timeShift/sort keep the count  (40 random chains)
  *  P4 limit contract:     |sort |> limit(n)| = min(n, rows)  (40 random n)
  *  P5 group conservation: Σ per-tag sums = global sum        (40 random tag splits)
  *  P6 transform inverse:  difference ∘ cumulativeSum = tail   (20 random scales)
  *  P7 shift round-trip:   timeShift(d) ∘ timeShift(-d) = id   (20 random durations)
  *  P8 derived aggregate:  spread = max − min                  (20 random pre-filters)
  */
class FluxMetamorphicSpec extends SparkSpec {
  import spark.implicits._
  import org.scalacheck.Gen
  import org.scalacheck.rng.Seed

  private val params = Gen.Parameters.default
  private var seed = Seed(7L)
  private def next[A](g: Gen[A]): A = {
    val v = g.pureApply(params, seed); seed = seed.next; v
  }
  private def pick[A](xs: Seq[A]): A = xs(next(Gen.chooseNum(0, xs.size - 1)))

  // 216 rows: 2 measurements × 3 hosts × 36 hourly points over 3 days,
  // deterministic integer values
  private def baseDf = {
    val t0 = java.sql.Timestamp.valueOf("2024-01-08 00:00:00").getTime
    val rows = for {
      (m, mi) <- Seq("cpu", "mem").zipWithIndex
      (h, hi) <- Seq("h1", "h2", "h3").zipWithIndex
      k <- 0 until 36
    } yield (m, h, new java.sql.Timestamp(t0 + k * 2 * 3600 * 1000L),
      ((mi * 131 + hi * 37 + k * 17) % 101).toDouble)
    rows.toDF("measurement", "host", "ts", "value")
  }

  private def source = FluxEval.Source(
    resolve = _ => FluxFrame(baseDf, Seq("measurement"), "ts", "value"),
    rename = Map("_time" -> "ts", "_value" -> "value",
      "_measurement" -> "measurement"))

  private def run(q: String) = FluxEval.run(q, source)

  /** per-measurement sums of a result frame (missing measurement = 0) */
  private def sums(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.groupBy("_measurement").agg(sum(col("_value").cast("long")).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      .withDefaultValue(0L)

  private val total: Map[String, Long] = sums(
    run("""from(bucket: "b") |> sum()"""))

  test("P1: a filter and its negation partition every sum (40 random predicates)") {
    (0 until 40).foreach { i =>
      val th = next(Gen.chooseNum(0, 100))
      val (p, notP) = pick(Seq(
        (s"r._value > $th.0", s"r._value <= $th.0"),
        (s"r._value < $th.0", s"r._value >= $th.0"),
        (s"r._value == $th.0", s"r._value != $th.0"),
        ("""r.host == "h2"""", """r.host != "h2"""")))
      val a = sums(run(s"""from(bucket: "b") |> filter(fn: (r) => $p) |> sum()"""))
      val b = sums(run(s"""from(bucket: "b") |> filter(fn: (r) => $notP) |> sum()"""))
      Seq("cpu", "mem").foreach { m =>
        assert(a(m) + b(m) == total(m),
          s"P1[$i] $p: ${a(m)} + ${b(m)} != ${total(m)} for $m")
      }
    }
  }

  test("P2: window sums re-aggregate to the series total (40 random widths AND offsets)") {
    (0 until 40).foreach { i =>
      val every = pick(Seq("1h", "2h", "3h", "4h", "5h", "6h", "7h", "8h", "12h", "1d"))
      // non-zero offsets shift every window boundary — the classic
      // boundary-drift bug class this property exists to catch
      val off = pick(Seq("", s", offset: ${next(Gen.chooseNum(1, 5))}h",
        ", offset: 30m"))
      val agged = run(
        s"""from(bucket: "b")
           ||> range(start: 2024-01-07T00:00:00Z, stop: 2024-01-12T00:00:00Z)
           ||> aggregateWindow(every: $every$off, fn: sum, createEmpty: false)""".stripMargin)
      Seq("cpu", "mem").foreach { m =>
        assert(sums(agged)(m) == total(m),
          s"P2[$i] every=$every$off: window sums diverge for $m")
      }
    }
  }

  test("P3: map/timeShift/sort preserve the row count (40 random chains)") {
    val n0 = run("""from(bucket: "b")""").count()
    (0 until 40).foreach { i =>
      val verbs = Seq.fill(next(Gen.chooseNum(1, 3)))(pick(Seq(
        s"map(fn: (r) => ({ r with _value: r._value * ${next(Gen.chooseNum(2, 9))}.0 }))",
        s"timeShift(duration: ${next(Gen.chooseNum(1, 48))}h)",
        "sort(columns: [\"_value\"])",
        "sort(columns: [\"_time\"], desc: true)")))
      val q = ("""from(bucket: "b")""" +: verbs.map("|> " + _)).mkString(" ")
      assert(run(q).count() == n0, s"P3[$i] lost/duplicated rows: $q")
    }
  }

  test("P4: limit/tail return exactly min(n, rows) rows (40 random n)") {
    val n0 = run("""from(bucket: "b") |> filter(fn: (r) => r._measurement == "cpu")""").count()
    (0 until 40).foreach { i =>
      val n = next(Gen.chooseNum(1, 250))
      val verb = pick(Seq("limit", "tail"))
      val got = run(
        s"""from(bucket: "b") |> filter(fn: (r) => r._measurement == "cpu") |> $verb(n: $n)""").count()
      assert(got == math.min(n.toLong, n0), s"P4[$i] $verb(n: $n): got $got of $n0")
    }
  }

  test("P6: difference() inverts cumulativeSum() — the transform pair round-trips (20 random scales)") {
    // per series: cumulativeSum then difference reproduces every value
    // after the first (difference drops the head row of each table)
    val original = run("""from(bucket: "b") |> sort(columns: ["_time"])""")
      .select("_measurement", "_time", "_value").collect()
      .map(r => (r.getString(0), r.getTimestamp(1)))
      .groupBy(_._1).view.mapValues(_.length).toMap
    (0 until 20).foreach { i =>
      val k = next(Gen.chooseNum(2, 9))
      val round = run(
        s"""from(bucket: "b")
           ||> map(fn: (r) => ({ r with _value: r._value * $k.0 }))
           ||> cumulativeSum() |> difference()""".stripMargin)
        .select(col("_measurement"), col("_time"), col("_value").cast("long").as("v"))
        .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))).toSet
      val direct = run(
        s"""from(bucket: "b")
           ||> map(fn: (r) => ({ r with _value: r._value * $k.0 }))""".stripMargin)
        .select(col("_measurement"), col("_time"), col("_value").cast("long").as("v"))
        .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
      // drop each series' first row (by time) from the direct side
      val heads = direct.groupBy(_._1).view
        .mapValues(_.minBy(_._2.getTime)).values.toSet
      assert(round == direct.toSet -- heads, s"P6[$i] k=$k diverged")
      // and row counts: one fewer per series
      assert(round.size == direct.length - original.size)
    }
  }

  test("P7: timeShift(d) then timeShift(-d) is the identity (20 random durations)") {
    val base = run("""from(bucket: "b")""")
      .select("_measurement", "_time", "_value").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2))).toSet
    (0 until 20).foreach { i =>
      val d = next(Gen.chooseNum(1, 72))
      val got = run(
        s"""from(bucket: "b") |> timeShift(duration: ${d}h) |> timeShift(duration: -${d}h)""")
        .select("_measurement", "_time", "_value").collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2))).toSet
      assert(got == base, s"P7[$i] d=${d}h not an identity")
    }
  }

  test("P8: spread() equals max() minus min() computed independently (20 random pre-filters)") {
    (0 until 20).foreach { i =>
      val th = next(Gen.chooseNum(0, 80))
      val base = s"""from(bucket: "b") |> filter(fn: (r) => r._value >= $th.0)"""
      def one(verb: String): Map[String, Double] =
        run(s"$base |> $verb").collect()
          .map(r => r.getAs[String]("_measurement") -> r.getAs[Double]("_value")).toMap
      val (sp, mx, mn) = (one("spread()"), one("max()"), one("min()"))
      mx.keys.foreach { m =>
        assert(sp(m) == mx(m) - mn(m), s"P8[$i] th=$th: spread != max-min for $m")
      }
    }
  }

  test("P5: per-tag group sums conserve the global sum (40 random splits)") {
    (0 until 40).foreach { i =>
      // random pre-filter keeps the invariant non-trivial
      val th = next(Gen.chooseNum(0, 100))
      val base = s"""from(bucket: "b") |> filter(fn: (r) => r._value >= $th.0)"""
      val grouped = run(s"""$base |> group(columns: ["host"]) |> sum()""")
        .agg(coalesce(sum(col("_value").cast("long")), lit(0L))).head.getLong(0)
      val global = run(s"""$base |> group(columns: []) |> sum()""")
        .agg(coalesce(sum(col("_value").cast("long")), lit(0L))).head.getLong(0)
      assert(grouped == global, s"P5[$i] th=$th: $grouped != $global")
    }
  }
}
