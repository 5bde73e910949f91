package graft.influxql

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Metamorphic invariants over randomized InfluxQL statements — the v1
  * twin of graft.flux.FluxMetamorphicSpec: no mirror implementation,
  * just properties every correct engine satisfies for any
  * parameterization. Integer values keep sums exact.
  *
  *  P1 WHERE partition:     sum(p) + sum(!p) = sum()
  *  P2 time-bucket sums:    Σ GROUP BY time(X) sums = total, any X/offset
  *  P3 LIMIT contract:      |LIMIT n| = min(n, rows)
  *  P4 tag-group sums:      Σ GROUP BY tag sums = total
  */
class InfluxQLMetamorphicSpec extends SparkSpec {
  import spark.implicits._
  import org.scalacheck.Gen
  import org.scalacheck.rng.Seed

  private val params = Gen.Parameters.default
  private var seed = Seed(13L)
  private def next[A](g: Gen[A]): A = {
    val v = g.pureApply(params, seed); seed = seed.next; v
  }
  private def pick[A](xs: Seq[A]): A = xs(next(Gen.chooseNum(0, xs.size - 1)))

  private def baseDf = {
    val t0 = java.sql.Timestamp.valueOf("2024-01-08 00:00:00").getTime
    val rows = for {
      (h, hi) <- Seq("h1", "h2", "h3").zipWithIndex
      k <- 0 until 48
    } yield (h, new java.sql.Timestamp(t0 + k * 3600 * 1000L),
      ((hi * 37 + k * 17) % 101).toDouble)
    rows.toDF("host", "time", "value")
  }

  private def source = InfluxQLEval.Source(
    resolve = _ => baseDf,
    tagKeys = _ => Seq("host").toDF("tagKey"))

  private def sumOf(q: String): Long =
    InfluxQLEval.run(q, source)
      .agg(coalesce(sum(col("sum").cast("long")), lit(0L))).head.getLong(0)

  private val total = sumOf("SELECT sum(value) FROM m")

  test("P1: a WHERE clause and its complement partition the sum (40 random predicates)") {
    (0 until 40).foreach { i =>
      val th = next(Gen.chooseNum(0, 100))
      val (p, notP) = pick(Seq(
        (s"value > $th", s"value <= $th"),
        (s"value < $th", s"value >= $th"),
        ("host = 'h2'", "host != 'h2'")))
      val a = sumOf(s"SELECT sum(value) FROM m WHERE $p")
      val b = sumOf(s"SELECT sum(value) FROM m WHERE $notP")
      assert(a + b == total, s"P1[$i] $p: $a + $b != $total")
    }
  }

  test("P2: GROUP BY time bucket sums re-aggregate to the total for any width/offset (40 random)") {
    (0 until 40).foreach { i =>
      val every = pick(Seq("1h", "2h", "3h", "5h", "7h", "12h", "1d"))
      val off = pick(Seq("", s", ${next(Gen.chooseNum(0, 6))}h"))
      val q = "SELECT sum(value) FROM m WHERE time >= '2024-01-07T00:00:00Z'" +
        s" AND time < '2024-01-11T00:00:00Z' GROUP BY time($every$off) fill(none)"
      assert(sumOf(q) == total, s"P2[$i] time($every$off) diverged")
    }
  }

  test("P3: LIMIT returns exactly min(n, rows) rows (40 random n)") {
    val n0 = InfluxQLEval.run("SELECT value FROM m", source).count()
    (0 until 40).foreach { i =>
      val n = next(Gen.chooseNum(1, 200))
      val got = InfluxQLEval.run(s"SELECT value FROM m LIMIT $n", source).count()
      assert(got == math.min(n.toLong, n0), s"P3[$i] LIMIT $n: got $got of $n0")
    }
  }

  test("P4: per-tag group sums conserve the global sum (40 random pre-filters)") {
    (0 until 40).foreach { i =>
      val th = next(Gen.chooseNum(0, 100))
      val g = sumOf(s"SELECT sum(value) FROM m WHERE value >= $th GROUP BY host")
      val t = sumOf(s"SELECT sum(value) FROM m WHERE value >= $th")
      assert(g == t, s"P4[$i] th=$th: $g != $t")
    }
  }
}
