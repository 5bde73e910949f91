package graft.dsl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Metamorphic invariants for the order-sensitive SeriesScan family —
  * properties any correct recursion must satisfy for EVERY (n, series)
  * parameterization, complementing the gates' pointwise oracles:
  *
  *  - EMA / moving averages of a CONSTANT series stay the constant
  *    (fixed-point of the recursion), to 1 ulp-scale tolerance;
  *  - TRIX of a constant series is 0 (log-rate of a constant EMA);
  *  - derivative of an exact linear ramp is exactly the rate
  *    (power-of-two steps keep every subtraction/division exact);
  *  - the scans are PARTITION-COUNT invariant: a repartition(7)'d
  *    input produces bit-identical output (the order-sensitive scan
  *    discipline must re-sort, never trust arrival order).
  */
class SeriesScanInvariantSpec extends SparkSpec {
  import spark.implicits._
  import org.scalacheck.Gen
  import org.scalacheck.rng.Seed

  private val params = Gen.Parameters.default
  private var seed = Seed(41L)
  private def next[A](g: Gen[A]): A = {
    val v = g.pureApply(params, seed); seed = seed.next; v
  }
  private def pick[A](xs: Seq[A]): A = xs(next(Gen.chooseNum(0, xs.size - 1)))

  private val t0 = java.sql.Timestamp.valueOf("2024-01-08 00:00:00").getTime

  private def constSeries(c: Double, len: Int) = {
    val rows = Seq("h1", "h2").flatMap { h =>
      (0 until len).map(k =>
        ("cpu", h, new java.sql.Timestamp(t0 + k * 3600 * 1000L), c))
    }
    FluxFrame(rows.toDF("measurement", "host", "ts", "value"),
      Seq("measurement", "host"), "ts", "value")
  }

  test("EMA family fixed-point: scans of a constant series stay the constant (20 random n/c)") {
    (0 until 20).foreach { i =>
      val c = pick(Seq(0.5, 1.0, 2.0, 4.0, 7.25, 100.0))
      val n = next(Gen.chooseNum(2, 10))
      val len = n + next(Gen.chooseNum(5, 15))
      val f = constSeries(c, len)
      Seq[(String, FluxFrame => FluxFrame)](
        ("ema", _.ema(n)),
        ("movingAverage", _.movingAverage(n))
      ).foreach { case (name, op) =>
        val vals = op(f).toDF.select("_value").collect().map(_.getDouble(0))
        assert(vals.nonEmpty && vals.forall(v => math.abs(v - c) <= 1e-9 * c),
          s"[$i] $name(n=$n) of constant $c drifted: ${vals.take(5).mkString(",")}")
      }
      val trixVals = f.trix(n).toDF.select("_value").collect().map(_.getDouble(0))
      assert(trixVals.forall(v => math.abs(v) <= 1e-9),
        s"[$i] trix(n=$n) of constant $c nonzero")
    }
  }

  test("derivative of an exact linear ramp is exactly the rate (20 random steps)") {
    (0 until 20).foreach { i =>
      val step = pick(Seq(0.25, 0.5, 1.0, 2.0, 8.0, -0.5, -4.0))
      val len = next(Gen.chooseNum(5, 30))
      val rows = (0 until len).map(k =>
        ("cpu", new java.sql.Timestamp(t0 + k * 3600 * 1000L), k * step))
      val f = FluxFrame(rows.toDF("measurement", "ts", "value"),
        Seq("measurement"), "ts", "value")
      // unit = 1h matches the sample spacing → derivative == step exactly
      val vals = f.derivative(unitSeconds = 3600.0).toDF
        .select("_value").collect().map(_.getDouble(0))
      assert(vals.length == len - 1 && vals.forall(_ == step),
        s"[$i] derivative of ramp step=$step: ${vals.distinct.mkString(",")}")
    }
  }

  test("scans are partition-count invariant: repartitioned input gives bit-identical output (10 random)") {
    (0 until 10).foreach { i =>
      val len = next(Gen.chooseNum(10, 40))
      val rows = Seq("h1", "h2", "h3").flatMap { h =>
        (0 until len).map(k => ("cpu", h,
          new java.sql.Timestamp(t0 + k * 3600 * 1000L),
          ((k * 17 + h.hashCode.abs) % 101).toDouble))
      }
      val df = rows.toDF("measurement", "host", "ts", "value")
      val n = next(Gen.chooseNum(2, 8))
      def run(d: org.apache.spark.sql.DataFrame): Seq[(String, Long)] =
        FluxFrame(d, Seq("measurement", "host"), "ts", "value").ema(n).toDF
          .select(col("host"), col("ts"),
            col("_value").as("v"))
          .collect()
          .map(r => (r.getString(0) + "@" + r.getTimestamp(1),
            java.lang.Double.doubleToLongBits(r.getDouble(2))))
          .sortBy(_._1)
      assert(run(df) == run(df.repartition(7)),
        s"[$i] ema(n=$n) depends on input partitioning")
    }
  }
}
