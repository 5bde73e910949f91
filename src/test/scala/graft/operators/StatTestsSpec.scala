package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatTestsSpec extends SparkSpec {
  import spark.implicits._

  test("chiSquare: hand-computed 2x2 including expected for 0 cells") {
    val rows =
      Seq.fill(10)(("x", 0)) ++ Seq.fill(20)(("x", 1)) ++
        Seq.fill(30)(("y", 0)) ++ Seq.fill(40)(("y", 1))
    val out = StatTests.chiSquare(rows.toDF("r", "c"), col("r"), col("c"))
      .select(col("rowv"), col("colv"), col("n_obs"),
        round(col("expected"), 4).as("e"), round(col("contrib"), 4).as("x2"))
      .as[(String, Int, Long, Double, Double)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4, t._5)).toMap
    assert(out(("x", 0)) == ((10L, 12.0, 0.3333)))
    assert(out(("x", 1)) == ((20L, 18.0, 0.2222)))
    assert(out(("y", 0)) == ((30L, 28.0, 0.1429)))
    assert(out(("y", 1)) == ((40L, 42.0, 0.0952)))
  }

  test("chiSquare: absent cell appears with n_obs=0 and contrib=expected") {
    val rows = Seq(("x", 0), ("x", 1), ("y", 0))
    val out = StatTests.chiSquare(rows.toDF("r", "c"), col("r"), col("c"))
      .where(col("rowv") === "y" && col("colv") === 1)
      .select(col("n_obs"), round(col("contrib") - col("expected"), 10))
      .as[(Long, Double)].head()
    assert(out == ((0L, 0.0)))
  }

  test("mannWhitneyU: textbook midranks with one tie") {
    // A = {1,2,3}, B = {2,4}: midranks 1, 2.5, 4 / 2.5, 5
    // U_a = 7.5 - 6 = 1.5; sigma^2 = .5*(6 - 6/20) = 2.85
    val df = (Seq((1L, true, 1L), (2L, true, 2L), (3L, true, 3L),
      (4L, false, 2L), (5L, false, 4L))).toDF("id", "a", "v")
    val r = StatTests.mannWhitneyU(df, col("a"), col("v"), "id")
      .as[(Long, Long, Double, Double)].head()
    assert(r._1 == 3 && r._2 == 2)
    assert(math.abs(r._3 - 1.5) < 1e-12)
    assert(math.abs(r._4 - (1.5 - 3.0) / math.sqrt(2.85)) < 1e-12)
  }

  test("ksTest: D is the max CDF gap, found mid-domain") {
    // A = {1,2,3}, B = {2,4}: D at v=3 is |1 - 0.5| = 0.5
    val df = (Seq((true, 1L), (true, 2L), (true, 3L),
      (false, 2L), (false, 4L))).toDF("a", "v")
    val r = StatTests.ksTest(df, col("a"), col("v"))
      .as[(Long, Long, Double)].head()
    assert(r == ((3L, 2L, 0.5)))
  }

  test("spearman: monotone 1, anti-monotone -1, ties keep exactness") {
    def rho(pts: Seq[(Long, Long, Long)]): Double =
      StatTests.spearman(pts.toDF("id", "x", "y"), col("x"), col("y"), "id")
        .as[(Long, Double)].head()._2
    assert(math.abs(rho(Seq((1L, 1L, 10L), (2L, 2L, 20L), (3L, 3L, 30L))) - 1.0) < 1e-12)
    assert(math.abs(rho(Seq((1L, 1L, 30L), (2L, 2L, 20L), (3L, 3L, 10L))) + 1.0) < 1e-12)
    // x ties at 2 -> midrank 2.5 both; hand Pearson-on-ranks:
    // cov 4.5 / sqrt(4.5 * 5) = 0.9486832980505138
    val r = rho(Seq((1L, 1L, 10L), (2L, 2L, 20L), (3L, 2L, 30L), (4L, 5L, 40L)))
    assert(math.abs(r - 0.9486832980505138) < 1e-10, r.toString)
  }

  test("ksTest: identical samples give D = 0") {
    val df = (Seq((true, 1L), (true, 7L), (false, 1L), (false, 7L)))
      .toDF("a", "v")
    assert(StatTests.ksTest(df, col("a"), col("v"))
      .as[(Long, Long, Double)].head()._3 == 0.0)
  }
}
