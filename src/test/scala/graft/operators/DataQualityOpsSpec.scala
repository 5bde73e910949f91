package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Data-quality verbs (operators/DataQualityOps.scala): single-pass
  * profiler metrics and the constraint suite's violation counting,
  * including null-pred-counts-as-violation semantics.
  */
class DataQualityOpsSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, Some("x"), Some(1.0)),
    (2L, Some("x"), Some(3.0)),
    (3L, None: Option[String], None: Option[Double]),
    (3L, Some("y"), Some(-2.0))
  ).toDF("id", "s", "v")

  test("profile: completeness, distinctness, numeric min/max/mean") {
    val m = DataQualityOps.profile(df, Seq("v"))
      .as[(String, String, Double)].collect()
      .map { case (c, k, v) => (c, k) -> v }.toMap
    assert(m(("id", "completeness")) == 1.0)
    assert(m(("s", "completeness")) == 0.75)
    assert(m(("id", "distinctness")) == 0.75)   // 3 distinct / 4 rows
    assert(m(("s", "distinctness")) == 0.5)     // x, y over 4 rows
    assert(m(("v", "min")) == -2.0 && m(("v", "max")) == 3.0)
    assert(math.abs(m(("v", "mean")) - 2.0 / 3) < 1e-3) // mean of 1,3,-2 r4
    assert(m.size == 3 * 2 + 3)
  }

  test("checks: unique, satisfies (null = violation), containment, in-set") {
    val dim = Seq(1L, 2L).toDF("pk")
    val out = DataQualityOps.runChecks(Seq(
        DataQualityOps.uniqueCheck(df, "id"),
        DataQualityOps.satisfiesCheck(df, "v_nonneg", col("v") >= 0),
        DataQualityOps.containedInCheck(df, "id", dim, "pk"),
        DataQualityOps.inSetCheck(df, "s", Seq("x"))))
      .as[(String, Long, Boolean)].collect()
      .map { case (n, v, p) => n -> ((v, p)) }.toMap
    assert(out("unique:id") == ((1L, false)))           // id 3 twice
    assert(out("satisfies:v_nonneg") == ((2L, false)))  // -2.0 and the null
    assert(out("contained:id") == ((2L, false)))        // both id=3 rows
    assert(out("satisfies:in_set:s") == ((2L, false)))  // y and the null
  }

  test("checks: a clean table passes everything") {
    val clean = Seq((1L, "x", 1.0), (2L, "y", 2.0)).toDF("id", "s", "v")
    val out = DataQualityOps.runChecks(Seq(
        DataQualityOps.uniqueCheck(clean, "id"),
        DataQualityOps.satisfiesCheck(clean, "v_nonneg", col("v") >= 0)))
      .as[(String, Long, Boolean)].collect().toSeq
    assert(out.forall { case (_, v, p) => v == 0L && p })
  }
}
